"""Per-stage MLP roofline microbench on the real TPU.

The r3 trace accounting attributes ~50 ms/step of the ScOT-B batch-96 train
step to flax Dense GEMMs (the block MLPs), ~2x the combined HBM/MXU roofline.
This isolates the MLP at each stage geometry and times, amortized over a
lax.scan of reps inside one jit (the axon tunnel costs ~2 ms/dispatch):

  a) token-major logical layout: x (M, C) -> fc1 -> gelu -> fc2    (fwd)
  b) same, fwd+bwd via jax.grad (sum loss)
  c) D-major logical layout: x (N, C, L), einsum "ncl,cf->nfl"     (fwd)
  d) same, fwd+bwd

If (a/b) hit the floor in isolation but the full model doesn't, the gap is
layout context (the residual stream lives D-major around the attention
kernel); if (c/d) are the slow ones, the D-major orientation itself is the
problem and a fused Pallas MLP kernel that consumes D-major tiles is the fix.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

REPS = 20  # baseline rep count; timing uses the slope between REPS and
# 5*REPS scans so the fixed tunnel round-trip cost (~30 ms/fetch) cancels.
REPS_HI = 100
BATCH = 96
STAGES = [  # (tokens_per_image, C) for ScOT-B image 128 patch 4
    (1024, 96),
    (256, 192),
    (64, 384),
    (16, 768),
]
PEAK_TFLOPS = 197e12  # v5e bf16
HBM_GBS = 819e9


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def run(fn, *args):
    def timed(reps):
        f = jax.jit(functools.partial(fn, reps=reps))
        out = f(*args)
        _ = float(jnp.sum(out))  # real barrier through the tunnel
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(jnp.sum(out))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = timed(REPS), timed(REPS_HI)
    return (hi - lo) / (REPS_HI - REPS)


def main():
    key = jax.random.PRNGKey(0)
    for tok, c in STAGES:
        m = BATCH * tok
        f = 4 * c
        x_tm = jax.random.normal(key, (m, c), jnp.bfloat16)
        x_dm = jax.random.normal(key, (BATCH, c, tok), jnp.bfloat16)
        w1 = jax.random.normal(key, (c, f), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((f,), jnp.bfloat16)
        w2 = jax.random.normal(key, (f, c), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((c,), jnp.bfloat16)

        def mlp_tm(x, w1, b1, w2, b2, reps=REPS):
            def body(xx, _):
                h = gelu_exact(xx @ w1 + b1)
                return (h @ w2 + b2).astype(xx.dtype), None
            return jax.lax.scan(body, x, None, length=reps)[0]

        def mlp_dm(x, w1, b1, w2, b2, reps=REPS):
            def body(xx, _):
                h = gelu_exact(jnp.einsum("ncl,cf->nfl", xx, w1)
                               + b1[None, :, None])
                out = jnp.einsum("nfl,fc->ncl", h, w2) + b2[None, :, None]
                return out.astype(xx.dtype), None
            return jax.lax.scan(body, x, None, length=reps)[0]

        def grad_of(mlp):
            def run_g(x, w1, b1, w2, b2, reps=REPS):
                def loss(x, w1, b1, w2, b2):
                    return jnp.sum(mlp(x, w1, b1, w2, b2, reps=1)
                                   .astype(jnp.float32))
                g = jax.grad(loss, argnums=(0, 1, 3))

                def body(carry, _):
                    xx, ww1, ww2 = carry
                    gs = g(xx, ww1, b1, ww2, b2)
                    # Fold each grad back with a tiny step so nothing is DCE'd.
                    return (xx + 1e-6 * gs[0].astype(xx.dtype),
                            ww1 + 1e-6 * gs[1].astype(ww1.dtype),
                            ww2 + 1e-6 * gs[2].astype(ww2.dtype)), None
                out = jax.lax.scan(body, (x, w1, w2), None, length=reps)[0]
                return out[0]
            return run_g

        flops_fwd = 2 * 2 * m * c * f
        mem_fused = 2 * m * c * 2  # read x + write out, bf16
        mem_xla = (2 * m * c + 2 * m * f) * 2  # + h roundtrip
        floor_fwd_us = max(flops_fwd / PEAK_TFLOPS, mem_xla / HBM_GBS) * 1e6

        from poseidon_tpu.ops.mlp import fused_mlp

        b1f = jnp.zeros((f,), jnp.float32)
        b2f = jnp.zeros((c,), jnp.float32)

        def mlp_pl(x, w1, b1, w2, b2, reps=REPS):
            def body(xx, _):
                return fused_mlp(xx, w1, b1f, w2, b2f).astype(xx.dtype), None
            return jax.lax.scan(body, x, None, length=reps)[0]

        res = {}
        res["fwd_tm_us"] = run(mlp_tm, x_tm, w1, b1, w2, b2) * 1e6
        res["fwd_pl_us"] = run(mlp_pl, x_tm, w1, b1, w2, b2) * 1e6
        res["bwd_tm_us"] = run(grad_of(mlp_tm), x_tm, w1, b1, w2, b2) * 1e6
        res["bwd_pl_us"] = run(grad_of(mlp_pl), x_tm, w1, b1, w2, b2) * 1e6
        print(json.dumps(dict(
            tokens=tok, C=c, M=m,
            floor_fwd_us=round(floor_fwd_us, 1),
            floor_fwdbwd_us=round(3 * floor_fwd_us, 1),
            **{k: round(v, 1) for k, v in res.items()})))


if __name__ == "__main__":
    main()

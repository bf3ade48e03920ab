"""Micro-benchmark: window-attention core variants, fwd+bwd, per stage shape.

Stage shapes for ScOT-B @128^2, batch 48:
  s0: imgs=48 nW=4 H=3  T=256 D=32   (scores 192,3,256,256)
  s1: imgs=48 nW=1 H=6  T=256 D=32
  s2: imgs=48 nW=1 H=12 T=64  D=32
  s3: imgs=48 nW=1 H=24 T=16  D=32

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/attn_bench.py
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

from poseidon_tpu.utils.init import enable_compilation_cache

enable_compilation_cache()

STAGES = {
    "s0": dict(imgs=48, nw=4, h=3, t=256, d=32),
    "s1": dict(imgs=48, nw=1, h=6, t=256, d=32),
    "s2": dict(imgs=48, nw=1, h=12, t=64, d=32),
    "s3": dict(imgs=48, nw=1, h=24, t=16, d=32),
}


def make_inputs(imgs, nw, h, t, d, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    n = imgs * nw
    q = jax.random.normal(ks[0], (n, h, t, d), dtype)
    k = jax.random.normal(ks[1], (n, h, t, d), dtype)
    v = jax.random.normal(ks[2], (n, h, t, d), dtype)
    bias = jax.random.uniform(ks[3], (h, t, t), jnp.float32) * 16.0
    mask_np = np.zeros((nw, t, t), np.float32)
    if nw > 1:
        mask_np[1:, : t // 2, t // 2:] = -100.0
        mask_np[1:, t // 2:, : t // 2] = -100.0
    mask = jnp.asarray(mask_np)
    scale = jnp.full((h,), 3.0, jnp.float32)
    return q, k, v, bias, mask, scale


def xla_current(q, k, v, bias, mask, scale, score_dtype=jnp.bfloat16):
    """Mirror of models/attention.py XLA path (bf16 scores)."""
    n, h, t, d = q.shape
    nw = mask.shape[0]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    qf = qf * scale[None, :, None, None]
    sd = score_dtype
    s = jnp.einsum("nhtd,nhsd->nhts", qf.astype(sd), kf.astype(sd),
                   preferred_element_type=sd)
    s = s + bias[None].astype(sd)
    s = s.reshape(n // nw, nw, h, t, t) + 2.0 * mask[None, :, None].astype(sd)
    s = s.reshape(n, h, t, t)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhts,nhsd->nhtd", p.astype(v.dtype), v)


def xla_combined(q, k, v, bias, mask, scale, score_dtype=jnp.bfloat16):
    """One combined (nW,H,T,T) additive bias+2*mask tensor, single add."""
    n, h, t, d = q.shape
    nw = mask.shape[0]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    qf = qf * scale[None, :, None, None]
    sd = score_dtype
    bm = (bias[None] + 2.0 * mask[:, None]).astype(sd)  # (nW,H,T,T)
    s = jnp.einsum("nhtd,nhsd->nhts", qf.astype(sd), kf.astype(sd),
                   preferred_element_type=sd)
    s = s.reshape(n // nw, nw, h, t, t) + bm[None]
    s = s.reshape(n, h, t, t)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhts,nhsd->nhtd", p.astype(v.dtype), v)


def pallas_v1(q, k, v, bias, mask, scale):
    # current kernel (v4 D-major), via the test-facing (N, H, T, D) layout
    from poseidon_tpu.ops.window_attention import fused_window_attention
    return fused_window_attention(q, k, v, bias, 2.0 * mask, scale)


def loss_of(fn):
    def run(q, k, v, bias, mask, scale):
        o = fn(q, k, v, bias, mask, scale)
        return jnp.sum(o.astype(jnp.float32) ** 2)
    return run


def bench(name, fn, inputs, iters=10, grad=True):
    # Thread the grad back into an fp32 master copy of q so every call has
    # genuinely different input values (defeats dedup/caching in the remote
    # executor; bf16 epsilon updates would underflow to a no-op).
    q0, rest = inputs[0], inputs[1:]
    qdt = q0.dtype
    g = jax.grad(loss_of(fn), argnums=(0, 1, 2, 3, 5))
    R = 10  # repeats inside one dispatch (amortizes ~2ms tunnel overhead)

    def one(qm, k, v, bias, mask, scale):
        dq, dk, dv, dbias, dscale = g(qm.astype(qdt), k, v, bias, mask, scale)
        extra = (jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv.astype(jnp.float32))
                 + jnp.sum(dbias) + jnp.sum(dscale))
        return qm - 1e-4 * dq.astype(jnp.float32) + 1e-30 * extra

    def step(qm, k, v, bias, mask, scale):
        return jax.lax.scan(
            lambda q, _: (one(q, k, v, bias, mask, scale), None),
            qm, None, length=R)[0]

    f = jax.jit(step, donate_argnums=(0,))
    qm = q0.astype(jnp.float32)
    try:
        qm = f(qm, *rest)
        # A scalar VALUE fetch is the only reliable execution barrier through
        # the remote tunnel (block_until_ready returns before device work).
        float(jnp.sum(qm))
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        qm = f(qm, *rest)
    float(jnp.sum(qm))
    dt = (time.perf_counter() - t0) / (iters * 10)
    print(f"{name:24s} {dt*1e3:8.3f} ms")
    return dt


def main():
    for sname, sh in STAGES.items():
        inputs = make_inputs(**sh)
        print(f"--- {sname}: {sh} (fwd+bwd) ---")
        bench("xla_current", xla_current, inputs)
        bench("xla_combined", xla_combined, inputs)
        bench("pallas", pallas_v1, inputs)


if __name__ == "__main__":
    main()

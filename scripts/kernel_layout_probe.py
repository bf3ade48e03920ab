"""Probe: does Mosaic lower the window-attention core efficiently in a
D-major (G, D, T) layout (normalize/scale as sublane ops, no lane<->sublane
relayouts) vs the v3 T-major (G, T, D) layout?

Forward-only, stage-0 shapes (G=12 pairs/img, T=256, D=32, 48 images).
Decides whether a v4 D-major kernel rewrite is worth it.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo python scripts/kernel_layout_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, T, D, IMGS = 12, 256, 32, 48
PAIRS = G * IMGS


def _bdot(a, b, contract):
    (ca, cb) = contract
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


# --- variant A: T-major (G, T, D), normalize over lanes (v3 structure) -----

def kern_tmajor(q_ref, k_ref, v_ref, bm_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    qn = q / jnp.maximum(jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)), 1e-12)
    kn = k / jnp.maximum(jnp.sqrt(jnp.sum(k * k, -1, keepdims=True)), 1e-12)
    s = _bdot(qn.astype(jnp.bfloat16), kn.astype(jnp.bfloat16), (2, 2)) + bm_ref[...]
    m = jnp.max(s, -1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, -1, keepdims=True)
    o = _bdot(e.astype(jnp.bfloat16), v_ref[...], (2, 1))
    o_ref[...] = (o / den).astype(o_ref.dtype)


# --- variant B: D-major (G, D, T), normalize over sublanes -----------------

def kern_dmajor(q_ref, k_ref, v_ref, bm_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)  # (G, D, T)
    k = k_ref[...].astype(jnp.float32)
    qn = q / jnp.maximum(jnp.sqrt(jnp.sum(q * q, 1, keepdims=True)), 1e-12)
    kn = k / jnp.maximum(jnp.sqrt(jnp.sum(k * k, 1, keepdims=True)), 1e-12)
    # s[t, s'] = sum_d qn[d, t] kn[d, s']  -> contract sublane dim
    s = _bdot(qn.astype(jnp.bfloat16), kn.astype(jnp.bfloat16), (1, 1)) + bm_ref[...]
    m = jnp.max(s, -1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, -1, keepdims=True)
    # o[d, t] = sum_s v[d, s] p[t, s] / den[t]
    o = _bdot(v_ref[...], e.astype(jnp.bfloat16), (2, 2))
    o_ref[...] = (o / den[:, :, 0][:, None, :]).astype(o_ref.dtype)


# --- variant C: T-major without in-kernel normalize (v2 core) --------------

def kern_nonorm(q_ref, k_ref, v_ref, bm_ref, o_ref):
    s = _bdot(q_ref[...], k_ref[...], (2, 2)) + bm_ref[...]
    m = jnp.max(s, -1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, -1, keepdims=True)
    o = _bdot(e.astype(v_ref.dtype), v_ref[...], (2, 1))
    o_ref[...] = (o / den).astype(o_ref.dtype)


def build(kernel, dmajor: bool):
    shape = (PAIRS, D, T) if dmajor else (PAIRS, T, D)
    block = (G, D, T) if dmajor else (G, T, D)
    tile = pl.BlockSpec(block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bm_spec = pl.BlockSpec((G, T, T), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    def run(q, k, v, bm):
        return pl.pallas_call(
            kernel,
            grid=(PAIRS // G,),
            in_specs=[tile, tile, tile, bm_spec],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
        )(q, k, v, bm)

    return run, shape


def bench(name, kernel, dmajor):
    run, shape = build(kernel, dmajor)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.bfloat16)
    k = jax.random.normal(ks[1], shape, jnp.bfloat16)
    v = jax.random.normal(ks[2], shape, jnp.bfloat16)
    bm = jax.random.uniform(jax.random.PRNGKey(3), (G, T, T), jnp.float32) * 16.0

    R = 20

    def step(qm, k, v, bm):
        def one(qq, _):
            o = run(qq.astype(jnp.bfloat16), k, v, bm)
            return qq + 1e-4 * o.astype(jnp.float32), None
        return jax.lax.scan(one, qm, None, length=R)[0]

    f = jax.jit(step, donate_argnums=(0,))
    try:
        qm = f(q.astype(jnp.float32), k, v, bm)
        float(jnp.sum(qm))
    except Exception as e:
        print(f"{name:12s} FAILED: {repr(e)[:140]}")
        return
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        qm = f(qm, k, v, bm)
    float(jnp.sum(qm))
    dt = (time.perf_counter() - t0) / (iters * R)
    print(f"{name:12s} {dt*1e6:8.1f} us/app")


if __name__ == "__main__":
    bench("tmajor_norm", kern_tmajor, False)
    bench("dmajor_norm", kern_dmajor, True)
    bench("nonorm", kern_nonorm, False)

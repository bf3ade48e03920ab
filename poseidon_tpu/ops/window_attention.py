"""Fused window cosine-attention Pallas TPU kernel.

Fuses the entire per-window attention pipeline — q/k L2-normalization, learned
logit scaling, continuous-relative-position-bias add, shifted-window mask add,
softmax, and the PV matmul — into one VMEM-resident kernel, so the (T, T)
score matrix never touches HBM. One grid step handles one (window, head) pair.

Forward is the Pallas kernel; backward is a recompute-based custom VJP that
differentiates the identical jnp reference formulation (numerics match the
XLA path, which the tests assert). On non-TPU backends the kernel runs in
interpreter mode so CPU tests exercise the same code path.

Replaces the reference's HF ``Swinv2SelfAttention`` score pipeline
(modeling_swinv2.py:479-533, used via /root/reference/scOT/model.py:539).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _needs_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _attn_kernel(scale_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    """One (window, head) attention instance.

    q/k/v: (T, D) blocks; bias: (T, T) for this head; mask: (T, T) for this
    window (zeros when unshifted); scale: (1, 1) SMEM scalar = exp(clamped
    logit_scale[h]).
    """
    q = q_ref[0, 0].astype(jnp.float32)  # (T, D)
    k = k_ref[0, 0].astype(jnp.float32)

    qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
    kn = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))

    scores = jax.lax.dot_general(
        qn, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    scores = scores * scale_ref[pl.program_id(1), 0]
    scores = scores + bias_ref[0] + mask_ref[0]

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward_pallas(q, k, v, bias, mask, scale):
    """q/k/v: (N, H, T, D); bias: (H, T, T); mask: (nW, T, T); scale: (H,).
    Returns (N, H, T, D)."""
    n, h, t, d = q.shape
    nw = mask.shape[0]
    scale2d = scale.reshape(h, 1).astype(jnp.float32)

    grid = (n, h)
    qkv_spec = pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _attn_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                # full (H, 1) scale array in SMEM; indexed by grid pos inside
                pl.BlockSpec((h, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                qkv_spec, qkv_spec, qkv_spec,
                pl.BlockSpec((1, t, t), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t, t), lambda i, j: (i % nw, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, t, d), q.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * (t * t * d * 2),
            bytes_accessed=n * h * t * d * 3 * q.dtype.itemsize,
            transcendentals=n * h * t * t,
        ),
    )(scale2d, q, k, v, bias, mask)
    return out


def _forward_reference(q, k, v, bias, mask, scale):
    """jnp formulation with identical numerics (used for the backward pass and
    as the XLA fallback)."""
    n, h, t, d = q.shape
    nw = mask.shape[0]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = qf * jax.lax.rsqrt(jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
    kn = kf * jax.lax.rsqrt(jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
    scores = jnp.einsum("nhtd,nhsd->nhts", qn, kn)
    scores = scores * scale[None, :, None, None]
    scores = scores + bias[None]
    scores = scores.reshape(n // nw, nw, h, t, t) + mask[None, :, None]
    scores = scores.reshape(n, h, t, t)
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("nhts,nhsd->nhtd", p, v).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_window_attention(q, k, v, bias, mask, scale):
    """Fused attention core: (N, H, T, D) x3 + (H, T, T) bias + (nW, T, T)
    mask + (H,) scale -> (N, H, T, D)."""
    return _forward_pallas(q, k, v, bias, mask, scale)


def _fwd(q, k, v, bias, mask, scale):
    out = _forward_pallas(q, k, v, bias, mask, scale)
    return out, (q, k, v, bias, mask, scale)


def _bwd(residuals, g):
    q, k, v, bias, mask, scale = residuals
    _, vjp = jax.vjp(_forward_reference, q, k, v, bias, mask, scale)
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)

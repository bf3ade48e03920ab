"""Fused window cosine-attention Pallas TPU kernels (forward AND backward).

The op boundary is the attention *core*: given already-normalized-and-scaled
queries ``qs`` (= L2-normalized q times the clamped per-head logit scale),
L2-normalized keys ``kn``, values ``v``, the shared CPB bias (H, T, T) and the
shifted-window mask (nW, T, T):

    S = qs @ kn^T + bias[h] + mask[n % nW];  P = softmax(S);  O = P @ v

Both passes keep the (T, T) score matrix entirely in VMEM — it never touches
HBM, unlike the XLA lowering which materializes fp32 scores/probs for the
backward (the dominant cost of scOT's step time). The backward kernel
recomputes S and P per (head, window) tile and accumulates the bias gradient
across windows in the output block (grid iterates windows innermost so the
revisited block stays resident).

The cosine normalization and logit-scale clamping stay OUTSIDE the op (cheap
elementwise work on (N, H, T, D) tensors) so their gradients come from XLA
autodiff — the kernel needs no dscale plumbing.

Replaces the score pipeline of HF ``Swinv2SelfAttention`` (modeling_swinv2.py:
479-533, used by /root/reference/scOT/model.py:539). On non-TPU backends the
kernels run in interpreter mode so CPU tests exercise the same code path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _needs_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(qs_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    qs = qs_ref[0, 0].astype(jnp.float32)  # (T, D)
    kn = k_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(qs, kn, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0] + mask_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _core_fwd(qs, kn, v, bias, mask):
    n, h, t, d = qs.shape
    nw = mask.shape[0]
    qkv_spec = pl.BlockSpec((1, 1, t, d), lambda jh, jn: (jn, jh, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(h, n),  # windows innermost (matches the backward's accumulation)
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, t, t), lambda jh, jn: (jh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), lambda jh, jn: (jn % nw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, d), lambda jh, jn: (jn, jh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, t, d), qs.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * t * t * d,
            bytes_accessed=n * h * t * d * 4 * qs.dtype.itemsize,
            transcendentals=n * h * t * t,
        ),
    )(qs, kn, v, bias, mask)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(qs_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    jn = pl.program_id(1)
    qs = qs_ref[0, 0].astype(jnp.float32)
    kn = k_ref[0, 0].astype(jnp.float32)
    vv = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    # Recompute S and P in VMEM.
    s = jax.lax.dot_general(qs, kn, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0] + mask_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    # dV = P^T dO
    dv_ref[0, 0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
    dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # dqs = dS kn ; dkn = dS^T qs
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, kn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    # dbias accumulates over windows (innermost grid dim -> block resident)
    @pl.when(jn == 0)
    def _init():
        dbias_ref[0] = ds

    @pl.when(jn > 0)
    def _acc():
        dbias_ref[0] += ds


def _core_bwd_pallas(qs, kn, v, bias, mask, do):
    n, h, t, d = qs.shape
    nw = mask.shape[0]
    qkv_spec = pl.BlockSpec((1, 1, t, d), lambda jh, jn: (jn, jh, 0, 0),
                            memory_space=pltpu.VMEM)
    out_qkv = jax.ShapeDtypeStruct((n, h, t, d), qs.dtype)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(h, n),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, t, t), lambda jh, jn: (jh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), lambda jh, jn: (jn % nw, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
        ],
        out_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, t, t), lambda jh, jn: (jh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_qkv, out_qkv, out_qkv,
                   jax.ShapeDtypeStruct((h, t, t), jnp.float32)],
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * h * t * t * d,
            bytes_accessed=n * h * t * d * 8 * qs.dtype.itemsize,
            transcendentals=n * h * t * t,
        ),
    )(qs, kn, v, bias, mask, do)


# ---------------------------------------------------------------------------
# custom_vjp core + public API
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _attention_core(qs, kn, v, bias, mask):
    return _core_fwd(qs, kn, v, bias, mask)


def _core_fwd_rule(qs, kn, v, bias, mask):
    return _core_fwd(qs, kn, v, bias, mask), (qs, kn, v, bias, mask)


def _core_bwd_rule(res, do):
    qs, kn, v, bias, mask = res
    dq, dk, dv, dbias = _core_bwd_pallas(qs, kn, v, bias, mask, do)
    return dq, dk, dv, dbias, jnp.zeros_like(mask)


_attention_core.defvjp(_core_fwd_rule, _core_bwd_rule)


def _reference_core(qs, kn, v, bias, mask):
    """jnp formulation with identical numerics (tests/fallback)."""
    n, h, t, d = qs.shape
    nw = mask.shape[0]
    s = jnp.einsum("nhtd,nhsd->nhts", qs.astype(jnp.float32), kn.astype(jnp.float32))
    s = s + bias[None]
    s = s.reshape(n // nw, nw, h, t, t) + mask[None, :, None]
    s = s.reshape(n, h, t, t)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhts,nhsd->nhtd", p.astype(v.dtype), v).astype(qs.dtype)


def fused_window_attention(q, k, v, bias, mask, scale):
    """Full fused cosine window attention.

    Args:
        q, k, v: (N, H, T, D) projected (unnormalized) q/k/v.
        bias: (H, T, T) fp32 position bias (already 16*sigmoid'd).
        mask: (nW, T, T) fp32 additive shift mask (zeros when unshifted).
        scale: (H,) fp32 exp(clamped logit_scale).
    Returns:
        (N, H, T, D) attention output in q's dtype.
    """
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kn = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    qs = qn * scale[None, :, None, None]
    return _attention_core(qs.astype(q.dtype), kn.astype(q.dtype), v, bias, mask)


def _forward_reference(q, k, v, bias, mask, scale):
    """Unfused jnp reference of the full op (tests)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    kn = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
    qs = qn * scale[None, :, None, None]
    return _reference_core(qs.astype(q.dtype), kn.astype(q.dtype), v, bias, mask)

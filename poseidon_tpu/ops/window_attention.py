"""Fused window cosine-attention Pallas TPU kernels (forward AND backward).

The op boundary is the attention *core*: given already-normalized-and-scaled
queries ``qs`` (= L2-normalized q times the clamped per-head logit scale),
L2-normalized keys ``kn``, values ``v``, the shared CPB bias (H, T, T) and the
shifted-window mask (nW, T, T):

    S = qs @ kn^T + bias[h] + mask[n % nW];  P = softmax(S);  O = P @ v

Both passes keep the (T, T) score matrices entirely in VMEM — they never touch
HBM, unlike the XLA lowering which materializes fp32 scores/probs (the
dominant memory traffic of scOT's train step). Grid layout: ONE grid step per
image, with all of that image's (window, head) pairs processed by a statically
unrolled loop — so the bias and mask stay VMEM-resident across the whole grid
and the per-step DMA is just q/k/v/o tiles. The backward kernel recomputes
S and P and accumulates the bias gradient across grid steps in its (constant
index map) output block.

The cosine normalization and logit-scale clamping stay OUTSIDE the op (cheap
elementwise work) so their gradients come from XLA autodiff.

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


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(nw: int, heads: int, qs_ref, k_ref, v_ref, bias_ref, mask_ref,
                o_ref):
    for w in range(nw):
        mask_w = mask_ref[w]
        for h in range(heads):
            qs = qs_ref[w, h].astype(jnp.float32)  # (T, D)
            kn = k_ref[w, h].astype(jnp.float32)
            s = jax.lax.dot_general(qs, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            p = _softmax(s + bias_ref[h] + mask_w)
            o_ref[w, h] = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[w, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _core_fwd(qs, kn, v, bias, mask):
    n, h, t, d = qs.shape
    nw = mask.shape[0]
    imgs = n // nw
    qkv_spec = pl.BlockSpec((nw, h, t, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nw, h),
        grid=(imgs,),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((h, t, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, t, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, t, d), qs.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * t * t * d,
            bytes_accessed=n * h * t * d * 4 * qs.dtype.itemsize,
            transcendentals=n * h * t * t,
        ),
    )(qs.reshape(imgs * nw, h, t, d), kn.reshape(imgs * nw, h, t, d),
      v.reshape(imgs * nw, h, t, d), bias, mask)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(nw: int, heads: int, qs_ref, k_ref, v_ref, bias_ref, mask_ref,
                do_ref, dq_ref, dk_ref, dv_ref, dbias_ref):
    i = pl.program_id(0)
    for w in range(nw):
        mask_w = mask_ref[w]
        for h in range(heads):
            qs = qs_ref[w, h].astype(jnp.float32)
            kn = k_ref[w, h].astype(jnp.float32)
            vv = v_ref[w, h].astype(jnp.float32)
            do = do_ref[w, h].astype(jnp.float32)

            s = jax.lax.dot_general(qs, kn, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            p = _softmax(s + bias_ref[h] + mask_w)

            dv_ref[w, h] = jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq_ref[w, h] = jax.lax.dot_general(
                ds, kn, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            dk_ref[w, h] = jax.lax.dot_general(
                ds, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)

            if w == 0:
                @pl.when(i == 0)
                def _init():
                    dbias_ref[h] = ds

                @pl.when(i > 0)
                def _acc():
                    dbias_ref[h] += ds
            else:
                dbias_ref[h] += ds


def _core_bwd_pallas(qs, kn, v, bias, mask, do):
    n, h, t, d = qs.shape
    nw = mask.shape[0]
    imgs = n // nw
    qkv_spec = pl.BlockSpec((nw, h, t, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_qkv = jax.ShapeDtypeStruct((n, h, t, d), qs.dtype)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, nw, h),
        grid=(imgs,),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((h, t, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, t, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
        ],
        out_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((h, t, t), lambda i: (0, 0, 0),
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
    return dq, dk, dv, dbias


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
        q, k, v: (N, H, T, D) projected (unnormalized) q/k/v; N must be a
            multiple of the window count nW (windows of one image contiguous).
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

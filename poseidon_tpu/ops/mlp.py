"""Fused SwinV2 MLP Pallas TPU kernels (forward AND backward).

The op boundary is the whole block MLP (reference model.py uses HF
``Swinv2Intermediate``/``Swinv2Output``, modeling_swinv2.py:603-634):

    u = x @ w1 + b1;   g = gelu_exact(u);   out = g @ w2 + b2

XLA emits this as two GEMMs with the (M, 4C) hidden state ``u`` round-tripped
through HBM in the forward AND stashed for the backward (plus a second (M, 4C)
``dh`` round trip in the backward). The r3 trace accounting attributed
~50 ms/step of the ScOT-B batch-96 train step to this bucket, ~2x its
combined HBM/MXU roofline (scripts/mlp_roofline.py). Here the hidden state
never leaves VMEM:

- **forward**: one pass — read x tile, two MXU GEMMs with the exact-erf GELU
  on the f32 accumulator between them, write out tile. Nothing else touches
  HBM; there is no residual stash at all (the backward recomputes ``u`` from
  x, which also frees ~1.2 GB of stashed hidden states per ScOT-B step and
  shrinks the scan_blocks HBM footprint).
- **backward**: recomputes ``u`` (one extra GEMM) and applies the five
  backward contractions on VMEM-resident tiles. Weight gradients are
  accumulated across the sequential TPU grid in f32 resident output blocks
  when they fit VMEM (stages 0-1 of ScOT; ``dw`` is C x 4C); for wide stages
  the kernel instead emits the bf16 ``du``/``g`` tiles and the (cheap, small-
  output, large-K) dw GEMMs run in XLA — there M is small, so the extra HBM
  round trip costs microseconds.

On non-TPU backends the kernels run in interpreter mode so CPU tests exercise
the same code path. When a >1-device data mesh is active the op shard_maps
over the token axis (tokens are batch-major, so data-parallel shards stay
whole-image); the replicated weight cotangents are psum'd by shard_map's
reverse-mode, mirroring ops/window_attention.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import _needs_interpret

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf from Mosaic-lowerable primitives (the erf primitive itself has no
    Pallas TPU lowering): Abramowitz-Stegun 7.1.26, max abs error 1.5e-7 —
    two orders of magnitude below bf16 resolution, so the kernel's GELU is
    still "exact" (non-tanh) for parity purposes."""
    s = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(u):
    """Exact (erf) GELU on the f32 accumulator."""
    return 0.5 * u * (1.0 + _erf(u * _INV_SQRT2))


def _dgelu(u):
    """d/du of exact GELU: Phi(u) + u * phi(u)."""
    phi = jnp.exp(-0.5 * u * u) * _INV_SQRT2PI
    return 0.5 * (1.0 + _erf(u * _INV_SQRT2)) + u * phi


def _dot(a, b, contract, preferred=jnp.float32):
    ca, cb = contract
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=preferred)


# ---------------------------------------------------------------------------
# Kernels. Tiles are token-major: x/dy/dx (Mt, C), hidden (Mt, F), weights
# whole (C, F)/(F, C) resident.
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    u = _dot(x_ref[...], w1_ref[...], (1, 0)) + b1_ref[...]
    g = _gelu(u).astype(x_ref.dtype)
    o = _dot(g, w2_ref[...], (1, 0)) + b2_ref[...]
    o_ref[...] = o.astype(o_ref.dtype)


def _recompute(x_ref, w1_ref, b1_ref, w2_ref, dy_ref):
    """Shared bwd prologue: u, du (f32) and the dx tile."""
    u = _dot(x_ref[...], w1_ref[...], (1, 0)) + b1_ref[...]
    dy = dy_ref[...]
    dh = _dot(dy, w2_ref[...], (1, 1))          # (Mt, F) f32
    du = dh * _dgelu(u)
    dx = _dot(du.astype(dy.dtype), w1_ref[...], (1, 1))  # (Mt, C) f32
    return u, du, dx


def _acc(ref, i, value):
    @pl.when(i == 0)
    def _init():
        ref[...] = value

    @pl.when(i > 0)
    def _add():
        ref[...] += value


def _bwd_kernel_fused(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                      dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    """Full-fused backward: dw/db accumulate in resident f32 blocks."""
    i = pl.program_id(0)
    u, du, dx = _recompute(x_ref, w1_ref, b1_ref, w2_ref, dy_ref)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    x = x_ref[...]
    dy = dy_ref[...]
    dub = du.astype(x.dtype)
    g = _gelu(u).astype(x.dtype)
    _acc(dw1_ref, i, _dot(x, dub, (0, 0)))            # (C, F)
    _acc(db1_ref, i, jnp.sum(du, axis=0, keepdims=True))
    _acc(dw2_ref, i, _dot(g, dy, (0, 0)))             # (F, C)
    _acc(db2_ref, i, jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True))


def _bwd_kernel_emit(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                     dx_ref, du_ref, g_ref):
    """Wide-stage backward: emit du/g tiles; dw GEMMs run in XLA."""
    u, du, dx = _recompute(x_ref, w1_ref, b1_ref, w2_ref, dy_ref)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    du_ref[...] = du.astype(du_ref.dtype)
    g_ref[...] = _gelu(u).astype(g_ref.dtype)


# ---------------------------------------------------------------------------
# D-major kernels. The ScOT residual stream is laid out D-major around the
# fused attention kernels ((B, L, C) with minor-to-major {1,2,0}); a token-
# major custom call forces XLA to relayout the full stream around every
# block (~4 ms/step of copies in the r3 trace, plus async-copy contention
# that slowed the token-major backward 2.2x in-model). These variants take
# (B, C, L) tiles — the module's swapaxes then elides into a layout bitcast.
# Weights stay Dense-layout (C, F)/(F, C); contractions run over sublanes.
# ---------------------------------------------------------------------------

def _fwd_kernel_dm(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]                                       # (C, Lt)
    u = _dot(w1_ref[...], x, (0, 0)) + b1_ref[...]     # (F, Lt) f32
    g = _gelu(u).astype(x.dtype)
    o = _dot(w2_ref[...], g, (0, 0)) + b2_ref[...]     # (C, Lt) f32
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel_dm(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                   dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)
    x = x_ref[0]                                       # (C, Lt)
    dy = dy_ref[0]                                     # (C, Lt)
    u = _dot(w1_ref[...], x, (0, 0)) + b1_ref[...]     # (F, Lt) f32
    dh = _dot(w2_ref[...], dy, (1, 0))                 # (F, Lt) f32
    du = dh * _dgelu(u)
    dub = du.astype(x.dtype)
    dx_ref[0] = _dot(w1_ref[...], dub, (1, 0)).astype(dx_ref.dtype)
    g = _gelu(u).astype(x.dtype)
    _acc(dw1_ref, i, _dot(x, dub, (1, 1)))             # (C, F)
    _acc(db1_ref, i, jnp.sum(du, axis=1, keepdims=True))
    _acc(dw2_ref, i, _dot(g, dy, (1, 1)))              # (F, C)
    _acc(db2_ref, i, jnp.sum(dy.astype(jnp.float32), axis=1, keepdims=True))


def _call_fwd_dm(x, w1, b1, w2, b2):
    n, c, l = x.shape
    f = w1.shape[1]
    tile = pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel_dm,
        grid=(n,),
        in_specs=[tile, const((c, f)), const((f, 1)), const((f, c)),
                  const((c, 1))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((n, c, l), x.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * l * c * f,
            bytes_accessed=4 * n * l * c * x.dtype.itemsize,
            transcendentals=n * l * f,
        ),
    )(x, w1, b1.reshape(f, 1), w2, b2.reshape(c, 1))


def _call_bwd_dm(x, w1, b1, w2, b2, dy):
    n, c, l = x.shape
    f = w1.shape[1]
    tile = pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel_dm,
        grid=(n,),
        in_specs=[tile, const((c, f)), const((f, 1)), const((f, c)), tile],
        out_specs=[tile, const((c, f)), const((f, 1)), const((f, c)),
                   const((c, 1))],
        out_shape=[jax.ShapeDtypeStruct((n, c, l), x.dtype),
                   jax.ShapeDtypeStruct((c, f), jnp.float32),
                   jax.ShapeDtypeStruct((f, 1), jnp.float32),
                   jax.ShapeDtypeStruct((f, c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)],
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * l * c * f,
            bytes_accessed=6 * n * l * c * x.dtype.itemsize,
            transcendentals=2 * n * l * f,
        ),
    )(x, w1, b1.reshape(f, 1), w2, dy)
    return (dx, dw1.astype(w1.dtype), db1[:, 0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[:, 0].astype(b2.dtype))


@jax.custom_vjp
def _mlp_core_dm(x, w1, b1, w2, b2):
    return _call_fwd_dm(x, w1, b1, w2, b2)


def _fwd_rule_dm(x, w1, b1, w2, b2):
    return _call_fwd_dm(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd_rule_dm(res, dy):
    return _call_bwd_dm(*res, dy)


_mlp_core_dm.defvjp(_fwd_rule_dm, _bwd_rule_dm)


def _dm_vmem_need(c: int, f: int, l: int, itemsize: int) -> int:
    tiles = 3 * 2 * c * l * itemsize       # x, dy, dx double-buffered
    tiles += 3 * f * l * 4 + f * l * itemsize   # u, dh, du f32; g
    return tiles + 2 * c * f * itemsize + 2 * c * f * 4


# ---------------------------------------------------------------------------
# D-major MLP + ConditionalLayerNorm + residual, fully fused:
#
#     out = x + s * cln(mlp(x)) + b,   cln = (o - mu_C) * rsqrt(var_C + eps)
#
# i.e. the entire second half of a SwinBlock (reference model.py:176-186 +
# HF Swinv2 MLP). s/b are the per-sample (B, C) conditional scale/shift (the
# caller folds the drop-path keep mask into them — the whole epilogue is
# linear in s/b). In the D-major tile the channel reduction is a SUBLANE
# mean — nearly free on the VPU — and the residual add happens while the
# tile is VMEM-resident, removing the norm's and the residual's separate
# HBM round trips (~4 ms/step over stages 0-1 in the r3 trace).
# The fc2 output is rounded to the stream dtype before the norm so numerics
# match the unfused path (which norms the bf16 Dense output).
# ---------------------------------------------------------------------------

def _cln(o, s_ref, b_ref, eps):
    mu = jnp.mean(o, axis=0, keepdims=True)            # (1, Lt) sublane mean
    var = jnp.maximum(jnp.mean(o * o, axis=0, keepdims=True) - mu * mu, 0.0)
    r = jax.lax.rsqrt(var + eps)
    yhat = (o - mu) * r
    return yhat, r, s_ref[0] * yhat + b_ref[0]


def _fwd_kernel_dm_cln(eps, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       s_ref, b_ref, o_ref):
    x = x_ref[0]                                       # (C, Lt)
    u = _dot(w1_ref[...], x, (0, 0)) + b1_ref[...]
    g = _gelu(u).astype(x.dtype)
    o = _dot(w2_ref[...], g, (0, 0)) + b2_ref[...]     # (C, Lt) f32
    o = o.astype(x.dtype).astype(jnp.float32)          # match unfused rounding
    _, _, y = _cln(o, s_ref, b_ref, eps)
    o_ref[0] = (x.astype(jnp.float32)
                + y.astype(x.dtype).astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel_dm_cln(eps, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       s_ref, b_ref, dy_ref,
                       dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                       ds_ref, db_ref):
    i = pl.program_id(0)
    x = x_ref[0]
    dy = dy_ref[0].astype(jnp.float32)                 # (C, Lt)
    u = _dot(w1_ref[...], x, (0, 0)) + b1_ref[...]
    g = _gelu(u).astype(x.dtype)
    o = _dot(w2_ref[...], g, (0, 0)) + b2_ref[...]
    o = o.astype(x.dtype).astype(jnp.float32)
    yhat, r, _ = _cln(o, s_ref, b_ref, eps)
    # Conditioning grads: per-image (C, 1) lane reductions, no accumulation.
    ds_ref[0] = jnp.sum(dy * yhat, axis=1, keepdims=True)
    db_ref[0] = jnp.sum(dy, axis=1, keepdims=True)
    # LayerNorm backward (no affine): do = r*(dyh - mean(dyh) - yhat*mean(dyh*yhat))
    dyh = dy * s_ref[0]
    m1 = jnp.mean(dyh, axis=0, keepdims=True)
    m2 = jnp.mean(dyh * yhat, axis=0, keepdims=True)
    do = r * (dyh - m1 - yhat * m2)                    # (C, Lt) f32
    dob = do.astype(x.dtype)
    dh = _dot(w2_ref[...], dob, (1, 0))                # (F, Lt) f32
    du = dh * _dgelu(u)
    dub = du.astype(x.dtype)
    dx_mlp = _dot(w1_ref[...], dub, (1, 0))            # (C, Lt) f32
    dx_ref[0] = (dy + dx_mlp).astype(dx_ref.dtype)     # + residual identity
    _acc(dw1_ref, i, _dot(x, dub, (1, 1)))
    _acc(db1_ref, i, jnp.sum(du, axis=1, keepdims=True))
    _acc(dw2_ref, i, _dot(g, dob, (1, 1)))
    _acc(db2_ref, i, jnp.sum(do, axis=1, keepdims=True))


def _call_fwd_dm_cln(eps, x, w1, b1, w2, b2, s, b):
    n, c, l = x.shape
    f = w1.shape[1]
    tile = pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    per_im = pl.BlockSpec((1, c, 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_dm_cln, eps),
        grid=(n,),
        in_specs=[tile, const((c, f)), const((f, 1)), const((f, c)),
                  const((c, 1)), per_im, per_im],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((n, c, l), x.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * l * c * f,
            bytes_accessed=4 * n * l * c * x.dtype.itemsize,
            transcendentals=n * l * f,
        ),
    )(x, w1, b1.reshape(f, 1), w2, b2.reshape(c, 1),
      s.reshape(n, c, 1), b.reshape(n, c, 1))


def _call_bwd_dm_cln(eps, x, w1, b1, w2, b2, s, b, dy):
    n, c, l = x.shape
    f = w1.shape[1]
    tile = pl.BlockSpec((1, c, l), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    per_im = pl.BlockSpec((1, c, 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel_dm_cln, eps),
        grid=(n,),
        in_specs=[tile, const((c, f)), const((f, 1)), const((f, c)),
                  const((c, 1)), per_im, per_im, tile],
        out_specs=[tile, const((c, f)), const((f, 1)), const((f, c)),
                   const((c, 1)), per_im, per_im],
        out_shape=[jax.ShapeDtypeStruct((n, c, l), x.dtype),
                   jax.ShapeDtypeStruct((c, f), jnp.float32),
                   jax.ShapeDtypeStruct((f, 1), jnp.float32),
                   jax.ShapeDtypeStruct((f, c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, c, 1), jnp.float32)],
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * l * c * f,
            bytes_accessed=6 * n * l * c * x.dtype.itemsize,
            transcendentals=2 * n * l * f,
        ),
    )(x, w1, b1.reshape(f, 1), w2, b2.reshape(c, 1),
      s.reshape(n, c, 1), b.reshape(n, c, 1), dy)
    return (dx, dw1.astype(w1.dtype), db1[:, 0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[:, 0].astype(b2.dtype),
            ds[..., 0].astype(s.dtype), db[..., 0].astype(b.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mlp_cln_core(eps, x, w1, b1, w2, b2, s, b):
    return _call_fwd_dm_cln(eps, x, w1, b1, w2, b2, s, b)


def _cln_fwd_rule(eps, x, w1, b1, w2, b2, s, b):
    return (_call_fwd_dm_cln(eps, x, w1, b1, w2, b2, s, b),
            (x, w1, b1, w2, b2, s, b))


def _cln_bwd_rule(eps, res, dy):
    return _call_bwd_dm_cln(eps, *res, dy)


_mlp_cln_core.defvjp(_cln_fwd_rule, _cln_bwd_rule)


def dm_eligible(x_shape, c: int, f: int, itemsize: int,
                cln: bool = False) -> bool:
    """True when a 3-D (B, L, C) input takes the D-major fused path.

    ``cln=True`` budgets the fused MLP+CLN variant, whose backward keeps
    ~5 extra (C, L) f32 tensors live (o, yhat, f32 dy, do, dx_mlp) beyond
    the plain D-major backward."""
    if len(x_shape) != 3 or x_shape[1] % 128 != 0:
        return False
    from ..utils.device import vmem_budget_bytes

    need = _dm_vmem_need(c, f, x_shape[1], itemsize)
    if cln:
        need += 5 * c * x_shape[1] * 4
    return need <= vmem_budget_bytes()


def fused_mlp_cln(x, w1, b1, w2, b2, scale, shift, eps=1e-5):
    """Fused SwinBlock tail: ``x + scale * cln(mlp(x)) + shift`` with
    per-sample conditioning.

    Args:
        x: (B, L, C) residual-stream activations, L a lane multiple.
        w1/b1/w2/b2: MLP params as in :func:`fused_mlp`.
        scale, shift: (B, C) f32 conditional scale/shift (drop-path keep
            masks pre-folded by the caller).
        eps: LayerNorm epsilon (static).
    Returns:
        (B, L, C) in x's dtype.
    """
    assert dm_eligible(x.shape, x.shape[-1], w1.shape[1], x.dtype.itemsize,
                       cln=True)
    xt = jnp.swapaxes(x, 1, 2)
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import maybe_shard_map_data

    core = maybe_shard_map_data(
        functools.partial(_mlp_cln_core, float(eps)), x.shape[0], 1,
        in_specs=(P("data"), P(), P(), P(), P(), P("data"), P("data")),
        out_specs=P("data"))
    out = core(xt, w1, b1, w2, b2, scale, shift)
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Tiling
# ---------------------------------------------------------------------------

def _vmem_need(mt: int, c: int, f: int, fused_dw: bool, itemsize: int) -> int:
    tiles = 2 * 2 * mt * c * itemsize      # x, dy double-buffered
    tiles += 2 * mt * c * itemsize         # dx out
    tiles += 3 * mt * f * 4                # u, dh, du f32 live
    tiles += mt * f * itemsize             # g
    weights = 2 * c * f * itemsize
    if fused_dw:
        return tiles + weights + 2 * c * f * 4
    return tiles + weights + 2 * 2 * mt * f * itemsize  # du/g out, buffered


def _pick_tile(m: int, c: int, f: int, itemsize: int):
    """(tile_m, fused_dw): largest power-of-two token tile whose backward
    fits the device VMEM budget, preferring the fused-dw variant."""
    from ..utils.device import vmem_budget_bytes

    budget = vmem_budget_bytes()
    for fused_dw in (True, False):
        for mt in (1024, 512, 256, 128, 64, 32, 16, 8):
            if mt > m and mt > 8:
                continue
            if _vmem_need(mt, c, f, fused_dw, itemsize) <= budget:
                return mt, fused_dw
    return 8, False


def _pad_rows(a, m_pad):
    if a.shape[0] == m_pad:
        return a
    return jnp.pad(a, ((0, m_pad - a.shape[0]), (0, 0)))


# ---------------------------------------------------------------------------
# Core (2-D, custom_vjp)
# ---------------------------------------------------------------------------

def _call_fwd(x, w1, b1, w2, b2):
    m, c = x.shape
    f = w1.shape[1]
    mt, _ = _pick_tile(m, c, f, x.dtype.itemsize)
    m_pad = -(-m // mt) * mt
    xp = _pad_rows(x, m_pad)
    tile = pl.BlockSpec((mt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(m_pad // mt,),
        in_specs=[tile, const((c, f)), const((1, f)), const((f, c)),
                  const((1, c))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c * f,
            bytes_accessed=4 * m * c * x.dtype.itemsize,
            transcendentals=m * f,
        ),
    )(xp, w1, b1.reshape(1, f), w2, b2.reshape(1, c))
    return out[:m]


def _call_bwd(x, w1, b1, w2, b2, dy):
    m, c = x.shape
    f = w1.shape[1]
    mt, fused_dw = _pick_tile(m, c, f, x.dtype.itemsize)
    m_pad = -(-m // mt) * mt
    # Zero-padded rows contribute nothing to dw/db: x and dy rows are 0.
    xp, dyp = _pad_rows(x, m_pad), _pad_rows(dy, m_pad)
    tile = pl.BlockSpec((mt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ftile = pl.BlockSpec((mt, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kw = dict(
        grid=(m_pad // mt,),
        in_specs=[tile, const((c, f)), const((1, f)), const((f, c)), tile],
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * m * c * f,
            bytes_accessed=6 * m * c * x.dtype.itemsize,
            transcendentals=2 * m * f,
        ),
    )
    args = (xp, w1, b1.reshape(1, f), w2, dyp)
    if fused_dw:
        dx, dw1, db1, dw2, db2 = pl.pallas_call(
            _bwd_kernel_fused,
            out_specs=[tile, const((c, f)), const((1, f)), const((f, c)),
                       const((1, c))],
            out_shape=[jax.ShapeDtypeStruct((m_pad, c), x.dtype),
                       jax.ShapeDtypeStruct((c, f), jnp.float32),
                       jax.ShapeDtypeStruct((1, f), jnp.float32),
                       jax.ShapeDtypeStruct((f, c), jnp.float32),
                       jax.ShapeDtypeStruct((1, c), jnp.float32)],
            **kw)(*args)
    else:
        dx, du, g = pl.pallas_call(
            _bwd_kernel_emit,
            out_specs=[tile, ftile, ftile],
            out_shape=[jax.ShapeDtypeStruct((m_pad, c), x.dtype),
                       jax.ShapeDtypeStruct((m_pad, f), x.dtype),
                       jax.ShapeDtypeStruct((m_pad, f), x.dtype)],
            **kw)(*args)
        dw1 = _dot(xp, du, (0, 0))
        db1 = jnp.sum(du, axis=0, keepdims=True, dtype=jnp.float32)
        dw2 = _dot(g, dyp, (0, 0))
        db2 = jnp.sum(dyp, axis=0, keepdims=True, dtype=jnp.float32)
    return (dx[:m], dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


@jax.custom_vjp
def _mlp_core(x, w1, b1, w2, b2):
    return _call_fwd(x, w1, b1, w2, b2)


def _fwd_rule(x, w1, b1, w2, b2):
    return _call_fwd(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd_rule(res, dy):
    return _call_bwd(*res, dy)


_mlp_core.defvjp(_fwd_rule, _bwd_rule)


def _shard_over_data(core, rows: int, granule: int = 1):
    """shard_map ``core`` over the data axis (dim 0 of the first operand,
    weights replicated) when the active data mesh divides ``rows`` into
    whole-image shards (``granule`` = rows per image; see
    parallel.mesh.maybe_shard_map_data for why whole-image is mandatory)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import maybe_shard_map_data

    return maybe_shard_map_data(
        core, rows, granule,
        in_specs=(P("data"), P(), P(), P(), P()), out_specs=P("data"))


def _sharded_core(m: int, granule: int = 1):
    """Token-major core, shard_mapped over the data axis in whole-image
    chunks (``granule`` = tokens per image)."""
    return _shard_over_data(_mlp_core, m, granule)


# Minimum token tile for the kernel to beat XLA. The TPU A/B
# (scripts/mlp_roofline.py, v5e, ScOT-B geometries) measured the kernel
# 1.3-1.7x faster when the fused-dw backward fits with a >=256 tile (stages
# 0-1: C<=192) and SLOWER for wide-C/small-M stages (2-3), where XLA's two
# plain GEMMs already sit near the floor — those fall back to XLA.
# POSEIDON_MLP_MIN_TILE overrides for geometry A/Bs (e.g. ScOT-L's stage-1
# C=384 lands at tile 128, just under the B-derived threshold). Read per
# call, not at import: the gate fires only at trace time, so a caller (e.g.
# bench.py's L entry) can scope the override to one model build.
def _min_win_tile() -> int:
    return int(os.environ.get("POSEIDON_MLP_MIN_TILE", "256"))


def fused_mlp(x, w1, b1, w2, b2, min_win_tile=None):
    """Fused ``gelu_exact(x @ w1 + b1) @ w2 + b2`` over the last axis.

    Args:
        x: (..., C) activations (any leading shape; flattened internally).
        w1: (C, F); b1: (F,); w2: (F, C); b2: (C,). Weights in compute dtype;
            biases may stay f32 (added on the f32 accumulator).
        min_win_tile: minimum token tile for the kernel to engage; ``None``
            defers to the POSEIDON_MLP_MIN_TILE env gate (default 256). The
            caller threads ``config.mlp_min_win_tile`` here (128 for ScOT-L,
            where the kernel wins below the B-derived threshold).
    Returns:
        (..., C) in x's dtype.
    """
    lead = x.shape[:-1]
    c = x.shape[-1]
    f = w1.shape[1]
    if x.ndim == 3 and x.shape[1] % 128 == 0:
        from ..utils.device import vmem_budget_bytes

        if _dm_vmem_need(c, f, x.shape[1], x.dtype.itemsize) \
                <= vmem_budget_bytes():
            # D-major fast path: (B, L, C) -> (B, C, L) elides into a layout
            # bitcast on the D-major residual stream (see the dm kernels'
            # comment). L % 128 keeps tokens lane-aligned AND naturally
            # excludes the wide small-L stages where XLA is already at the
            # floor.
            xt = jnp.swapaxes(x, 1, 2)
            out = _shard_over_data(_mlp_core_dm, x.shape[0])(
                xt, w1, b1, w2, b2)
            return jnp.swapaxes(out, 1, 2)
    x2 = x.reshape(-1, c)
    mt, fused_dw = _pick_tile(x2.shape[0], c, f, x.dtype.itemsize)
    gate = min_win_tile if min_win_tile is not None else _min_win_tile()
    if not (fused_dw and mt >= gate):
        h = jax.nn.gelu(x2 @ w1 + b1.astype(x.dtype), approximate=False)
        return (h @ w2 + b2.astype(x.dtype)).reshape(*lead, c)
    granule = x.shape[1] if x.ndim == 3 else 1  # tokens per image
    out = _sharded_core(x2.shape[0], granule)(x2, w1, b1, w2, b2)
    return out.reshape(*lead, c)

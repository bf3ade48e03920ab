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


def _sharded_core(m: int):
    """shard_map the core over the data axis when a >1-device data mesh is
    active (tokens are batch-major: equal row chunks = whole images as long
    as the global batch divides the axis, which Trainer guarantees)."""
    from ..parallel.mesh import attention_mesh

    mesh = attention_mesh()
    if mesh is None:
        return _mlp_core
    n_data = mesh.shape["data"]
    if m % n_data != 0:
        return _mlp_core
    from jax.sharding import PartitionSpec as P

    specs = dict(in_specs=(P("data"), P(), P(), P(), P()),
                 out_specs=P("data"))
    try:  # jax >= 0.9 stable API
        return jax.shard_map(_mlp_core, mesh=mesh, check_vma=False, **specs)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(_mlp_core, mesh=mesh, check_rep=False, **specs)


# Minimum token tile for the kernel to beat XLA. The TPU A/B
# (scripts/mlp_roofline.py, v5e, ScOT-B geometries) measured the kernel
# 1.3-1.7x faster when the fused-dw backward fits with a >=256 tile (stages
# 0-1: C<=192) and SLOWER for wide-C/small-M stages (2-3), where XLA's two
# plain GEMMs already sit near the floor — those fall back to XLA.
_MIN_WIN_TILE = 256


def fused_mlp(x, w1, b1, w2, b2):
    """Fused ``gelu_exact(x @ w1 + b1) @ w2 + b2`` over the last axis.

    Args:
        x: (..., C) activations (any leading shape; flattened internally).
        w1: (C, F); b1: (F,); w2: (F, C); b2: (C,). Weights in compute dtype;
            biases may stay f32 (added on the f32 accumulator).
    Returns:
        (..., C) in x's dtype.
    """
    lead = x.shape[:-1]
    c = x.shape[-1]
    f = w1.shape[1]
    x2 = x.reshape(-1, c)
    mt, fused_dw = _pick_tile(x2.shape[0], c, f, x.dtype.itemsize)
    if not (fused_dw and mt >= _MIN_WIN_TILE):
        h = jax.nn.gelu(x2 @ w1 + b1.astype(x.dtype), approximate=False)
        return (h @ w2 + b2.astype(x.dtype)).reshape(*lead, c)
    out = _sharded_core(x2.shape[0])(x2, w1, b1, w2, b2)
    return out.reshape(*lead, c)

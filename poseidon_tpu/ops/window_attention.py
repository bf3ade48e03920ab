"""Fused window cosine-attention Pallas TPU kernels (forward AND backward).

The op boundary is the FULL attention core: raw projected q/k/v tiles plus one
combined additive tensor ``bm`` (CPB bias + doubled shift mask) and a per-row
logit-scale vector ``srow``:

    qn = q / max(||q||, 1e-12);   kn = k / max(||k||, 1e-12)
    S  = (srow * qn) @ kn^T + bm[pair % base]
    P  = softmax(S);   O = P @ v

Everything — the L2 normalization, the logit scaling, the score matmul, the
bias/mask add, the softmax, and the PV matmul — runs on VMEM-resident data;
nothing but q/k/v/o (and the tiny bm/srow) touches HBM. The XLA lowering by
contrast materializes the scores AND stashes the probabilities for the
backward pass (~75 MB per stage-0 layer at batch 48); the backward kernel
here recomputes S and P from (q, k) instead of loading them.

Design notes (v4 — see git history for why v1-v3 lost to XLA):
- **D-major tiles**: q/k/v/o live as (pair, D, T) inside the kernel, tokens
  along the 128-wide lane axis. The L2 norms and the logit scale become
  SUBLANE reductions/broadcasts (nearly free on the VPU); in the v3 T-major
  (pair, T, D) layout the same ops ran at 32/128 lane occupancy with
  lane<->sublane relayouts, making the backward 2.7x slower than XLA. A
  forward-only probe (scripts/kernel_layout_probe.py) measured D-major at
  347 us vs 581 us T-major for a full stage-0 layer.
- matmuls take bf16 operands with fp32 accumulation, BATCHED over G
  (window, head) pairs per grid step via `dot_general` batch dims; G never
  exceeds the bm period (larger groups need in-kernel reshape-sum
  accumulation, which crashes the Mosaic compiler).
- softmax runs in fp32; the 1/sum is folded into the (D, T) output instead
  of being spent as an extra (T, T) pass.
- the logit scale is a per-ROW vector so that **small-T stages can be packed
  block-diagonally**: for T in {16, 64} (scOT stages 2-3) P heads are packed
  along the token axis into T' = P*T in {128, 256} tiles with -1e9
  off-diagonal filler. exp(-1e9 - m) underflows to exactly 0.0 in fp32, so
  the packed softmax/PV is numerically identical to the unpacked one.

Replaces the score pipeline of HF ``Swinv2SelfAttention`` (modeling_swinv2.py:
479-533, used by /root/reference/scOT/model.py:539). On non-TPU backends the
kernels run in interpreter mode so CPU tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # off-diagonal filler for block-packed scores
_EPS = 1e-12  # torch F.normalize clamp


def _needs_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Group sizing
# ---------------------------------------------------------------------------

def _pick_group(base: int, t: int) -> int:
    """Number of (window, head) pairs per grid step.

    Must divide ``base`` (modular bm index map). Groups LARGER than base
    (pre-tiled bm + in-kernel reshape-sum accumulation) reliably crash the
    Mosaic compiler on real TPUs — keep g <= base. Sized so the backward
    pass's VMEM-resident intermediates (~24 bytes/score element) plus the
    accumulated dbm block fit comfortably inside the device's VMEM (derived
    per TPU generation; ~11 MB usable on 16 MiB-VMEM cores)."""
    from ..utils.device import vmem_budget_bytes

    budget = vmem_budget_bytes() - base * t * t * 4

    def fits(g):
        return g * t * t * 24 <= budget

    for g in range(base, 0, -1):
        if base % g == 0 and fits(g):
            return g
    return 1


# ---------------------------------------------------------------------------
# Kernels (D-major: q/k/v/o tiles are (G, D, T))
# ---------------------------------------------------------------------------

def _bdot(a, b, contract, preferred=jnp.float32):
    """Batched (over axis 0) matmul contracting the given axes of a and b."""
    (ca, cb) = contract
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))), preferred_element_type=preferred)


def _normalize_cols(x):
    """f32 L2-normalize each column (token) of a (G, D, T) tile — a sublane
    reduction + sublane broadcast (torch F.normalize semantics)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / jnp.maximum(n, _EPS)


def _scores(q, k, bm, srow):
    """qn, kn, qs (G, D, T) f32; scores S (G, T, T) f32 (incl. bm)."""
    cdt = q.dtype
    qn = _normalize_cols(q.astype(jnp.float32))
    kn = _normalize_cols(k.astype(jnp.float32))
    qs = qn * srow  # srow (G, 1, T) broadcasts over sublanes (D)
    s = _bdot(qs.astype(cdt), kn.astype(cdt), (1, 1)) + bm
    return qn, kn, qs, s


def _fwd_body(q, k, v, bm, srow):
    """Forward math on plain (G, D, T) arrays; returns o in v's dtype."""
    _, _, _, s = _scores(q, k, bm, srow)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, axis=-1, keepdims=True)  # (G, T, 1)
    # o[d, t] = sum_s v[d, s] p[t, s];  1/den folded into the (D, T) output.
    o = _bdot(v, e.astype(v.dtype), (2, 2))
    return (o / den[:, :, 0][:, None, :]).astype(v.dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, bm_ref, s_ref, o_ref):
    o_ref[...] = _fwd_body(q_ref[...], k_ref[...], v_ref[...],
                           bm_ref[...], s_ref[...]).astype(o_ref.dtype)


def _fwd_kernel_qkv(q_ref, k_ref, v_ref, qb_ref, bm_ref, s_ref, o_ref):
    """Packed-QKV forward: q/k/v refs are (1, G, D, T) views into the SAME
    (3, pairs, D, T) tensor (three operands, offset index maps) — the module
    never materializes the q/k/v splits. The q projection bias (per-(head, d)
    column, constant over tokens) is added in-kernel."""
    q = q_ref[0] + qb_ref[...].astype(q_ref.dtype)  # (G, D, T) + (G, D, 1)
    o_ref[...] = _fwd_body(q, k_ref[0], v_ref[0],
                           bm_ref[...], s_ref[...]).astype(o_ref.dtype)


def _acc(ref, i, value, base: int, g: int):
    """Accumulate a (g, ...) value into a (base, ...) resident output block
    (g <= base always; see _pick_group)."""
    if g == base:
        @pl.when(i == 0)
        def _init():
            ref[...] = value

        @pl.when(i > 0)
        def _add():
            ref[...] += value
    else:
        r = base // g
        off = (i % r) * g

        @pl.when(i < r)
        def _init():
            ref[pl.ds(off, g)] = value

        @pl.when(i >= r)
        def _add():
            ref[pl.ds(off, g)] += value


def _bwd_body(q, k, v, bm, srow, do):
    """Backward math on plain (G, D, T) arrays; returns
    (dq, dk, dv [q dtype], ds (G, T, T) f32, dsrow (G, 1, T) f32)."""
    cdt = q.dtype
    qn, kn, qs, s = _scores(q, k, bm, srow)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, axis=-1, keepdims=True)  # (G, T, 1)
    den_row = den[:, :, 0][:, None, :]        # (G, 1, T)
    do = do.astype(jnp.float32)               # (G, D, T)

    # dv[d, s] = sum_t p[t, s] do[d, t] = sum_t e[t, s] (do[d, t] / den[t])
    dod = (do / den_row).astype(cdt)
    dv = _bdot(dod, e.astype(cdt), (2, 1)).astype(cdt)
    # dp[t, s] = sum_d do[d, t] v[d, s];  ds = p * (dp - sum_s dp*p)
    dp = _bdot(do.astype(cdt), v, (1, 1))
    c = jnp.sum(dp * e, axis=-1, keepdims=True) / den
    ds = e * ((dp - c) / den)
    dsb = ds.astype(cdt)
    # dqs[d, t] = sum_s kn[d, s] ds[t, s];  dkn[d, s] = sum_t qs[d, t] ds[t, s]
    dqs = _bdot(kn.astype(cdt), dsb, (2, 2))
    dkn = _bdot(qs.astype(cdt), dsb, (2, 1))
    # through the logit scale: qs = srow * qn  (srow is (G, 1, T))
    dsrow = jnp.sum(dqs * qn, axis=1, keepdims=True)  # (G, 1, T) sublane sum
    dqn = dqs * srow

    # through the L2 normalize: x -> x / max(||x||, eps), per column
    def _norm_bwd(dxn, xn, x):
        n = jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)), _EPS)
        return (dxn - xn * jnp.sum(dxn * xn, axis=1, keepdims=True)) / n

    dq = _norm_bwd(dqn, qn, q.astype(jnp.float32)).astype(cdt)
    dk = _norm_bwd(dkn, kn, k.astype(jnp.float32)).astype(cdt)
    return dq, dk, dv, ds, dsrow


def _bwd_kernel(base: int, q_ref, k_ref, v_ref, bm_ref, s_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbm_ref, dsrow_ref):
    i = pl.program_id(0)
    g = q_ref.shape[0]
    dq, dk, dv, ds, dsrow = _bwd_body(
        q_ref[...], k_ref[...], v_ref[...], bm_ref[...], s_ref[...],
        do_ref[...])
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)
    _acc(dbm_ref, i, ds, base, g)
    _acc(dsrow_ref, i, dsrow, base, g)


def _bwd_kernel_qkv(base: int, q_ref, k_ref, v_ref, qb_ref, bm_ref, s_ref,
                    do_ref, dqkv_ref, dqb_ref, dbm_ref, dsrow_ref):
    """Packed-QKV backward: emits dq/dk/dv as slices of ONE (3, pairs, D, T)
    output, so the QKV GEMM's transpose consumes them without a concat. The
    in-kernel q bias gets its cotangent accumulated like dbm — a lane
    reduction when qb is token-constant ((G, D, 1) blocks), elementwise when
    it varies along the packed token axis ((G, D, T') blocks)."""
    i = pl.program_id(0)
    g = q_ref.shape[1]
    q = q_ref[0] + qb_ref[...].astype(q_ref.dtype)
    dq, dk, dv, ds, dsrow = _bwd_body(
        q, k_ref[0], v_ref[0], bm_ref[...], s_ref[...], do_ref[...])
    dqkv_ref[0] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[1] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[2] = dv.astype(dqkv_ref.dtype)
    dq32 = dq.astype(jnp.float32)
    dqb_val = (jnp.sum(dq32, axis=2, keepdims=True)
               if qb_ref.shape[-1] == 1 else dq32)
    _acc(dqb_ref, i, dqb_val, base, g)
    _acc(dbm_ref, i, ds, base, g)
    _acc(dsrow_ref, i, dsrow, base, g)


def _bm_spec(group: int, base: int, block):
    """BlockSpec fetching the right per-pair block for bm / srow inputs."""
    zeros = (0,) * (len(block) - 1)
    if group == base:
        return pl.BlockSpec(block, lambda i: (0,) + zeros,
                            memory_space=pltpu.VMEM)
    r = base // group
    return pl.BlockSpec(block, lambda i: (i % r,) + zeros,
                        memory_space=pltpu.VMEM)


def _core_fwd(q, k, v, bm, srow):
    pairs, d, t = q.shape
    base = bm.shape[0]
    group = _pick_group(base, t)
    grid = pairs // group
    tile = pl.BlockSpec((group, d, t), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[tile, tile, tile,
                  _bm_spec(group, base, (group, t, t)),
                  _bm_spec(group, base, (group, 1, t))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((pairs, d, t), q.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * pairs * t * t * d,
            bytes_accessed=4 * pairs * t * d * q.dtype.itemsize,
            transcendentals=pairs * t * t,
        ),
    )(q, k, v, bm, srow)


def _core_bwd(q, k, v, bm, srow, do):
    pairs, d, t = q.shape
    base = bm.shape[0]
    group = _pick_group(base, t)
    grid = pairs // group
    tile = pl.BlockSpec((group, d, t), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_tile = jax.ShapeDtypeStruct((pairs, d, t), q.dtype)
    const3 = pl.BlockSpec((base, t, t), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec((base, 1, t), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv, dbm, dsrow = pl.pallas_call(
        functools.partial(_bwd_kernel, base),
        grid=(grid,),
        in_specs=[tile, tile, tile,
                  _bm_spec(group, base, (group, t, t)),
                  _bm_spec(group, base, (group, 1, t)),
                  tile],
        out_specs=[tile, tile, tile, const3, const2],
        out_shape=[out_tile, out_tile, out_tile,
                   jax.ShapeDtypeStruct((base, t, t), jnp.float32),
                   jax.ShapeDtypeStruct((base, 1, t), jnp.float32)],
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=12 * pairs * t * t * d,
            bytes_accessed=8 * pairs * t * d * q.dtype.itemsize,
            transcendentals=pairs * t * t,
        ),
    )(q, k, v, bm, srow, do)
    return dq, dk, dv, dbm, dsrow


@jax.custom_vjp
def _attention_core(q, k, v, bm, srow):
    return _core_fwd(q, k, v, bm, srow)


def _core_fwd_rule(q, k, v, bm, srow):
    return _core_fwd(q, k, v, bm, srow), (q, k, v, bm, srow)


def _core_bwd_rule(res, do):
    return _core_bwd(*res, do)


_attention_core.defvjp(_core_fwd_rule, _core_bwd_rule)


# -- packed-QKV core: one (3, pairs, D, T) tensor in, no q/k/v splits -------

def _qkv_specs(group: int, d: int, t: int):
    """Three operand specs indexing the SAME (3, pairs, D, T) tensor at
    offsets 0/1/2 — the kernel reads its q/k/v blocks straight out of the
    QKV GEMM's output; XLA never materializes the three splits."""
    def spec(s):
        return pl.BlockSpec((1, group, d, t), lambda i, _s=s: (_s, i, 0, 0),
                            memory_space=pltpu.VMEM)

    return [spec(0), spec(1), spec(2)]


def _core_fwd_qkv(qkv3, qb, bm, srow):
    _, pairs, d, t = qkv3.shape
    base = bm.shape[0]
    group = _pick_group(base, t)
    grid = pairs // group
    qbw = qb.shape[-1]  # 1 (token-constant) or t (packed head blocks)
    tile = pl.BlockSpec((group, d, t), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel_qkv,
        grid=(grid,),
        in_specs=_qkv_specs(group, d, t) + [
            _bm_spec(group, base, (group, d, qbw)),
            _bm_spec(group, base, (group, t, t)),
            _bm_spec(group, base, (group, 1, t))],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((pairs, d, t), qkv3.dtype),
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * pairs * t * t * d,
            bytes_accessed=4 * pairs * t * d * qkv3.dtype.itemsize,
            transcendentals=pairs * t * t,
        ),
    )(qkv3, qkv3, qkv3, qb, bm, srow)


def _core_bwd_qkv(qkv3, qb, bm, srow, do):
    _, pairs, d, t = qkv3.shape
    base = bm.shape[0]
    group = _pick_group(base, t)
    grid = pairs // group
    qbw = qb.shape[-1]
    tile = pl.BlockSpec((group, d, t), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tri_out = pl.BlockSpec((3, group, d, t), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    constd = pl.BlockSpec((base, d, qbw), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    const3 = pl.BlockSpec((base, t, t), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec((base, 1, t), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    dqkv, dqb, dbm, dsrow = pl.pallas_call(
        functools.partial(_bwd_kernel_qkv, base),
        grid=(grid,),
        in_specs=_qkv_specs(group, d, t) + [
            _bm_spec(group, base, (group, d, qbw)),
            _bm_spec(group, base, (group, t, t)),
            _bm_spec(group, base, (group, 1, t)),
            tile],
        out_specs=[tri_out, constd, const3, const2],
        out_shape=[jax.ShapeDtypeStruct((3, pairs, d, t), qkv3.dtype),
                   jax.ShapeDtypeStruct((base, d, qbw), jnp.float32),
                   jax.ShapeDtypeStruct((base, t, t), jnp.float32),
                   jax.ShapeDtypeStruct((base, 1, t), jnp.float32)],
        interpret=_needs_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=12 * pairs * t * t * d,
            bytes_accessed=8 * pairs * t * d * qkv3.dtype.itemsize,
            transcendentals=pairs * t * t,
        ),
    )(qkv3, qkv3, qkv3, qb, bm, srow, do)
    return dqkv, dqb, dbm, dsrow


@jax.custom_vjp
def _attention_core_qkv(qkv3, qb, bm, srow):
    return _core_fwd_qkv(qkv3, qb, bm, srow)


def _core_qkv_fwd_rule(qkv3, qb, bm, srow):
    return _core_fwd_qkv(qkv3, qb, bm, srow), (qkv3, qb, bm, srow)


def _core_qkv_bwd_rule(res, do):
    return _core_bwd_qkv(*res, do)


_attention_core_qkv.defvjp(_core_qkv_fwd_rule, _core_qkv_bwd_rule)


# ---------------------------------------------------------------------------
# Packing + public API
# ---------------------------------------------------------------------------

def _pick_pack(nw: int, h: int, t: int) -> int:
    """Heads packed per block-diagonal tile (1 = no packing)."""
    if nw != 1 or t >= 128:
        return 1
    for target in (256, 128):
        p = target // t
        if p > 1 and h % p == 0:
            return p
    return 1


@functools.lru_cache(maxsize=None)
def _pack_filler(hp: int, p: int, t: int) -> np.ndarray:
    """(H', P*T, P*T) additive tensor: 0 on diagonal blocks, -1e9 off."""
    eye = np.kron(np.eye(p, dtype=np.float32), np.ones((t, t), np.float32))
    return np.broadcast_to((1.0 - eye) * _NEG, (hp, p * t, p * t)).copy()


def _packed_bm(bm0, hp: int, p: int, t: int):
    """Block-diagonal packed bias: per-head (T, T) blocks of ``bm0`` (H, T, T)
    on the diagonal of an (H', P*T, P*T) tile, -1e9 elsewhere."""
    filler = jnp.asarray(_pack_filler(hp, p, t))
    blocks = bm0.reshape(hp, p, t, t)
    bmp = filler
    for j in range(p):
        bmp = jax.lax.dynamic_update_slice(bmp, blocks[:, j], (0, j * t, j * t))
    return bmp


def _sharded_core(pairs: int, granule: int):
    """The attention core, shard_mapped over the data axis when a >1-device
    data mesh is active (see parallel.mesh.set_attention_mesh). The SPMD
    partitioner cannot split the Pallas custom calls itself — without this it
    all-gathers the batch around every kernel. shard_map's reverse-mode
    automatically psums the cotangents of the replicated bm/srow operands.

    Every shard must receive WHOLE images: ``granule`` is the row count of
    one image (windows_per_image x head-groups), and callers must pass the
    TRUE window count — not the mask's leading dim, which collapses to 1 for
    unshifted blocks. Whole-image shards keep the kernel's modular bias
    indexing aligned AND keep the surrounding partitioner sane (see
    parallel.mesh.maybe_shard_map_data for the failure mode)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import maybe_shard_map_data

    return maybe_shard_map_data(
        _attention_core, pairs, granule,
        in_specs=(P("data"), P("data"), P("data"), P(), P()),
        out_specs=P("data"))


def fused_window_attention(q, k, v, bias, mask, scale, layout: str = "nhtd",
                           windows_per_image: int = 1):
    """Full fused cosine window attention.

    Args:
        q, k, v: projected (unnormalized) q/k/v as (N, H, T, D) when
            ``layout == "nhtd"``, (N, T, H, D) (``"nthd"``), or already
            D-major (N, H, D, T) (``"nhdt"`` — what the module produces with
            a single relayout of the fused QKV output; zero further
            transposes). N must be a multiple of the window count nW
            (windows of one image contiguous). ``"nhdt_packed"``: q/k/v are
            (N, H', D, P*T) with P heads pre-packed along the token axis in
            (head-block, token) order — the caller emits this layout straight
            from a column-permuted QKV GEMM (head axis split (H', P) with P
            innermost-after-D), so packing costs ZERO transposes; requires
            nW == 1 (unshifted) and P*T a lane multiple.
        bias: (H, T, T) fp32 position bias (already 16*sigmoid'd).
        mask: (nW, T, T) fp32 additive shift mask, already doubled by the
            caller (the HF reference adds it twice); zeros when unshifted.
        scale: (H,) fp32 exp(clamped logit_scale).
        windows_per_image: the TRUE number of windows per image (the mask's
            leading dim collapses to 1 for unshifted blocks) — required for
            whole-image shard granularity under a >1-device data mesh.
    Returns:
        Attention output in q's dtype, in the same layout as the inputs.
    """
    if layout == "nhdt_packed":
        n, hp, d, tp = q.shape
        h = bias.shape[0]
        p = h // hp
        t = tp // p
        assert mask.shape[0] == 1, "packed layout requires unshifted windows"
        bm0 = bias + mask[0][None]  # (H, T, T)
        bmp = _packed_bm(bm0, hp, p, t)
        srow = jnp.repeat(scale.reshape(hp, p), t, axis=1)[:, None, :]  # (H',1,T')
        core = _sharded_core(n * hp, windows_per_image * hp)

        def flatp(x):
            return x.reshape(n * hp, d, tp)

        out = core(flatp(q), flatp(k), flatp(v), bmp, srow)
        return out.reshape(n, hp, d, tp)
    if layout == "nhdt":
        # Already D-major (the module relayouts the fused QKV output once
        # and splits it for free): no per-tensor transposes at all.
        n, h, d, t = q.shape
        to_hdT = from_hdT = lambda x: x
    elif layout == "nthd":
        n, t, h, d = q.shape
        # ONE lane relayout per tensor: (N, T, H, D) -> (N, H, D, T).
        to_hdT = lambda x: jnp.transpose(x, (0, 2, 3, 1))
        from_hdT = lambda x: jnp.transpose(x, (0, 3, 1, 2))
    else:
        n, h, t, d = q.shape
        to_hdT = lambda x: jnp.transpose(x, (0, 1, 3, 2))
        from_hdT = lambda x: jnp.transpose(x, (0, 1, 3, 2))
    nw = mask.shape[0]
    bm = bias[None] + mask[:, None]  # (nW, H, T, T) fp32

    p = _pick_pack(nw, h, t)
    if p > 1:
        hp, tp = h // p, p * t

        def pack(x):
            # (N, H, D, T) -> (N, H', D, T'=P*T): the (p, d) swap keeps the
            # lane axis (T) in place, so only the to_hdT relayout is paid.
            x = to_hdT(x).reshape(n, hp, p, d, t)
            return x.transpose(0, 1, 3, 2, 4).reshape(n * hp, d, tp)

        # Block-diagonal bm: per-head blocks on the diagonal, -1e9 elsewhere.
        bmp = _packed_bm(bm[0], hp, p, t)
        srow = jnp.repeat(scale.reshape(hp, p), t, axis=1)[:, None, :]  # (H',1,T')
        out = _sharded_core(n * hp, windows_per_image * hp)(
            pack(q), pack(k), pack(v), bmp, srow)
        out = (out.reshape(n, hp, d, p, t).transpose(0, 1, 3, 2, 4)
               .reshape(n, h, d, t))
        return from_hdT(out)

    base = nw * h
    srow = jnp.broadcast_to(scale[None, :, None], (nw, h, t)).reshape(base, 1, t)

    def flat(x):
        return to_hdT(x).reshape(n * h, d, t)

    # max() keeps direct callers that omit windows_per_image at least at the
    # mask-derived granule (shifted masks carry the true window count).
    out = _sharded_core(n * h, max(windows_per_image, nw) * h)(
        flat(q), flat(k), flat(v), bm.reshape(base, t, t), srow)
    return from_hdT(out.reshape(n, h, d, t))


def _sharded_core_qkv(pairs: int, granule: int):
    """Packed-QKV core shard_mapped over the data axis: the data-sharded
    operand is (3, pairs, D, T), sharded on axis 1."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import maybe_shard_map_data

    return maybe_shard_map_data(
        _attention_core_qkv, pairs, granule,
        in_specs=(P(None, "data"), P(), P(), P()), out_specs=P("data"))


def fused_window_attention_qkv(qkv3, qb, bias, mask, scale, heads: int,
                               packed_p: int = 1,
                               windows_per_image: int = 1):
    """Fused cosine window attention fed by ONE packed QKV tensor.

    The module's QKV GEMM emits ``qkv3`` as (3, N, C, T) (q/k/v along the
    MAJOR axis — ``einsum("ntc,csm->snmt")``), so q/k/v are never split into
    separate buffers: the kernel reads its three blocks out of the same
    tensor via offset index maps, and the backward emits one (3, N, C, T)
    cotangent the GEMM transpose consumes directly. Removes the ~6 ms/step
    of split/concat copies the r4 baseline trace attributed to
    ``jnp.split`` (models/attention.py:230-246 provenance table).

    Args:
        qkv3: (3, N, C, T); C = heads x D in (head, d) column order, or the
            packed (head_group, d, head_in_group) order when packed_p > 1.
        qb: (C,) f32/bf16 q-projection bias in the SAME column order (zeros
            when qkv_bias is off); added in-kernel (k has no bias; the
            v-bias is folded through the output projection by the caller).
        bias: (H, T, T) fp32 position bias (already 16*sigmoid'd).
        mask: (nW, T, T) additive shift mask, already doubled; packed_p > 1
            requires nW == 1.
        scale: (H,) fp32 exp(clamped logit_scale).
        heads: H.
        packed_p: heads packed per block-diagonal tile (stages 2-3).
        windows_per_image: TRUE windows per image (shard granularity).
    Returns:
        (N, C, T) attention output in qkv3's dtype (packed C order preserved).
    """
    _, n, c, t_in = qkv3.shape
    if packed_p > 1:
        p = packed_p
        hp = heads // p
        d = c // heads
        t = t_in * p  # packed tile token width
        assert mask.shape[0] == 1, "packed layout requires unshifted windows"
        bm0 = bias + mask[0][None]
        bmp = _packed_bm(bm0, hp, p, t_in)
        srow = jnp.repeat(scale.reshape(hp, p), t_in, axis=1)[:, None, :]
        # qb in packed (hp, d, p) order, each entry constant over the T_in
        # tokens of its head block: (hp, d, p) -> (hp, d, p*T_in).
        qbp = jnp.repeat(qb.reshape(hp, d, p), t_in, axis=2)
        core = _sharded_core_qkv(n * hp, windows_per_image * hp)
        out = core(qkv3.reshape(3, n * hp, d, t),
                   qbp.astype(jnp.float32), bmp, srow)
        return out.reshape(n, c, t_in)
    nw = mask.shape[0]
    d = c // heads
    base = nw * heads
    bm = (bias[None] + mask[:, None]).reshape(base, t_in, t_in)
    srow = jnp.broadcast_to(scale[None, :, None],
                            (nw, heads, t_in)).reshape(base, 1, t_in)
    qbt = jnp.broadcast_to(qb.reshape(1, heads, d, 1),
                           (nw, heads, d, 1)).reshape(base, d, 1)
    core = _sharded_core_qkv(n * heads, max(windows_per_image, nw) * heads)
    out = core(qkv3.reshape(3, n * heads, d, t_in),
               qbt.astype(jnp.float32), bm, srow)
    return out.reshape(n, c, t_in)


# ---------------------------------------------------------------------------
# Unfused jnp reference (tests / numerics oracle)
# ---------------------------------------------------------------------------

def _reference_core(qs, kn, v, bias, mask):
    n, h, t, d = qs.shape
    nw = mask.shape[0]
    s = jnp.einsum("nhtd,nhsd->nhts", qs.astype(jnp.float32), kn.astype(jnp.float32))
    s = s + bias[None]
    s = s.reshape(n // nw, nw, h, t, t) + mask[None, :, None]
    s = s.reshape(n, h, t, t)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhts,nhsd->nhtd", p.astype(v.dtype), v).astype(qs.dtype)


def _forward_reference(q, k, v, bias, mask, scale):
    """Unfused jnp reference of the full op (tests)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), _EPS)
    kn = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), _EPS)
    qs = qn * scale[None, :, None, None]
    return _reference_core(qs.astype(q.dtype), kn.astype(q.dtype), v, bias, mask)

"""Shifted-window cosine attention with log-spaced continuous relative
position bias (SwinV2-style) — the core mixing op of scOT.

Behavioral parity targets (not ported code):
- cosine attention with learned per-head clamped logit scale, key projection
  bias-free: transformers swinv2 ``Swinv2SelfAttention`` (modeling_swinv2.py:
  407-539), used by the reference at /root/reference/scOT/model.py:539.
- log-CPB: coords normalized to +-8 then sign*log2(|x|+1)/log2(8), MLP
  Linear(2,512)->ReLU->Linear(512,heads, no bias), 16*sigmoid on the gathered
  bias.
- shifted-window additive mask: -100 per application; the HF implementation
  adds the mask twice (an upstream quirk), reproduced here as a single
  2x-scaled add so that pre-softmax logits match bit-for-bit.

The window geometry (partition/reverse, roll, masks, CPB tables) is all static
given (H, W, window, shift), so it's precomputed with numpy at trace time and
baked into the compiled program as constants.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .layers import normal_init

Dtype = Any


# ---------------------------------------------------------------------------
# Static geometry helpers (numpy; cached per window configuration)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def relative_coords_table(window_size: int) -> np.ndarray:
    """Log-spaced normalized relative-coordinate table, shape
    ((2w-1)*(2w-1), 2), the CPB MLP's input."""
    w = window_size
    coords = np.arange(-(w - 1), w, dtype=np.float32)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)  # (2w-1, 2w-1, 2)
    if w > 1:
        table = table / (w - 1)
    table = table * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2).astype(np.float32)


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """(T, T) index into the flattened (2w-1)^2 bias table, T = w*w."""
    w = window_size
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, T, T)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(height: int, width: int, window: int, shift: int) -> Optional[np.ndarray]:
    """Additive attention mask (num_windows, T, T) for the cyclic-shift scheme;
    0 within a contiguous region, -100 across regions. None when shift == 0."""
    if shift == 0:
        return None
    img = np.zeros((height, width), dtype=np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    # partition into windows
    img = img.reshape(height // window, window, width // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)  # (nW, T)
    mask = img[:, None, :] - img[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, window*window, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jax.Array, window: int, height: int, width: int) -> jax.Array:
    """(B*nW, window*window, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    nh, nw = height // window, width // window
    x = x.reshape(-1, nh, nw, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, height, width, c)


# ---------------------------------------------------------------------------
# Attention module
# ---------------------------------------------------------------------------

class _ProjParams(nn.Module):
    """Dense-layout parameter holder (kernel (in, out)[, bias]) with no
    forward of its own — lets q/k/v run as ONE fused GEMM while keeping the
    reference's per-projection checkpoint layout."""

    in_dim: int
    out_dim: int
    use_bias: bool
    initializer_range: float

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", normal_init(self.initializer_range),
                            (self.in_dim, self.out_dim), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class WindowAttention(nn.Module):
    """Cosine attention over flattened windows.

    Input: (num_windows_total, T, C) with T = window_size**2. The additive
    mask (num_windows_per_image, T, T) is a static constant.
    """

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02
    impl: str = "xla"  # "xla" | "pallas"
    score_dtype: Dtype = jnp.float32
    # TRUE windows per image (the shift mask's leading dim collapses to 1
    # for unshifted blocks) — the fused kernels need it to keep data-mesh
    # shards whole-image aligned.
    windows_per_image: int = 1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[np.ndarray],
        deterministic: bool = True,
    ) -> jax.Array:
        bnw, t, c = x.shape
        heads, hd = self.num_heads, self.dim // self.num_heads
        init = normal_init(self.initializer_range)
        dense = functools.partial(
            nn.Dense, dtype=self.dtype, kernel_init=init, bias_init=nn.initializers.zeros
        )

        # Fused QKV: one (C -> 3C) GEMM instead of three, reading the
        # activations once. Params keep the reference's separate q/k/v layout
        # (checkpoint compat); the concat of the three kernels is tiny and
        # folded by XLA.
        wq = _ProjParams(self.dim, self.dim, self.qkv_bias,
                         self.initializer_range, name="query")()
        wk = _ProjParams(self.dim, self.dim, False,
                         self.initializer_range, name="key")()
        wv = _ProjParams(self.dim, self.dim, self.qkv_bias,
                         self.initializer_range, name="value")()
        w_qkv = jnp.concatenate([wq[0], wk[0], wv[0]], axis=1).astype(self.dtype)

        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(math.log(10.0)),
            (heads, 1, 1), jnp.float32,
        )
        bias = self._position_bias()  # (heads, T, T) fp32

        use_pallas = (self.impl == "pallas"
                      and not (self.attn_drop > 0.0 and not deterministic))
        if use_pallas:
            from ..ops.window_attention import (_pick_pack,
                                                fused_window_attention_qkv)

            scale = jnp.exp(jnp.minimum(logit_scale, math.log(1.0 / 0.01)))[:, 0, 0]
            if mask is None:
                m = jnp.zeros((1, t, t), jnp.float32)
            else:
                # The HF reference adds the shift mask twice
                # (modeling_swinv2.py:513-520); bake the 2x in.
                m = 2.0 * jnp.asarray(mask, jnp.float32)
            wp = _ProjParams(self.dim, self.dim, True,
                             self.initializer_range, name="proj")()
            proj_bias = wp[1]
            if self.qkv_bias:
                # Softmax rows sum to 1, so the v-bias passes through the
                # attention unchanged: P @ (v + b 1^T) == P @ v + b. Push it
                # through the output projection at trace time (a (C,)@(C,C)
                # GEMV on params) instead of paying a full (N, C, T)
                # elementwise pass per layer (~2 ms/step in the r3 profile).
                proj_bias = proj_bias + wv[1] @ wp[0]

            # The QKV GEMM EMITS the kernel's world directly as ONE packed
            # (3, N, C, T) tensor — q/k/v along the MAJOR axis — so the
            # module never splits it: the kernel reads its three blocks from
            # the same tensor via offset index maps, the q bias is added
            # in-kernel, and the backward emits a single (3, N, C, T)
            # cotangent the GEMM transpose consumes without a concat (the
            # r4 provenance table attributed ~6 ms/step to the old
            # split/concat copies).
            qkv_eq3 = "ntc,csm->snmt"
            p = _pick_pack(m.shape[0], heads, t)
            if p > 1:
                # Small-T stages (2-3) run block-diagonally head-packed in the
                # kernel. Permute the QKV weight COLUMNS so the GEMM emits the
                # packed layout directly — C order (head, d) -> (head_group,
                # d, head_in_group) — and the packed tiles fall out of pure
                # reshapes: zero runtime transposes (the explicit pack/unpack
                # cost ~7 ms/step in the r3 profile). The permute rides the
                # concat+cast pass XLA already does on the small weights.
                hp = heads // p

                def perm_cols(w):
                    return (w.reshape(-1, hp, p, hd).transpose(0, 1, 3, 2)
                            .reshape(-1, heads * hd))

                w3 = jnp.stack(
                    [perm_cols(wq[0]), perm_cols(wk[0]), perm_cols(wv[0])],
                    axis=1).astype(self.dtype)  # (C, 3, C)
                qkv3 = jnp.einsum(qkv_eq3, x.astype(self.dtype), w3)
                qb = (wq[1].reshape(hp, p, hd).transpose(0, 2, 1).reshape(-1)
                      if self.qkv_bias else jnp.zeros((c,), jnp.float32))
                out = fused_window_attention_qkv(
                    qkv3, qb, bias, m, scale, heads, packed_p=p,
                    windows_per_image=self.windows_per_image)
                # Packed C order is (head_group, d, head_in_group); contract
                # it against the correspondingly row-permuted proj kernel.
                wp_k = (wp[0].reshape(hp, p, hd, c).transpose(0, 2, 1, 3)
                        .reshape(c, c))
            else:
                w3 = jnp.stack([wq[0], wk[0], wv[0]], axis=1).astype(self.dtype)
                qkv3 = jnp.einsum(qkv_eq3, x.astype(self.dtype), w3)
                qb = (wq[1] if self.qkv_bias
                      else jnp.zeros((c,), jnp.float32))
                out = fused_window_attention_qkv(
                    qkv3, qb, bias, m, scale, heads, packed_p=1,
                    windows_per_image=self.windows_per_image)
                wp_k = wp[0]
            # Project straight out of the D-major world: (N, C, T) @ (C, C)
            # contracting the sublane axis -> token-major (N, T, C) with no
            # explicit relayout copy.
            out = jnp.einsum("nct,co->nto", out, wp_k.astype(self.dtype)) \
                + proj_bias.astype(self.dtype)
            if self.proj_drop > 0.0 and not deterministic:
                out = nn.Dropout(self.proj_drop)(out, deterministic=False)
            return out

        qkv = jnp.dot(x.astype(self.dtype), w_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.qkv_bias:
            q = q + wq[1].astype(q.dtype)
            v = v + wv[1].astype(v.dtype)
        # Keep the natural (N, T, H, D) layout — einsum contracts directly,
        # avoiding explicit head transposes (XLA layout copies).
        q = q.reshape(bnw, t, heads, hd)
        k = k.reshape(bnw, t, heads, hd)
        v = v.reshape(bnw, t, heads, hd)

        # Cosine attention in fp32: L2-normalize q and k along the head dim
        # (torch F.normalize semantics: x / max(||x||, 1e-12)) — kept on
        # the SMALL (B, T, H, 32) tensors; scaling the (B, H, T, T) score
        # matrix by rsqrt factors instead was measured 15 ms/step SLOWER
        # (extra passes + backward reductions over the score tensor), and
        # block-diagonal head packing of the tiny stages was ~15 ms/step
        # slower too (PK^2 x the score volume; XLA already handles the
        # small shapes well in-model). The learned logit scale is folded
        # into q BEFORE the score matmul — same math, but it avoids an
        # extra full pass over the (N, H, T, T) score tensor.
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
        kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(1.0 / 0.01)))
        qf = qf * scale.reshape(1, 1, heads, 1)
        sd = self.score_dtype
        scores = jnp.einsum("bthd,bshd->bhts", qf.astype(sd), kf.astype(sd),
                            preferred_element_type=sd)
        scores = scores + bias[None].astype(sd)

        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask, dtype=sd)
            # Mask added twice in the HF reference; a single 2x add
            # reproduces the exact pre-softmax logits.
            scores = scores.reshape(bnw // nw, nw, heads, t, t) + 2.0 * m[None, :, None]
            scores = scores.reshape(bnw, heads, t, t)

        probs = jax.nn.softmax(scores, axis=-1)
        if self.attn_drop > 0.0 and not deterministic:
            probs = nn.Dropout(self.attn_drop)(probs, deterministic=False)
        # output_attentions surface (reference model.py:57-63): captured
        # only under apply(..., mutable=["intermediates"]); DCE'd by XLA
        # otherwise.
        self.sow("intermediates", "attention_probs", probs)
        probs = probs.astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v)

        out = out.reshape(bnw, t, c)
        out = dense(self.dim, name="proj")(out)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.proj_drop)(out, deterministic=False)
        return out

    def _position_bias(self) -> jax.Array:
        """CPB MLP over the static log-coord table, expanded to (heads, T, T),
        then 16*sigmoid.

        The (T, T) relative-position expansion is block-Toeplitz with STATIC
        structure, so instead of a dynamic gather (whose backward is a
        TPU-hostile scatter-add into the table — ~20ms/step for ScOT-B) it is
        built from w static slices per axis; the backward becomes cheap pads.
        Numerically identical to the gather formulation (tested)."""
        w = self.window_size
        init = normal_init(self.initializer_range)
        table = jnp.asarray(relative_coords_table(w))  # ((2w-1)^2, 2)
        h = nn.Dense(512, name="cpb_mlp1", dtype=jnp.float32, kernel_init=init,
                     bias_init=nn.initializers.zeros)(table)
        h = jax.nn.relu(h)
        h = nn.Dense(self.num_heads, use_bias=False, name="cpb_mlp2",
                     dtype=jnp.float32, kernel_init=init)(h)  # (M, heads)
        t = w * w
        table2d = h.reshape(2 * w - 1, 2 * w - 1, self.num_heads)
        # rows[y', y, dx, H] = table2d[y - y' + w-1, dx]: one static slice per y'
        rows = jnp.stack(
            [jax.lax.slice_in_dim(table2d, w - 1 - yp, 2 * w - 1 - yp, axis=0)
             for yp in range(w)], axis=0)  # (w_y', w_y, 2w-1, H)
        # full[y', y, x', x, H] = rows[y', y, x - x' + w-1]
        full = jnp.stack(
            [jax.lax.slice_in_dim(rows, w - 1 - xp, 2 * w - 1 - xp, axis=2)
             for xp in range(w)], axis=2)  # (w_y', w_y, w_x', w_x, H)
        # bias[H, t=(y,x), t'=(y',x')]
        bias = full.transpose(4, 1, 3, 0, 2).reshape(self.num_heads, t, t)
        return 16.0 * jax.nn.sigmoid(bias)

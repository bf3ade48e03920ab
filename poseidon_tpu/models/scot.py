"""The scOT model: a SwinV2-style hierarchical vision-transformer neural
operator with a U-Net encoder/decoder, rebuilt TPU-native in Flax.

Architecture parity targets (/root/reference/scOT/model.py — structure only,
no code ported):
- SwinBlock: post-norm residuals — ``x = x + drop_path(norm(attn(x)))`` then
  ``x = x + drop_path(norm(mlp(x)))`` (model.py:563-574).
- Encode stage: depth blocks alternating shift 0 / window//2, then
  PatchMerging applied to ``blocks_out + stage_input`` (stage residual,
  model.py:843-849). The deepest stage has no merging (and hence no stage
  residual on its output).
- Decode stage: mirror with PatchUnmerging; blocks run shifted-first when
  depth is even because the reference constructs them in reversed order
  (model.py:885-901).
- Decoder consumes the deepest skip as its input and adds skips (after their
  ConvNeXt residual blocks) before stages 1..3 (model.py:1175-1177, 1396-1401).
- Drop-path rates: linspace(0, rate, 2*sum(depths)); first half for the
  encoder, second half for the decoder; decoder stage i_layer takes slice
  [sum(depths[i+1:]) : sum(depths[i:])] (model.py:976-982, 1111-1117).
- FFT up/down-resampling when input resolution != config.image_size
  (model.py:1293-1316).
- Loss: per-channel-group normalized L1/L2 (model.py:1424-1484).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..config import ScOTConfig
from .attention import (
    WindowAttention,
    shifted_window_mask,
    window_partition,
    window_reverse,
)
from .layers import (
    ConvNeXtBlock,
    DropPath,
    PatchEmbed,
    PatchMerging,
    PatchRecovery,
    PatchUnmerging,
    ResNetBlock,
    gelu_exact,
    make_norm,
    normal_init,
)

Dtype = Any


# ---------------------------------------------------------------------------
# Spectral resampling (reference model.py:1293-1316)
# ---------------------------------------------------------------------------

def fft_downsample(x: jax.Array, target_size: int) -> jax.Array:
    """Spectral downsample of (..., H, W) square images (norm='forward')."""
    n = x.shape[-2]
    freqs = np.fft.fftfreq(n, d=1.0 / n)
    sel = np.where((freqs >= -target_size / 2) & (freqs <= target_size / 2 - 1))[0]
    xh = jnp.fft.fft2(x, norm="forward")
    xh = jnp.take(jnp.take(xh, sel, axis=-2), sel, axis=-1)
    return jnp.fft.ifft2(xh, norm="forward").real


def fft_upsample(x: jax.Array, target_size: int) -> jax.Array:
    """Spectral upsample of (..., H, W) square images by zero-padding the
    shifted spectrum (norm='forward')."""
    n = x.shape[-2]
    pad = (target_size - n) // 2
    xh = jnp.fft.fftshift(jnp.fft.fft2(x, norm="forward"), axes=(-2, -1))
    pad_width = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)]
    xh = jnp.pad(xh.real, pad_width) + 1j * jnp.pad(xh.imag, pad_width)
    xh = jnp.fft.ifftshift(xh, axes=(-2, -1))
    return jnp.fft.ifft2(xh, norm="forward").real


# ---------------------------------------------------------------------------
# Transformer block
# ---------------------------------------------------------------------------

class SwinBlock(nn.Module):
    """One post-norm Swin transformer block on a (B, L, C) token map."""

    config: ScOTConfig
    dim: int
    num_heads: int
    resolution: int  # stage token-grid side length
    shifted: bool
    drop_path: float
    dtype: Dtype = jnp.float32

    def _drop_path(self, h: jax.Array, rate_traced, deterministic: bool) -> jax.Array:
        """Stochastic depth with either the static attribute rate or a traced
        per-block rate (the scanned path passes rates as scan inputs)."""
        if deterministic or self.config.drop_path_rate == 0.0:
            return h
        if rate_traced is None:
            return DropPath(self.drop_path)(h, deterministic)
        keep = 1.0 - rate_traced
        shape = (h.shape[0],) + (1,) * (h.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, h / keep.astype(h.dtype), jnp.zeros_like(h))

    def _fused_cln_cond(self, c: int, name: str, time, b: int,
                        deterministic: bool, drop_path_rate):
        """Per-sample (B, C) conditional scale/shift for a CLN whose math runs
        inside a fused kernel, with the drop-path keep mask folded in (the
        fused epilogues are linear in scale/shift). Creates the identical
        cond_scale/cond_shift param fragments as ConditionalLayerNorm."""
        from ..models.layers import CLNParams

        ws, wsb, wb, wbb = CLNParams(c, self.config.initializer_range,
                                     name=name)()
        tcol = time.reshape(-1, 1).astype(jnp.float32)
        scale = tcol @ ws + wsb
        shift = tcol @ wb + wbb
        if not deterministic and self.config.drop_path_rate > 0.0:
            rate = (drop_path_rate if drop_path_rate is not None
                    else self.drop_path)
            keep = 1.0 - rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (b, 1))
            factor = mask.astype(jnp.float32) / keep
            scale = scale * factor
            shift = shift * factor
        return scale, shift

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array],
                 deterministic: bool = True,
                 drop_path_rate: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        h = w = self.resolution
        window = min(cfg.window_size, h)
        shift = (cfg.window_size // 2) if (self.shifted and h > window) else 0
        b, l, c = x.shape

        shortcut = x
        hs = x.reshape(b, h, w, c)
        # Pad to a window multiple (no-op for the standard 128->32 grid).
        hp, wp = -h % window, -w % window
        if hp or wp:
            hs = jnp.pad(hs, ((0, 0), (0, hp), (0, wp), (0, 0)))
        hpad, wpad = h + hp, w + wp

        if shift > 0:
            hs = jnp.roll(hs, (-shift, -shift), axis=(1, 2))
        windows = window_partition(hs, window)

        mask = shifted_window_mask(hpad, wpad, window, shift)
        attn_ret = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=window,
            qkv_bias=cfg.qkv_bias,
            attn_drop=cfg.attention_probs_dropout_prob,
            proj_drop=cfg.attention_probs_dropout_prob,
            dtype=self.dtype,
            initializer_range=cfg.initializer_range,
            impl=cfg.attention_impl,
            score_dtype=jnp.bfloat16 if cfg.score_dtype == "bfloat16" else jnp.float32,
            windows_per_image=(hpad // window) * (wpad // window),
            name="attn",
        )(windows, mask, deterministic)

        norm_kw = dict(eps=cfg.layer_norm_eps, dtype=self.dtype,
                       initializer_range=cfg.initializer_range)
        hs = window_reverse(attn_ret, window, hpad, wpad)
        if shift > 0:
            hs = jnp.roll(hs, (shift, shift), axis=(1, 2))
        if hp or wp:
            hs = hs[:, :h, :w]
        hs = hs.reshape(b, l, c)

        # Post-norm residual (SwinV2 order).
        hs = make_norm(cfg.use_conditioning, c, name="norm_attn",
                       **norm_kw)(hs, time)
        x = shortcut + self._drop_path(hs, drop_path_rate, deterministic)

        # The block MLP (HF Swinv2Intermediate/Output, modeling_swinv2.py:
        # 603-634). Params are held Dense-layout via _ProjParams so the XLA
        # and fused-Pallas paths share one checkpoint tree; the pallas path
        # keeps the (M, 4C) hidden state VMEM-resident (ops/mlp.py).
        from .attention import _ProjParams

        f = int(cfg.mlp_ratio * c)
        w1, b1 = _ProjParams(c, f, True, cfg.initializer_range,
                             name="mlp_fc1")()
        w2, b2 = _ProjParams(f, c, True, cfg.initializer_range,
                             name="mlp_fc2")()

        # Fully-fused block tail (ops/mlp.py): MLP + ConditionalLayerNorm +
        # residual in one D-major kernel, with the drop-path keep mask folded
        # into the per-sample conditioning scale/shift (the epilogue is
        # linear in them). Falls back to the composable path when the
        # geometry/options don't qualify.
        from ..ops.mlp import dm_eligible

        fused_tail = (cfg.attention_impl == "pallas" and cfg.fused_block_tail
                      and cfg.use_conditioning and time is not None
                      and (cfg.hidden_dropout_prob == 0.0 or deterministic)
                      and dm_eligible(x.shape, c, f,
                                      jnp.dtype(self.dtype).itemsize,
                                      cln=True))
        if fused_tail:
            from ..ops.mlp import fused_mlp_cln

            scale, shiftv = self._fused_cln_cond(c, "norm_mlp", time, b,
                                                 deterministic, drop_path_rate)
            return fused_mlp_cln(x.astype(self.dtype), w1.astype(self.dtype),
                                 b1, w2.astype(self.dtype), b2, scale, shiftv,
                                 eps=cfg.layer_norm_eps)

        if cfg.attention_impl == "pallas":
            from ..ops.mlp import fused_mlp

            mlp = fused_mlp(x.astype(self.dtype), w1.astype(self.dtype),
                            b1, w2.astype(self.dtype), b2,
                            min_win_tile=cfg.mlp_min_win_tile)
        else:
            mlp = gelu_exact(x.astype(self.dtype) @ w1.astype(self.dtype)
                             + b1.astype(self.dtype))
            mlp = mlp @ w2.astype(self.dtype) + b2.astype(self.dtype)
        if cfg.hidden_dropout_prob > 0.0 and not deterministic:
            mlp = nn.Dropout(cfg.hidden_dropout_prob)(mlp, deterministic=False)
        mlp = make_norm(cfg.use_conditioning, c, name="norm_mlp", **norm_kw)(mlp, time)
        return x + self._drop_path(mlp, drop_path_rate, deterministic)


class BlockPair(nn.Module):
    """Two consecutive Swin blocks — one unshifted, one shifted (or the
    reverse for the decoder) — as the scan body for ``config.scan_blocks``.
    ``dpr_pair`` carries the two per-block drop-path rates as traced scan
    inputs."""

    config: ScOTConfig
    dim: int
    num_heads: int
    resolution: int
    shifted_first: bool
    deterministic: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array], dpr_pair: jax.Array):
        kw = dict(config=self.config, dim=self.dim, num_heads=self.num_heads,
                  resolution=self.resolution, drop_path=0.0,
                  dtype=self.dtype)
        x = SwinBlock(shifted=self.shifted_first, name="block_a", **kw)(
            x, time, self.deterministic, drop_path_rate=dpr_pair[0])
        x = SwinBlock(shifted=not self.shifted_first, name="block_b", **kw)(
            x, time, self.deterministic, drop_path_rate=dpr_pair[1])
        return x, None


def _remat_block(cls, remat, **remat_kw):
    """Wrap a block class per the ``remat`` mode: ``True`` recomputes the
    block in the backward (classic gradient checkpointing); ``"save_all"``
    keeps jax.checkpoint's structured backward but SAVES every residual
    (``everything_saveable`` policy) — no recompute, same FLOPs as no remat,
    but the backward is emitted per-block instead of as one flat transpose
    (works around TPU compiler blowups on scan + unstructured backward +
    optimizer in a single jit)."""
    if remat == "save_all":
        return nn.remat(
            cls, policy=jax.checkpoint_policies.everything_saveable, **remat_kw)
    if remat == "save_dots":
        # Stash matmul outputs (the expensive-to-recompute tensors), replay
        # the cheap elementwise/norm ops in the backward. Under scan_blocks
        # this shrinks the per-iteration residual stack enough to avoid the
        # HBM blowup that a full stash hits at large batch, at a fraction of
        # full remat's recompute cost.
        return nn.remat(
            cls, policy=jax.checkpoint_policies.dots_saveable, **remat_kw)
    if remat:
        return nn.remat(cls, **remat_kw)
    return cls


def _scan_stage(parent_cfg: ScOTConfig, *, dim: int, num_heads: int,
                resolution: int, shifted_first: bool, deterministic: bool,
                dtype, remat, name: str):
    """Build the nn.scan-wrapped BlockPair for one stage."""
    body = _remat_block(BlockPair, remat, prevent_cse=False)
    scanned = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast, 0),
        length=None,  # inferred from dpr input
    )
    return scanned(config=parent_cfg, dim=dim, num_heads=num_heads,
                   resolution=resolution, shifted_first=shifted_first,
                   deterministic=deterministic, dtype=dtype, name=name)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------


def _drop_path_rates(cfg: ScOTConfig) -> Tuple[List[float], List[float]]:
    total = 2 * sum(cfg.depths)
    rates = list(np.linspace(0.0, cfg.drop_path_rate, total))
    half = total // 2
    return rates[:half], rates[half:]


class Encoder(nn.Module):
    """Hierarchical encoder; returns the pre-downsample state of every stage
    (the U-Net skip states)."""

    config: ScOTConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array],
                 deterministic: bool = True) -> List[jax.Array]:
        cfg = self.config
        block_cls = _remat_block(SwinBlock, self.remat, static_argnums=(3,))
        dpr, _ = _drop_path_rates(cfg)
        skips: List[jax.Array] = []
        for i in range(cfg.num_stages):
            res = cfg.stage_resolution(i)
            dim = cfg.stage_dim(i)
            depth = cfg.depths[i]
            stage_input = x
            offset = sum(cfg.depths[:i])
            if cfg.scan_blocks and depth >= 2 and depth % 2 == 0:
                dpr_stage = jnp.asarray(
                    dpr[offset:offset + depth], jnp.float32).reshape(depth // 2, 2)
                x, _ = _scan_stage(
                    cfg, dim=dim, num_heads=cfg.num_heads[i], resolution=res,
                    shifted_first=False, deterministic=deterministic,
                    dtype=self.dtype, remat=self.remat,
                    name=f"stage_{i}_pairs",
                )(x, time, dpr_stage)
            else:
                for j in range(depth):
                    x = block_cls(
                        config=cfg, dim=dim, num_heads=cfg.num_heads[i],
                        resolution=res, shifted=(j % 2 == 1),
                        drop_path=dpr[offset + j], dtype=self.dtype,
                        name=f"stage_{i}_block_{j}",
                    )(x, time, deterministic)
            skips.append(x)
            # Reference API-surface parity (output_hidden_states,
            # Swinv2EncoderOutput at model.py:1094-1099): capture with
            # apply(..., mutable=["intermediates"]) — DCE'd under jit
            # otherwise.
            self.sow("intermediates", "hidden_states", x)
            if i < cfg.num_stages - 1:
                # Stage residual feeds the downsample (model.py:843-849).
                x = PatchMerging(
                    dim=dim, input_resolution=res,
                    use_conditioning=cfg.use_conditioning,
                    eps=cfg.layer_norm_eps, dtype=self.dtype,
                    initializer_range=cfg.initializer_range,
                    name=f"downsample_{i}",
                )(x + stage_input, time)
        return skips


class Decoder(nn.Module):
    """Mirror decoder: runs stages deepest-first, adds skip states before
    stages 1..N-1, upsamples between stages."""

    config: ScOTConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, skips: List[jax.Array],
                 time: Optional[jax.Array], deterministic: bool = True) -> jax.Array:
        cfg = self.config
        block_cls = _remat_block(SwinBlock, self.remat, static_argnums=(3,))
        _, dpr = _drop_path_rates(cfg)
        n = cfg.num_stages
        for k in range(n):  # execution order; i_layer = n-1-k is the level
            lvl = n - 1 - k
            if k > 0:
                x = x + skips[lvl]
            res = cfg.stage_resolution(lvl)
            dim = cfg.stage_dim(lvl)
            depth = cfg.depths[lvl]
            lo = sum(cfg.depths[lvl + 1:])
            if cfg.scan_blocks and depth >= 2 and depth % 2 == 0:
                # Even depth: executed blocks alternate shifted-first
                # (the reference builds decode blocks in reversed order).
                dpr_stage = jnp.asarray(
                    dpr[lo:lo + depth], jnp.float32).reshape(depth // 2, 2)
                x, _ = _scan_stage(
                    cfg, dim=dim, num_heads=cfg.num_heads[lvl], resolution=res,
                    shifted_first=True, deterministic=deterministic,
                    dtype=self.dtype, remat=self.remat,
                    name=f"stage_{lvl}_pairs",
                )(x, time, dpr_stage)
            else:
                for j in range(depth):
                    # j-th executed block is shifted iff (depth-1-j) is odd.
                    x = block_cls(
                        config=cfg, dim=dim, num_heads=cfg.num_heads[lvl],
                        resolution=res, shifted=((depth - 1 - j) % 2 == 1),
                        drop_path=dpr[lo + j], dtype=self.dtype,
                        name=f"stage_{lvl}_block_{j}",
                    )(x, time, deterministic)
            self.sow("intermediates", "hidden_states", x)
            if lvl > 0:
                x = PatchUnmerging(
                    dim=dim, input_resolution=res,
                    use_conditioning=cfg.use_conditioning,
                    eps=cfg.layer_norm_eps, dtype=self.dtype,
                    initializer_range=cfg.initializer_range,
                    name=f"upsample_{lvl}",
                )(x, time)
        return x


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class ScOT(nn.Module):
    """U-Net-shaped scOT operator.

    Call signature: ``model.apply(vars, pixel_values, time)`` with
    ``pixel_values`` in NCHW (B, C_in, H, W) — the reference's data layout —
    and ``time`` of shape (B,). Returns the NCHW prediction
    (B, C_out, H, W). Internally everything is NHWC/(B, L, C).
    """

    config: ScOTConfig
    dtype: Dtype = jnp.float32
    use_mask_token: bool = False
    # Rematerialize transformer blocks in the backward pass (gradient
    # checkpointing) — trades ~30% extra FLOPs for a large activation-memory
    # saving (notably the fp32 attention probabilities).
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        pixel_values: jax.Array,
        time: Optional[jax.Array] = None,
        bool_masked_pos: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        b = pixel_values.shape[0]
        if time is None:
            time = jnp.zeros((b,), jnp.float32)

        # Spectral resample to the native training resolution if needed
        # (static branch: shapes are compile-time constants).
        in_size = pixel_values.shape[-2]
        x = pixel_values
        if in_size != cfg.image_size:
            x = (fft_upsample if in_size < cfg.image_size else fft_downsample)(x, cfg.image_size)

        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NCHW -> NHWC

        # --- embeddings -----------------------------------------------------
        tokens = PatchEmbed(
            patch_size=cfg.patch_size, embed_dim=cfg.embed_dim, dtype=self.dtype,
            initializer_range=cfg.initializer_range, name="embeddings",
        )(x)
        tokens = make_norm(
            cfg.use_conditioning, cfg.embed_dim, eps=1e-5, dtype=self.dtype,
            initializer_range=cfg.initializer_range, name="embed_norm",
        )(tokens, time)
        if self.use_mask_token:
            mask_token = self.param("mask_token", nn.initializers.zeros,
                                    (1, 1, cfg.embed_dim), jnp.float32)
            if bool_masked_pos is not None:
                m = bool_masked_pos[..., None].astype(tokens.dtype)
                tokens = tokens * (1.0 - m) + mask_token.astype(tokens.dtype) * m
        if cfg.use_absolute_embeddings:
            pos = self.param("position_embeddings", nn.initializers.zeros,
                             (1, cfg.grid_size * cfg.grid_size, cfg.embed_dim),
                             jnp.float32)
            tokens = tokens + pos.astype(tokens.dtype)
        if cfg.hidden_dropout_prob > 0.0 and not deterministic:
            tokens = nn.Dropout(cfg.hidden_dropout_prob)(tokens, deterministic=False)

        # --- encoder --------------------------------------------------------
        skips = Encoder(config=cfg, dtype=self.dtype, remat=self.remat,
                        name="encoder")(tokens, time, deterministic)

        # --- residual skip blocks ------------------------------------------
        block_cls = ConvNeXtBlock if cfg.residual_model == "convnext" else ResNetBlock
        processed = []
        for i, skip in enumerate(skips):
            h = skip
            for j in range(cfg.skip_connections[i]):
                kw = dict(dim=cfg.stage_dim(i), dtype=self.dtype,
                          initializer_range=cfg.initializer_range,
                          name=f"residual_{i}_{j}")
                if block_cls is ConvNeXtBlock:
                    kw.update(use_conditioning=cfg.use_conditioning,
                              eps=cfg.layer_norm_eps)
                h = block_cls(**kw)(h, time, deterministic)
            processed.append(h)

        # --- decoder + recovery --------------------------------------------
        decoded = Decoder(config=cfg, dtype=self.dtype, remat=self.remat,
                          name="decoder")(processed[-1], processed[:-1], time,
                                          deterministic)
        pred = PatchRecovery(
            patch_size=cfg.patch_size, num_out_channels=cfg.num_out_channels,
            grid_size=cfg.grid_size, dtype=self.dtype,
            initializer_range=cfg.initializer_range, name="patch_recovery",
        )(decoded)

        pred = jnp.transpose(pred, (0, 3, 1, 2)).astype(jnp.float32)  # NHWC -> NCHW

        if cfg.learn_residual:
            res_in = pixel_values[:, : cfg.num_out_channels]
            if in_size != cfg.image_size:
                res_in = (fft_upsample if in_size < cfg.image_size
                          else fft_downsample)(res_in, cfg.image_size)
            pred = pred + res_in

        if in_size != cfg.image_size:
            pred = (fft_upsample if in_size > cfg.image_size else fft_downsample)(pred, in_size)
        return pred


def forward_with_intermediates(model, variables, pixel_values, time=None,
                               **apply_kwargs):
    """Reference ``output_hidden_states`` / ``output_attentions`` API surface
    (``ScOTOutput`` at /root/reference/scOT/model.py:57-63, forward flags at
    model.py:1318-1358), functional style.

    Returns ``(prediction, hidden_states, attentions)`` where
    ``hidden_states`` are the per-stage token maps (encoder pre-downsample
    skips, then decoder stage outputs, deepest first) and ``attentions`` the
    per-layer softmax probabilities (N*nW, heads, T, T), in execution order
    (decoder stages run deepest-first, so decoder attention leaves are
    ordered by DESCENDING stage index).

    Works from ANY config: the production fast path (``attention_impl=
    "pallas"`` — the fused kernel never materializes probabilities — and/or
    ``scan_blocks=True`` — nn.scan drops intermediates sown inside the
    scanned pairs) is transparently retraced with an inspection twin
    (``attention_impl="xla"``, ``scan_blocks=False``); scanned params are
    layout-bridged via :func:`poseidon_tpu.hub.unroll_scanned_params`. The
    retrace compiles a separate graph — this is an inspection surface, not a
    training path.
    """
    cfg = model.config
    if cfg.scan_blocks or cfg.attention_impl != "xla":
        insp_cfg = cfg.replace(scan_blocks=False, attention_impl="xla")
        insp_model = type(model)(config=insp_cfg, dtype=model.dtype,
                                 use_mask_token=model.use_mask_token,
                                 remat=model.remat)
        new_vars = dict(variables)
        if cfg.scan_blocks:
            from ..hub import unroll_scanned_params

            new_vars["params"] = unroll_scanned_params(
                variables["params"], cfg)
        return forward_with_intermediates(insp_model, new_vars, pixel_values,
                                          time, **apply_kwargs)
    import re

    pred, inter = model.apply(variables, pixel_values, time,
                              mutable=["intermediates"], **apply_kwargs)
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]

    def _sort_key(keys):
        # encoder stages first (ascending), then decoder in EXECUTION order:
        # deepest stage first (Decoder runs stage N-1 .. 0), blocks ascending.
        # Numeric segments compare as numbers so block_10 sorts after block_9
        # (a lexical tiebreak would misorder stages of depth >= 11).
        section = 0 if keys[0] == "encoder" else 1
        path = "/".join(keys)
        m = re.search(r"stage_(\d+)", path)
        stage = int(m.group(1)) if m else -1
        stage_order = stage if section == 0 else -stage
        natural = tuple(int(p) if p.isdigit() else p
                        for p in re.split(r"(\d+)", path))
        return (section, stage_order, natural)

    def _collect(leaf_name):
        out = []
        for path, value in flat:
            keys = [str(getattr(k, "key", k)) for k in path]
            if leaf_name in keys:
                out.append((_sort_key(keys), value))
        return [v for _, v in sorted(out, key=lambda kv: kv[0])]

    return pred, _collect("hidden_states"), _collect("attention_probs")


# ---------------------------------------------------------------------------
# Loss / mask utilities (reference model.py:1422-1484)
# ---------------------------------------------------------------------------

def apply_pixel_mask(prediction: jax.Array, labels: jax.Array,
                     pixel_mask: Optional[jax.Array]) -> jax.Array:
    """Overwrite masked entries of the prediction with the labels. The mask is
    either per-channel (B, C) or per-pixel (B, C, H, W)."""
    if pixel_mask is None:
        return prediction
    mask = pixel_mask
    if mask.ndim == 2:
        mask = mask[:, :, None, None]
    return jnp.where(mask, labels.astype(prediction.dtype), prediction)


def scot_loss(prediction: jax.Array, labels: jax.Array, config: ScOTConfig,
              sample_weights: Optional[jax.Array] = None) -> jax.Array:
    """L1/L2 loss, optionally per-channel-group normalized: mean over groups of
    ``loss(pred_g, label_g) / (loss(label_g, 0) + 1e-10)``.

    ``sample_weights`` (B,) masks samples out of every mean (numerator AND
    normalization denominator) — used to exclude loader padding from eval loss
    so padded batches match the unpadded computation exactly."""
    if sample_weights is None:
        _mean = jnp.mean
    else:
        w = sample_weights.astype(jnp.float32)

        def _mean(x):
            wb = w.reshape((-1,) + (1,) * (x.ndim - 1))
            denom = jnp.sum(w) * float(np.prod(x.shape[1:]))
            return jnp.sum(x.astype(jnp.float32) * wb) / jnp.maximum(denom, 1e-10)

    if config.p == 1:
        loss_fn = lambda a, b: _mean(jnp.abs(a - b))
    else:
        loss_fn = lambda a, b: _mean((a - b) ** 2)
    slices = config.channel_slice_list_normalized_loss
    if slices is None:
        return loss_fn(prediction, labels)
    terms = []
    for i in range(len(slices) - 1):
        p_g = prediction[:, slices[i]:slices[i + 1]]
        l_g = labels[:, slices[i]:slices[i + 1]]
        terms.append(loss_fn(p_g, l_g) / (loss_fn(l_g, jnp.zeros_like(l_g)) + 1e-10))
    return jnp.mean(jnp.stack(terms))


def forward_with_loss(
    model: ScOT,
    variables,
    pixel_values: jax.Array,
    time: Optional[jax.Array],
    labels: jax.Array,
    pixel_mask: Optional[jax.Array] = None,
    deterministic: bool = True,
    rngs=None,
    mutable=False,
):
    """Forward pass + masked prediction + loss, mirroring ``ScOT.forward`` when
    labels are supplied. Returns ((loss, prediction)[, new_mutables])."""
    out = model.apply(
        variables, pixel_values, time, deterministic=deterministic,
        rngs=rngs, mutable=mutable if mutable else False,
    )
    if mutable:
        pred, new_vars = out
    else:
        pred, new_vars = out, None
    pred = apply_pixel_mask(pred, labels, pixel_mask)
    loss = scot_loss(pred, labels, model.config)
    if mutable:
        return (loss, pred), new_vars
    return loss, pred

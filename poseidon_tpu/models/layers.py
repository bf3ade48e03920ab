"""Building-block layers for the TPU-native scOT.

Everything operates on token tensors ``(B, L, C)`` or NHWC images — the
TPU-friendly layout where the channel dim is innermost (lane dim). Patch
embedding/recovery are expressed as reshape+matmul instead of conv/conv-transpose
so all the FLOPs land on the MXU as plain GEMMs.

Behavioral references (not ported code) into /root/reference/scOT/model.py:
ConditionalLayerNorm (143-160), ConvNeXtBlock (163-217), ResNetBlock (220-246),
ScOTPatchEmbeddings (249-310), ScOTEmbeddings (313-366), ScOTPatchRecovery
(584-647), ScOTPatchMerging (650-712), ScOTPatchUnmerging (715-760).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def gelu_exact(x):
    """Exact (erf) GELU — torch's nn.GELU default, which the reference uses via
    HF ACT2FN['gelu']. NOTE: jax.nn.gelu defaults to the tanh approximation, so
    approximate=False is load-bearing for checkpoint parity."""
    return jax.nn.gelu(x, approximate=False)


def normal_init(std: float) -> Callable:
    return nn.initializers.normal(stddev=std)


class DropPath(nn.Module):
    """Per-sample stochastic depth, scaled by 1/keep_prob (Swinv2DropPath)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class ConditionalLayerNorm(nn.Module):
    """Lead-time-conditioned LayerNorm.

    Normalizes over the last dim with no learned affine (biased variance,
    eps inside the sqrt — matching reference model.py:150-153), then applies a
    scale and shift that are affine functions of the scalar lead time:
    ``y = W_s(t) * x_hat + W_b(t)``. This is Poseidon's only time-conditioning
    mechanism. Parameter submodules are named ``cond_scale``/``cond_shift`` so
    the optimizer's time-embedding param group can select them by path.
    """

    dim: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02
    # Feature (channel) axis (reductions stay fp32 regardless of layout).
    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array]) -> jax.Array:
        orig_dtype = x.dtype
        ax = self.axis % x.ndim
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=ax, keepdims=True)
        # E[x^2] - mean^2 like the reference (model.py:151-152), but clamped:
        # the cancellation can go slightly negative for near-constant features,
        # and rsqrt(negative) would NaN.
        var = jnp.maximum(jnp.mean(xf * xf, axis=ax, keepdims=True) - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)

        t = time.reshape(-1, 1).astype(jnp.float32)
        init = normal_init(self.initializer_range)
        scale = nn.Dense(self.dim, name="cond_scale", kernel_init=init,
                         bias_init=nn.initializers.zeros, dtype=jnp.float32)(t)
        shift = nn.Dense(self.dim, name="cond_shift", kernel_init=init,
                         bias_init=nn.initializers.zeros, dtype=jnp.float32)(t)
        # Broadcast (B, C) over the non-feature dims ((B, L, C), (B, H, W, C)
        # or D-major (B, C, L)).
        bshape = [1] * x.ndim
        bshape[0] = x.shape[0]
        bshape[ax] = self.dim
        y = scale.reshape(bshape) * y + shift.reshape(bshape)
        return y.astype(orig_dtype)


class CLNParams(nn.Module):
    """Parameter holder for a ConditionalLayerNorm whose math runs inside a
    fused Pallas kernel (ops/mlp.py fused_mlp_cln). Creates the identical
    ``cond_scale``/``cond_shift`` Dense fragments (kernel (1, C), bias (C,))
    so the checkpoint tree and the optimizer's time-embedding param group
    are unchanged whichever path executes."""

    dim: int
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self):
        from .attention import _ProjParams

        ws = _ProjParams(1, self.dim, True, self.initializer_range,
                         name="cond_scale")()
        wb = _ProjParams(1, self.dim, True, self.initializer_range,
                         name="cond_shift")()
        return ws[0], ws[1], wb[0], wb[1]


class PlainLayerNorm(nn.Module):
    """Standard LayerNorm with the uniform ``(x, time)`` call signature."""

    dim: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02  # unused; kept for signature uniformity
    axis: int = -1  # feature axis (see ConditionalLayerNorm.axis)

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array]) -> jax.Array:
        del time
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            reduction_axes=self.axis,
                            feature_axes=self.axis)(x)


def make_norm(use_conditioning: bool, dim: int, eps: float, dtype: Dtype,
              initializer_range: float, name: str, axis: int = -1):
    cls = ConditionalLayerNorm if use_conditioning else PlainLayerNorm
    return cls(dim=dim, eps=eps, dtype=dtype, initializer_range=initializer_range,
               name=name, axis=axis)


class PatchEmbed(nn.Module):
    """Patchify + linear projection, as a reshape+GEMM (MXU-native).

    Equivalent to the reference's Conv2d(kernel=stride=patch) patchify
    (model.py:282-284): token (i, j) is the flattened (p, p, C_in) patch — in
    (dy, dx, c) order — matmul'd to ``embed_dim``. The HF-hub bridge re-lays
    the torch conv kernel (O, I, p, p) into this (p*p*I, O) matrix.
    """

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C) -> (B, L, E)
        b, h, w, c = x.shape
        p = self.patch_size
        if h % p or w % p:
            x = jnp.pad(x, ((0, 0), (0, -h % p), (0, -w % p), (0, 0)))
            h, w = x.shape[1], x.shape[2]
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
        x = x.reshape(b, gh * gw, p * p * c)
        return nn.Dense(
            self.embed_dim,
            name="projection",
            dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
            bias_init=nn.initializers.zeros,
        )(x)


class PatchRecovery(nn.Module):
    """Inverse of PatchEmbed (Pangu-Weather style, reference model.py:584-647):
    per-token linear to a (p, p, C_out) block (== ConvTranspose with
    kernel=stride=patch), un-patchify, then a bias-free 5x5 mixup conv."""

    patch_size: int
    num_out_channels: int
    grid_size: int
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, L, E) -> (B, H, W, C_out)
        b, l, _ = x.shape
        p, co, g = self.patch_size, self.num_out_channels, self.grid_size
        x = nn.Dense(
            p * p * co,
            use_bias=False,
            name="projection",
            dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
        )(x)
        # Per-channel bias (kept (C_out,)-shaped, like the reference's
        # ConvTranspose bias, so param counts match exactly).
        bias = self.param("projection_bias", nn.initializers.zeros, (co,), jnp.float32)
        x = x.reshape(b, g, g, p, p, co) + bias.astype(x.dtype)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, g, p, g, p, C)
        x = x.reshape(b, g * p, g * p, co)
        return nn.Conv(
            co,
            kernel_size=(5, 5),
            padding="SAME",
            use_bias=False,
            name="mixup",
            dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
        )(x)


class PatchMerging(nn.Module):
    """2x downsample: interleave-gather 4 neighbors -> Linear(4C -> 2C, no
    bias) -> norm. Reduction BEFORE norm (SwinV2 order, reference
    model.py:709-710)."""

    dim: int
    input_resolution: int
    use_conditioning: bool
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array]) -> jax.Array:
        b, l, c = x.shape
        h = w = self.input_resolution
        x = x.reshape(b, h, w, c)
        # Quadrant gather order matches the reference (model.py:694-707):
        # (even, even), (odd, even), (even, odd), (odd, odd).
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.Dense(
            2 * c, use_bias=False, name="reduction", dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
        )(x)
        return make_norm(self.use_conditioning, 2 * c, self.eps, self.dtype,
                         self.initializer_range, "norm")(x, time)


class PatchUnmerging(nn.Module):
    """2x upsample: Linear(C -> 2C, no bias) -> pixel-shuffle to (2H, 2W, C/2)
    -> norm -> bias-free Linear(C/2 -> C/2) mixup (reference model.py:715-760)."""

    dim: int
    input_resolution: int
    use_conditioning: bool
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array]) -> jax.Array:
        b, l, c = x.shape
        h = w = self.input_resolution
        x = nn.Dense(
            2 * c, use_bias=False, name="expand", dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
        )(x)
        # (B, h, w, 2, 2, C/2) -> interleave the 2x2 subpixel grid.
        x = x.reshape(b, h, w, 2, 2, c // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, (2 * h) * (2 * w), c // 2)
        x = make_norm(self.use_conditioning, c // 2, self.eps, self.dtype,
                      self.initializer_range, "norm")(x, time)
        return nn.Dense(
            c // 2, use_bias=False, name="mixup", dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
        )(x)


class ConvNeXtBlock(nn.Module):
    """Residual skip-processing block (reference model.py:163-217): 7x7
    depthwise conv -> (conditional) LayerNorm -> Linear(C -> 4C) -> GELU ->
    Linear(4C -> C) -> layer-scale (init 1e-6) -> residual. Operates on square
    token maps (B, L, C)."""

    dim: int
    use_conditioning: bool
    eps: float = 1e-5
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array],
                 deterministic: bool = True) -> jax.Array:
        b, l, c = x.shape
        side = int(l**0.5)
        residual = x
        h = x.reshape(b, side, side, c)
        h = nn.Conv(
            c, kernel_size=(7, 7), padding="SAME", feature_group_count=c,
            name="dwconv", dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
            bias_init=nn.initializers.zeros,
        )(h)
        h = make_norm(self.use_conditioning, c, self.eps, self.dtype,
                      self.initializer_range, "norm")(h, time)
        h = nn.Dense(4 * c, name="pwconv1", dtype=self.dtype,
                     kernel_init=normal_init(self.initializer_range),
                     bias_init=nn.initializers.zeros)(h)
        h = gelu_exact(h)
        h = nn.Dense(c, name="pwconv2", dtype=self.dtype,
                     kernel_init=normal_init(self.initializer_range),
                     bias_init=nn.initializers.zeros)(h)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "layer_scale",
                nn.initializers.constant(self.layer_scale_init_value),
                (c,), jnp.float32,
            )
            h = h * gamma.astype(h.dtype)
        h = h.reshape(b, l, c)
        return residual + DropPath(self.drop_path)(h, deterministic)


class ResNetBlock(nn.Module):
    """Alternative residual skip block (reference model.py:220-246): two 3x3
    convs with BatchNorm + leaky-ReLU, residual add. Uses a mutable
    ``batch_stats`` collection like any flax BatchNorm."""

    dim: int
    dtype: Dtype = jnp.float32
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array],
                 deterministic: bool = True) -> jax.Array:
        del time
        b, l, c = x.shape
        side = int(l**0.5)
        residual = x
        h = x.reshape(b, side, side, c)
        conv_kw = dict(
            kernel_size=(3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=normal_init(self.initializer_range),
            bias_init=nn.initializers.zeros,
        )
        h = nn.Conv(c, name="conv1", **conv_kw)(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=self.dtype)(h)
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Conv(c, name="conv2", **conv_kw)(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bn2", dtype=self.dtype)(h)
        return residual + h.reshape(b, l, c)

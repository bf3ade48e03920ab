"""D-major residual stream (config.dmajor_stream) equivalence.

The dm stream changes ONLY layout (window partition, attention I/O, norms,
MLP, residual adds run on (B, C, L) instead of (B, L, C)); the math and the
param tree are identical. Verified: same init tree, same forward, same
gradients as the token-major pallas path (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseidon_tpu import ScOT, make_config


def _cfg(**over):
    kw = dict(image_size=64, patch_size=4, num_channels=3, num_out_channels=2,
              embed_dim=16, depths=(2, 2), num_heads=(2, 2),
              skip_connections=(1, 0), window_size=4, mlp_ratio=2.0,
              channel_slice_list=(0, 1, 2), use_conditioning=True,
              attention_impl="pallas", score_dtype="float32")
    kw.update(over)
    return make_config("T", **kw)


def _inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 64, 64)), jnp.float32)
    t = jnp.asarray([0.3, 0.9])
    return x, t


class TestDMajorStream:
    def test_stage_dm_selection(self):
        from poseidon_tpu.models.scot import _stage_dm

        cfg = _cfg(dmajor_stream=True)
        # stage 0: res 16, L=256 (lane-aligned) -> dm; stage 1: res 8, L=64 -> not.
        assert _stage_dm(cfg, cfg.stage_resolution(0))
        assert not _stage_dm(cfg, cfg.stage_resolution(1))
        # flagship geometry: stages 0-1 dm, 2-3 token-major.
        big = make_config("B", image_size=128, num_channels=4,
                          num_out_channels=4, channel_slice_list=(0, 1, 3, 4),
                          use_conditioning=True, attention_impl="pallas",
                          dmajor_stream=True)
        assert [_stage_dm(big, big.stage_resolution(i)) for i in range(4)] == \
            [True, True, False, False]
        # knob off / xla impl -> never dm.
        assert not _stage_dm(_cfg(), 16)
        assert not _stage_dm(_cfg(attention_impl="xla", dmajor_stream=True), 16)

    def test_forward_and_grad_equivalence(self):
        x, t = _inputs()
        m_tok = ScOT(config=_cfg())
        m_dm = ScOT(config=_cfg(dmajor_stream=True))
        v = m_tok.init(jax.random.PRNGKey(0), x, t)
        # identical param tree (the dm path must not change a single name)
        v_dm = m_dm.init(jax.random.PRNGKey(0), x, t)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_dm)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v_dm)):
            assert a.shape == b.shape

        p_tok = m_tok.apply(v, x, t)
        p_dm = m_dm.apply(v, x, t)
        np.testing.assert_allclose(np.asarray(p_dm), np.asarray(p_tok),
                                   atol=1e-5, rtol=1e-5)

        def loss(m):
            def f(params):
                pred = m.apply({"params": params}, x, t)
                return jnp.sum(pred ** 2)
            return f

        g_tok = jax.grad(loss(m_tok))(v["params"])
        g_dm = jax.grad(loss(m_dm))(v["params"])
        flat_tok = jax.tree_util.tree_leaves_with_path(g_tok)
        flat_dm = jax.tree.leaves(g_dm)
        for (path, a), b in zip(flat_tok, flat_dm):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3,
                err_msg=jax.tree_util.keystr(path))

    def test_scanned_dm_forward(self):
        x, t = _inputs()
        m_tok = ScOT(config=_cfg(scan_blocks=True))
        m_dm = ScOT(config=_cfg(scan_blocks=True, dmajor_stream=True))
        v = m_tok.init(jax.random.PRNGKey(0), x, t)
        np.testing.assert_allclose(np.asarray(m_dm.apply(v, x, t)),
                                   np.asarray(m_tok.apply(v, x, t)),
                                   atol=1e-5, rtol=1e-5)

    def test_fused_tail_dm(self):
        x, t = _inputs()
        m_tok = ScOT(config=_cfg(fused_block_tail=True))
        m_dm = ScOT(config=_cfg(fused_block_tail=True, dmajor_stream=True))
        v = m_tok.init(jax.random.PRNGKey(0), x, t)
        np.testing.assert_allclose(np.asarray(m_dm.apply(v, x, t)),
                                   np.asarray(m_tok.apply(v, x, t)),
                                   atol=1e-5, rtol=1e-5)

"""Fused attention-side block tail (ops/mlp.py fused_proj_cln_dm):
proj + ConditionalLayerNorm + residual in one D-major kernel.

Verified against the unfused composition at the kernel level (values and all
six gradients) and at the model level (config.fused_attn_tail=True vs False:
identical param tree, same forward, same gradients) on both the token-major
and the D-major residual streams. CPU interpret mode (conftest forces cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np

from poseidon_tpu import ScOT, make_config
from poseidon_tpu.ops import mlp as mlp_op


class TestFusedProjCLNKernel:
    @staticmethod
    def _ref(a_dm, sc_dm, w, bp, scale, shift, eps=1e-5):
        """Unfused composition on D-major (B, C, L) operands, mirroring the
        module's rounding: bf16-rounded GEMM + bias, fp32 CLN, residual."""
        o = jnp.einsum("ncl,co->nol", a_dm, w).astype(a_dm.dtype) \
            + bp.astype(a_dm.dtype)[:, None]
        of = o.astype(jnp.float32)
        mu = jnp.mean(of, axis=1, keepdims=True)
        var = jnp.maximum(jnp.mean(of * of, axis=1, keepdims=True) - mu * mu,
                          0.0)
        y = (of - mu) * jax.lax.rsqrt(var + eps)
        y = scale[:, :, None] * y + shift[:, :, None]
        return sc_dm + y.astype(a_dm.dtype)

    def _args(self, seed=0, dtype=jnp.float32):
        b, c, l = 3, 32, 128
        ks = jax.random.split(jax.random.PRNGKey(seed), 6)
        a = (jax.random.normal(ks[0], (b, c, l), jnp.float32)).astype(dtype)
        sc = (jax.random.normal(ks[1], (b, c, l), jnp.float32)).astype(dtype)
        w = (jax.random.normal(ks[2], (c, c), jnp.float32) * 0.05).astype(dtype)
        bp = jax.random.normal(ks[3], (c,), jnp.float32) * 0.02
        scale = jax.random.normal(ks[4], (b, c), jnp.float32) * 0.5
        shift = jax.random.normal(ks[5], (b, c), jnp.float32) * 0.1
        return a, sc, w, bp, scale, shift

    def test_forward_matches_unfused(self):
        args = self._args()
        out = mlp_op.fused_proj_cln_dm(*args)
        np.testing.assert_allclose(out, self._ref(*args), atol=2e-5, rtol=1e-4)

    def test_forward_bf16(self):
        args = self._args(seed=3, dtype=jnp.bfloat16)
        out = mlp_op.fused_proj_cln_dm(*args)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(self._ref(*args), np.float32),
                                   atol=5e-2, rtol=5e-2)

    def test_gradients_match_unfused(self):
        args = self._args(seed=5)

        def lf(*a):
            return jnp.sum(jnp.sin(mlp_op.fused_proj_cln_dm(*a)))

        def lr(*a):
            return jnp.sum(jnp.sin(self._ref(*a)))

        g = jax.grad(lf, argnums=tuple(range(6)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(6)))(*args)
        names = ["da", "dshortcut", "dw", "dbp", "dscale", "dshift"]
        for a, b, name in zip(g, gr, names):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-3,
                                       err_msg=name)

    def test_token_major_wrapper(self):
        a, sc, w, bp, scale, shift = self._args(seed=7)
        out = mlp_op.fused_proj_cln(a, jnp.swapaxes(sc, 1, 2), w, bp,
                                    scale, shift)
        np.testing.assert_allclose(jnp.swapaxes(out, 1, 2),
                                   self._ref(a, sc, w, bp, scale, shift),
                                   atol=2e-5, rtol=1e-4)

    def test_eligibility_gate(self):
        # lane-misaligned L -> ineligible; aligned small -> eligible.
        assert not mlp_op.proj_cln_eligible(2, 100, 32, 4)
        assert mlp_op.proj_cln_eligible(2, 128, 32, 4)


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


class TestFusedAttnTailModel:
    """config.fused_attn_tail=True vs False must be numerically equivalent
    with an identical param tree (reference behavior: model.py:563-574 post-
    norm residual around HF Swinv2SelfOutput)."""

    def _equiv(self, over_base, over_fused):
        x, t = _inputs()
        m_ref = ScOT(config=_cfg(**over_base))
        m_fused = ScOT(config=_cfg(**over_fused))
        v = m_ref.init(jax.random.PRNGKey(0), x, t)
        v_f = m_fused.init(jax.random.PRNGKey(0), x, t)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v_f))

        p_ref = m_ref.apply(v, x, t)
        p_fused = m_fused.apply(v, x, t)
        np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                                   atol=1e-5, rtol=1e-5)

        def loss(m):
            def f(params):
                pred = m.apply({"params": params}, x, t)
                return jnp.sum(pred ** 2)
            return f

        g_ref = jax.grad(loss(m_ref))(v["params"])
        g_fused = jax.grad(loss(m_fused))(v["params"])
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                                jax.tree.leaves(g_fused)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-4, rtol=2e-3,
                err_msg=jax.tree_util.keystr(path))

    def test_token_major(self):
        self._equiv({}, {"fused_attn_tail": True})

    def test_dmajor_stream(self):
        self._equiv({"dmajor_stream": True},
                    {"dmajor_stream": True, "fused_attn_tail": True})

    def test_with_fused_mlp_tail(self):
        # Both tails fused at once — the whole lane-aligned block body runs
        # in Pallas kernels.
        self._equiv({}, {"fused_attn_tail": True, "fused_block_tail": True})

    def test_unconditioned_falls_back(self):
        # No conditioning -> no CLN -> the defer gate must stay off and the
        # model must still run.
        x, t = _inputs()
        cfg = _cfg(use_conditioning=False, fused_attn_tail=True)
        m = ScOT(config=cfg)
        v = m.init(jax.random.PRNGKey(0), x, t)
        out = m.apply(v, x, t)
        assert np.isfinite(np.asarray(out)).all()

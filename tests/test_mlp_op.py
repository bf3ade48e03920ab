"""Unit tests for the fused MLP Pallas op (ops/mlp.py) — values and
gradients against the plain XLA composition, both backward variants, and the
row-padding path. CPU interpret mode (conftest forces cpu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poseidon_tpu.ops import mlp as mlp_op


def _ref_mlp(x, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w1 + b1.astype(x.dtype), approximate=False)
    return h @ w2 + b2.astype(x.dtype)


def _rand(key, shape, dtype=jnp.float32, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _make(m, c, f, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = _rand(ks[0], (m, c), dtype)
    w1 = _rand(ks[1], (c, f), dtype, 0.05)
    b1 = _rand(ks[2], (f,), jnp.float32, 0.02)
    w2 = _rand(ks[3], (f, c), dtype, 0.05)
    b2 = _rand(ks[4], (c,), jnp.float32, 0.02)
    return x, w1, b1, w2, b2


@pytest.fixture
def always_kernel(monkeypatch):
    """Small test geometries would fall back to XLA via the win-threshold
    gate; force the kernel path so it is what gets exercised."""
    monkeypatch.setenv("POSEIDON_MLP_MIN_TILE", "8")


@pytest.mark.parametrize("m,c", [(256, 96), (96, 32)])
def test_forward_matches_xla(m, c, always_kernel):
    args = _make(m, c, 4 * c)
    out = mlp_op.fused_mlp(*args)
    ref = _ref_mlp(*args)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_forward_padding_rows(always_kernel):
    # M=100 not a multiple of any tile: pad path must slice cleanly.
    args = _make(100, 32, 128)
    out = mlp_op.fused_mlp(*args)
    np.testing.assert_allclose(out, _ref_mlp(*args), atol=1e-5, rtol=1e-5)


def test_forward_leading_shape():
    x, w1, b1, w2, b2 = _make(8 * 64, 32, 128)
    x3 = x.reshape(8, 64, 32)
    out = mlp_op.fused_mlp(x3, w1, b1, w2, b2)
    assert out.shape == (8, 64, 32)
    np.testing.assert_allclose(out.reshape(-1, 32),
                               _ref_mlp(x, w1, b1, w2, b2),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["fused", "emit"])
def test_gradients_match_xla(variant, monkeypatch):
    m, c, f = 160, 32, 128  # M=160: exercises padded rows in the backward
    monkeypatch.setenv("POSEIDON_MLP_MIN_TILE", "8")
    if variant == "fused":
        monkeypatch.setattr(mlp_op, "_pick_tile", lambda *a: (64, True))
    else:
        monkeypatch.setattr(mlp_op, "_pick_tile", lambda *a: (64, False))
    args = _make(m, c, f)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(mlp_op.fused_mlp(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_ref_mlp(*a)))

    g = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3,
                                   err_msg=name)


def test_bf16_forward_close(always_kernel):
    args = _make(256, 96, 384, dtype=jnp.bfloat16)
    out = mlp_op.fused_mlp(*args).astype(jnp.float32)
    ref = _ref_mlp(*args).astype(jnp.float32)
    # The kernel keeps u in f32 (XLA rounds it to bf16), so tolerances are
    # bf16-scale, not exact.
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_variant_selection_geometry():
    # ScOT-B stage geometries at batch 96: stages 0-1 must take the fused-dw
    # variant, stages 2-3 the emit variant (dw too big for resident VMEM).
    mt0, fused0 = mlp_op._pick_tile(98304, 96, 384, 2)
    mt1, fused1 = mlp_op._pick_tile(24576, 192, 768, 2)
    _, fused3 = mlp_op._pick_tile(1536, 768, 3072, 2)
    assert fused0 and fused1
    assert mt0 >= 256 and mt1 >= 256
    assert not fused3


class TestDMajor:
    """D-major (B, C, L) kernel variant — routed automatically for 3-D
    inputs with lane-aligned L."""

    def test_forward_matches_xla(self):
        x, w1, b1, w2, b2 = _make(4 * 128, 32, 128)
        x3 = x.reshape(4, 128, 32)
        out = mlp_op.fused_mlp(x3, w1, b1, w2, b2)
        np.testing.assert_allclose(out.reshape(-1, 32),
                                   _ref_mlp(x, w1, b1, w2, b2),
                                   atol=1e-5, rtol=1e-5)

    def test_routing_picks_dm(self, monkeypatch):
        called = {}
        orig = mlp_op._call_fwd_dm

        def spy(*a):
            called["dm"] = True
            return orig(*a)

        monkeypatch.setattr(mlp_op, "_call_fwd_dm", spy)
        x, w1, b1, w2, b2 = _make(2 * 256, 32, 128)
        out = mlp_op.fused_mlp(x.reshape(2, 256, 32), w1, b1, w2, b2)
        assert out.shape == (2, 256, 32)
        assert called.get("dm"), "3-D lane-aligned input must route D-major"

    def test_gradients_match_xla(self):
        x, w1, b1, w2, b2 = _make(4 * 128, 32, 128, seed=3)
        x3 = x.reshape(4, 128, 32)

        def loss_fused(x3, w1, b1, w2, b2):
            return jnp.sum(jnp.sin(mlp_op.fused_mlp(x3, w1, b1, w2, b2)))

        def loss_ref(x3, w1, b1, w2, b2):
            return jnp.sum(jnp.sin(_ref_mlp(x3.reshape(-1, 32), w1, b1,
                                            w2, b2)))

        g = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x3, w1, b1, w2, b2)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x3, w1, b1, w2, b2)
        gr = (gr[0].reshape(4, 128, 32),) + gr[1:]
        for a, b, name in zip(g, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3,
                                       err_msg=name)


class TestFusedCLNTail:
    """fused_mlp_cln — MLP + conditional layernorm + residual in one kernel
    — against the unfused composition."""

    @staticmethod
    def _ref_tail(x3, w1, b1, w2, b2, scale, shift, eps=1e-5):
        o = _ref_mlp(x3, w1, b1, w2, b2)
        of = o.astype(jnp.float32)
        mu = jnp.mean(of, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(of * of, axis=-1, keepdims=True)
                          - mu * mu, 0.0)
        y = (of - mu) * jax.lax.rsqrt(var + eps)
        y = scale[:, None, :] * y + shift[:, None, :]
        return x3 + y.astype(x3.dtype)

    def _args(self, seed=0):
        b, l, c, f = 3, 128, 32, 128
        x, w1, b1, w2, b2 = _make(b * l, c, f, seed=seed)
        ks = jax.random.split(jax.random.PRNGKey(seed + 99), 2)
        scale = jax.random.normal(ks[0], (b, c), jnp.float32) * 0.5
        shift = jax.random.normal(ks[1], (b, c), jnp.float32) * 0.1
        return x.reshape(b, l, c), w1, b1, w2, b2, scale, shift

    def test_forward_matches_unfused(self):
        args = self._args()
        out = mlp_op.fused_mlp_cln(*args)
        np.testing.assert_allclose(out, self._ref_tail(*args),
                                   atol=2e-5, rtol=1e-4)

    def test_gradients_match_unfused(self):
        args = self._args(seed=5)

        def lf(*a):
            return jnp.sum(jnp.sin(mlp_op.fused_mlp_cln(*a)))

        def lr(*a):
            return jnp.sum(jnp.sin(self._ref_tail(*a)))

        g = jax.grad(lf, argnums=tuple(range(7)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
        names = ["dx", "dw1", "db1", "dw2", "db2", "dscale", "dshift"]
        for a, b, name in zip(g, gr, names):
            np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-3,
                                       err_msg=name)

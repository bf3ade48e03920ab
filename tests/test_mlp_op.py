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
    monkeypatch.setattr(mlp_op, "_MIN_WIN_TILE", 8)


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
    monkeypatch.setattr(mlp_op, "_MIN_WIN_TILE", 8)
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

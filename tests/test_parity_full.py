"""Full-size golden parity: random-init PyTorch ScOT-B at 128^2 / window 16
(the flagship pretraining configuration, reference MODEL_MAP "B" at
/root/reference/scOT/train.py:54-62) run through the hub bridge and the Flax
forward, plus an NS-PwC-style relative-L1 comparison through both inference
stacks. Opt-in: ``pytest -m slow`` (minutes of CPU).

Unlike tests/test_parity.py (toy shapes), this exercises the window-16 CPB
table, the 32x32-token shifted-window masks, and the real B-size head counts.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

try:
    from scOT.model import ScOT as TorchScOT, ScOTConfig as TorchScOTConfig
    from scOT.metrics import relative_lp_error as torch_relative_lp_error
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAVE_REF, reason="reference model unavailable"),
]

import jax
import jax.numpy as jnp

from poseidon_tpu import ScOT, make_config
from poseidon_tpu.hub import convert_torch_state_dict
from poseidon_tpu.metrics import relative_lp_error


@pytest.fixture(scope="module")
def b_pair():
    torch.manual_seed(0)
    tcfg = TorchScOTConfig(
        image_size=128, patch_size=4, num_channels=4, num_out_channels=4,
        embed_dim=96, depths=[8, 8, 8, 8], num_heads=[3, 6, 12, 24],
        skip_connections=[2, 2, 2, 0], window_size=16, mlp_ratio=4.0,
        qkv_bias=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        hidden_act="gelu", use_absolute_embeddings=False,
        initializer_range=0.02, layer_norm_eps=1e-5, p=1,
        channel_slice_list_normalized_loss=[0, 1, 3, 4],
        residual_model="convnext", use_conditioning=True,
        learn_residual=False,
    )
    tmodel = TorchScOT(tcfg).eval()
    jcfg = make_config("B", image_size=128, num_channels=4, num_out_channels=4,
                       channel_slice_list=(0, 1, 3, 4), use_conditioning=True)
    jmodel = ScOT(config=jcfg)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_state_dict(sd, jcfg)
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    return tmodel, jmodel, variables


def test_full_size_forward_parity(b_pair):
    tmodel, jmodel, variables = b_pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 128, 128)).astype(np.float32)
    t = np.asarray([0.35, 0.8], np.float32)
    with torch.no_grad():
        tout = tmodel(pixel_values=torch.from_numpy(x),
                      time=torch.from_numpy(t)).output.numpy()
    jout = np.asarray(jmodel.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    assert np.max(np.abs(jout - tout)) <= 1e-4, (
        f"max deviation {np.max(np.abs(jout - tout)):.2e}")


def test_full_size_metric_parity(b_pair):
    """NS-PwC-shaped batch through both inference stacks: predictions from
    each framework fed to each framework's own relative-L1 metric must agree
    (reference scOT/metrics.py:12-35 vs poseidon_tpu/metrics.py)."""
    tmodel, jmodel, variables = b_pair
    rng = np.random.default_rng(1)
    # NS-PwC shape: 4 channels (u, v, rho=const, p=const), 128^2, lead times.
    x = rng.normal(size=(4, 4, 128, 128)).astype(np.float32)
    labels = rng.normal(size=(4, 4, 128, 128)).astype(np.float32)
    t = np.asarray([0.2, 0.4, 0.6, 0.8], np.float32)

    with torch.no_grad():
        tpred = tmodel(pixel_values=torch.from_numpy(x),
                       time=torch.from_numpy(t)).output.numpy()
    jpred = np.asarray(jmodel.apply(variables, jnp.asarray(x), jnp.asarray(t)))

    ref_err = torch_relative_lp_error(tpred, labels, p=1, return_percent=True)
    our_err = relative_lp_error(jpred, labels, p=1, return_percent=True)
    # Median relative L1 through both stacks must match (north-star criterion).
    np.testing.assert_allclose(np.median(our_err), np.median(ref_err),
                               rtol=1e-4)
    np.testing.assert_allclose(our_err, ref_err, rtol=1e-3)
    # And each stack's metric on the SAME predictions is definitionally equal.
    np.testing.assert_allclose(
        relative_lp_error(tpred, labels, p=1, return_percent=True),
        torch_relative_lp_error(tpred, labels, p=1, return_percent=True),
        rtol=1e-6)


def test_full_size_pallas_matches_xla(b_pair):
    """The fused D-major Pallas attention (interpret mode on CPU — the same
    code path that compiles on TPU) must match the XLA path at full ScOT-B
    scale, covering window-16 tiles and the packed T=64/16 stages."""
    _, jmodel, variables = b_pair
    cfg_p = jmodel.config.replace(attention_impl="pallas")
    from poseidon_tpu import ScOT

    jmodel_p = ScOT(config=cfg_p)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 128, 128)).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    y_x = np.asarray(jmodel.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    y_p = np.asarray(jmodel_p.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(y_p, y_x, atol=2e-4, rtol=1e-3)

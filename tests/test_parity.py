"""Golden-value parity tests against the reference PyTorch implementation.

These tests import the untouched reference package (read-only at
/root/reference) to produce ground-truth outputs, then run the same weights
through the Flax rebuild via the hub bridge and compare numerically. Skipped
automatically if the reference or torch is unavailable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

try:
    from scOT.model import ScOT as TorchScOT, ScOTConfig as TorchScOTConfig
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference model unavailable")

import jax
import jax.numpy as jnp

from poseidon_tpu import ScOT, make_config, scot_loss
from poseidon_tpu.hub import convert_torch_state_dict


def build_pair(use_conditioning=True, residual_model="convnext", image_size=32,
               num_channels=3, num_out_channels=2, channel_slices=(0, 1, 2),
               window_size=4, depths=(2, 2, 2, 2), embed_dim=16,
               num_heads=(2, 2, 2, 2), skip_connections=(1, 1, 1, 0),
               learn_residual=False, qkv_bias=True):
    torch.manual_seed(0)
    tcfg = TorchScOTConfig(
        image_size=image_size, patch_size=4, num_channels=num_channels,
        num_out_channels=num_out_channels, embed_dim=embed_dim,
        depths=list(depths), num_heads=list(num_heads),
        skip_connections=list(skip_connections), window_size=window_size,
        mlp_ratio=2.0, qkv_bias=qkv_bias, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        hidden_act="gelu", use_absolute_embeddings=False,
        initializer_range=0.02, layer_norm_eps=1e-5, p=1,
        channel_slice_list_normalized_loss=list(channel_slices),
        residual_model=residual_model, use_conditioning=use_conditioning,
        learn_residual=learn_residual,
    )
    tmodel = TorchScOT(tcfg).eval()

    jcfg = make_config(
        "T", image_size=image_size, num_channels=num_channels,
        num_out_channels=num_out_channels,
        channel_slice_list=channel_slices, use_conditioning=use_conditioning,
        embed_dim=embed_dim, depths=depths, num_heads=num_heads,
        skip_connections=skip_connections, window_size=window_size,
        mlp_ratio=2.0, qkv_bias=qkv_bias, residual_model=residual_model,
        learn_residual=learn_residual,
    )
    jmodel = ScOT(config=jcfg)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_state_dict(sd, jcfg)

    x0 = jnp.zeros((1, num_channels, image_size, image_size))
    t0 = jnp.zeros((1,))
    ref_vars = jmodel.init(jax.random.PRNGKey(0), x0, t0)

    # Structural check: converted tree must exactly match the init tree.
    ref_paths = {"/".join(str(k.key) for k in p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]}
    got_paths = {"/".join(str(k.key) for k in p): np.shape(v)
                 for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths, (
        f"missing: {sorted(set(ref_paths) - set(got_paths))[:5]} "
        f"extra: {sorted(set(got_paths) - set(ref_paths))[:5]}")

    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if "batch_stats" in ref_vars:
        from poseidon_tpu.hub import convert_torch_batch_stats
        variables["batch_stats"] = jax.tree.map(
            jnp.asarray, convert_torch_batch_stats(sd, jcfg))
    return tmodel, jmodel, variables, tcfg, jcfg


def compare(tmodel, jmodel, variables, x, time, atol=2e-5):
    with torch.no_grad():
        tout = tmodel(
            pixel_values=torch.from_numpy(x),
            time=torch.from_numpy(time),
        ).output.numpy()
    jout = np.asarray(jmodel.apply(variables, jnp.asarray(x), jnp.asarray(time)))
    np.testing.assert_allclose(jout, tout, atol=atol, rtol=1e-4)
    return tout, jout


class TestForwardParity:
    def test_conditioned(self):
        tm, jm, v, tcfg, jcfg = build_pair(use_conditioning=True)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.35, 0.8], np.float32)
        compare(tm, jm, v, x, t)

    def test_unconditioned(self):
        tm, jm, v, tcfg, jcfg = build_pair(use_conditioning=False)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        t = np.zeros((2,), np.float32)
        compare(tm, jm, v, x, t)

    def test_shifted_windows_exercised(self):
        # window 2 on an 8x8 grid ensures every stage has multiple windows
        # and the odd blocks use cyclic shift + mask.
        tm, jm, v, tcfg, jcfg = build_pair(window_size=2)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.5], np.float32)
        compare(tm, jm, v, x, t)

    def test_learn_residual(self):
        tm, jm, v, tcfg, jcfg = build_pair(learn_residual=True)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.5], np.float32)
        compare(tm, jm, v, x, t)

    def test_resolution_resample(self):
        tm, jm, v, tcfg, jcfg = build_pair()
        rng = np.random.default_rng(4)
        for size in (16, 48):
            x = rng.normal(size=(1, 3, size, size)).astype(np.float32)
            t = np.asarray([0.5], np.float32)
            compare(tm, jm, v, x, t, atol=5e-5)

    def test_resnet_variant(self):
        tm, jm, v, tcfg, jcfg = build_pair(residual_model="resnet")
        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.5], np.float32)
        compare(tm, jm, v, x, t)

    def test_head_packed_stages(self):
        # 8 heads on a 4x4 (t=16) stage triggers the block-diagonal head
        # packing fast path (P=8 -> 128-token tiles); parity must be exact.
        tm, jm, v, tcfg, jcfg = build_pair(embed_dim=32, num_heads=(8, 8),
                                           depths=(2, 2), skip_connections=(1, 0))
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.3, 0.7], np.float32)
        compare(tm, jm, v, x, t)

    def test_no_qkv_bias(self):
        tm, jm, v, tcfg, jcfg = build_pair(qkv_bias=False)
        rng = np.random.default_rng(6)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        compare(tm, jm, v, x, np.asarray([0.2], np.float32))


class TestLossParity:
    def test_normalized_loss(self):
        tm, jm, v, tcfg, jcfg = build_pair()
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        y = rng.normal(size=(2, 2, 32, 32)).astype(np.float32)
        t = np.asarray([0.3, 0.6], np.float32)
        with torch.no_grad():
            tout = tm(pixel_values=torch.from_numpy(x), time=torch.from_numpy(t),
                      labels=torch.from_numpy(y))
        jpred = jm.apply(v, jnp.asarray(x), jnp.asarray(t))
        jloss = float(scot_loss(jpred, jnp.asarray(y), jcfg))
        np.testing.assert_allclose(jloss, float(tout.loss), rtol=2e-4)


class TestParamCount:
    def test_total_matches(self):
        tm, jm, v, tcfg, jcfg = build_pair()
        t_count = sum(p.numel() for p in tm.parameters() if p.requires_grad)
        j_count = sum(int(np.prod(np.shape(leaf))) for leaf in jax.tree.leaves(v["params"]))
        assert j_count == t_count


class TestScanBlocks:
    def test_scanned_matches_reference(self):
        """scan_blocks=True (lax.scan over block pairs) must be numerically
        identical to the unrolled path and the torch reference."""
        tm, jm, v, tcfg, jcfg = build_pair(depths=(2, 2, 2, 2))
        cfg_s = jcfg.replace(scan_blocks=True)
        jm_s = ScOT(config=cfg_s)
        sd = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
        params_s = convert_torch_state_dict(sd, cfg_s)
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.35, 0.8], np.float32)
        compare(tm, jm_s, {"params": jax.tree.map(jnp.asarray, params_s)}, x, t)

    def test_scanned_odd_depth_fallback(self):
        tm, jm, v, tcfg, jcfg = build_pair(depths=(1, 2, 1, 2))
        cfg_s = jcfg.replace(scan_blocks=True)
        jm_s = ScOT(config=cfg_s)
        sd = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
        params_s = convert_torch_state_dict(sd, cfg_s)
        import jax.numpy as jnp

        rng = np.random.default_rng(12)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.5], np.float32)
        compare(tm, jm_s, {"params": jax.tree.map(jnp.asarray, params_s)}, x, t)

    def test_scanned_export_roundtrip(self):
        tm, jm, v, tcfg, jcfg = build_pair(depths=(2, 2, 2, 2))
        cfg_s = jcfg.replace(scan_blocks=True)
        sd = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
        params_s = convert_torch_state_dict(sd, cfg_s)
        from poseidon_tpu.hub import export_torch_state_dict

        sd2 = export_torch_state_dict(params_s, cfg_s)
        assert set(sd2) == set(sd)
        for k in sd:
            np.testing.assert_allclose(sd2[k], sd[k], atol=1e-7, err_msg=k)

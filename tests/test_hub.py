"""Checkpoint-bridge tests: loading a reference-format (PyTorch) checkpoint
directory, including the finetune embedding/recovery replacement semantics."""

import json
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

from poseidon_tpu.hub import from_pretrained


def save_torch_checkpoint(tmp_path, num_channels=3, num_out_channels=2):
    torch.manual_seed(0)
    tcfg = TorchScOTConfig(
        image_size=32, patch_size=4, num_channels=num_channels,
        num_out_channels=num_out_channels, embed_dim=16,
        depths=[2, 2], num_heads=[2, 2], skip_connections=[1, 0],
        window_size=4, mlp_ratio=2.0, qkv_bias=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, hidden_act="gelu", use_absolute_embeddings=False,
        initializer_range=0.02, layer_norm_eps=1e-5, p=1,
        channel_slice_list_normalized_loss=[0, 1, 2],
        residual_model="convnext", use_conditioning=True, learn_residual=False)
    tmodel = TorchScOT(tcfg).eval()
    d = tmp_path / "ckpt"
    d.mkdir()
    torch.save(tmodel.state_dict(), d / "pytorch_model.bin")
    with open(d / "config.json", "w") as f:
        json.dump(tcfg.to_dict(), f)
    return str(d), tmodel


class TestFromPretrained:
    def test_exact_load(self, tmp_path):
        path, tmodel = save_torch_checkpoint(tmp_path)
        model, variables, replaced = from_pretrained(path)
        assert replaced == []
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.4], np.float32)
        with torch.no_grad():
            tout = tmodel(pixel_values=torch.from_numpy(x),
                          time=torch.from_numpy(t)).output.numpy()
        jout = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(t)))
        np.testing.assert_allclose(jout, tout, atol=2e-5, rtol=1e-4)

    def test_embedding_recovery_replacement(self, tmp_path):
        path, _ = save_torch_checkpoint(tmp_path, num_channels=3, num_out_channels=2)
        # new task has different channel counts
        from poseidon_tpu.hub import load_config

        new_cfg = load_config(path).replace(num_channels=5, num_out_channels=4)
        model, variables, replaced = from_pretrained(
            path, config=new_cfg, ignore_mismatched_sizes=True)
        # exactly the channel-shaped tensors got re-initialized
        assert any("embeddings/projection" in r for r in replaced)
        assert any("patch_recovery" in r for r in replaced)
        assert not any(r.startswith("encoder") for r in replaced)
        y = model.apply(variables, jnp.zeros((1, 5, 32, 32)), jnp.ones((1,)))
        assert y.shape == (1, 4, 32, 32)

    def test_mismatch_without_flag_raises(self, tmp_path):
        path, _ = save_torch_checkpoint(tmp_path)
        from poseidon_tpu.hub import load_config

        new_cfg = load_config(path).replace(num_channels=5)
        with pytest.raises(ValueError):
            from_pretrained(path, config=new_cfg, ignore_mismatched_sizes=False)


class TestExportRoundTrip:
    def test_flax_to_torch_roundtrip(self, tmp_path):
        """export_torch_state_dict must be loadable by the PyTorch reference
        with identical outputs."""
        path, tmodel = save_torch_checkpoint(tmp_path)
        model, variables, _ = from_pretrained(path)

        from poseidon_tpu.hub import save_pretrained

        out_dir = tmp_path / "exported"
        save_pretrained(str(out_dir), variables["params"], model.config)

        # reference loads our export
        tmodel2 = TorchScOT.from_pretrained(str(out_dir)).eval()
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
        t = np.asarray([0.6], np.float32)
        with torch.no_grad():
            y1 = tmodel(pixel_values=torch.from_numpy(x),
                        time=torch.from_numpy(t)).output.numpy()
            y2 = tmodel2(pixel_values=torch.from_numpy(x),
                         time=torch.from_numpy(t)).output.numpy()
        np.testing.assert_allclose(y2, y1, atol=1e-6)

    def test_export_name_set_matches(self, tmp_path):
        path, tmodel = save_torch_checkpoint(tmp_path)
        model, variables, _ = from_pretrained(path)
        from poseidon_tpu.hub import export_torch_state_dict

        sd = export_torch_state_dict(
            jax.tree.map(np.asarray, variables["params"]), model.config)
        ref_names = set(tmodel.state_dict().keys())
        got_names = set(sd.keys())
        assert got_names == ref_names, (
            f"missing={sorted(ref_names - got_names)[:5]} "
            f"extra={sorted(got_names - ref_names)[:5]}")


class TestHubRepoId:
    def test_repo_id_download_monkeypatched(self, tmp_path, monkeypatch):
        """A non-local-dir source is treated as a HF repo id and resolved via
        snapshot_download (reference README.md:27-33)."""
        path, tmodel = save_torch_checkpoint(tmp_path)
        calls = {}

        def fake_snapshot_download(repo_id, **kw):
            calls["repo_id"] = repo_id
            return path

        import huggingface_hub

        monkeypatch.setattr(huggingface_hub, "snapshot_download",
                            fake_snapshot_download)
        model, variables, replaced = from_pretrained("camlab-ethz/Poseidon-B")
        assert calls["repo_id"] == "camlab-ethz/Poseidon-B"
        assert replaced == []

    def test_missing_path_raises_clear_error(self, monkeypatch):
        import huggingface_hub

        def boom(repo_id, **kw):
            raise ConnectionError("offline")

        monkeypatch.setattr(huggingface_hub, "snapshot_download", boom)
        from poseidon_tpu.hub import resolve_model_path

        with pytest.raises(FileNotFoundError, match="offline"):
            resolve_model_path("not/a-dir")

    def test_push_to_hub_fallback(self, tmp_path):
        """Without credentials/network the push fails gracefully and keeps
        the local export."""
        from poseidon_tpu.hub import push_to_hub

        d = tmp_path / "export"
        d.mkdir()
        (d / "config.json").write_text("{}")
        assert push_to_hub("someone/some-repo", str(d)) in (True, False)
        assert (d / "config.json").exists()

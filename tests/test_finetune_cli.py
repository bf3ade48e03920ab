"""CLI finetune-branch semantics (VERDICT r3 item 3).

Reference /root/reference/scOT/train.py:273-275,330-335: with
``--finetune_from`` set and ``--replace_embedding_recovery`` ABSENT the
checkpoint's OWN config is loaded verbatim (``config=None``) — no
dataset-shaped surgery, and a channel mismatch with the dataset fails loudly.
With the flag PRESENT the dataset-shaped config is built and mismatched
embedding/recovery tensors are re-initialized (``ignore_mismatched_sizes``).
"""

import json

import h5py
import jax
import numpy as np
import pytest

from poseidon_tpu import ScOT, train
from poseidon_tpu.hub import save_pretrained

from test_inference import _Patched

TINY = {
    "dataset": "reaction_diffusion.AllenCahn",
    "num_trajectories": 2,
    "patch_size": 4, "embed_dim": 16, "depths": [1, 1], "num_heads": [2, 2],
    "skip_connections": [1, 0], "window_size": 8, "mlp_ratio": 2.0,
    "num_epochs": 1, "lr": 1e-4, "lr_embedding_recovery": 1e-3,
    "lr_time_embedding": 1e-3, "weight_decay": 1e-6, "batch_size": 1,
}


@pytest.fixture(scope="module")
def ace_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ace_ft")
    rng = np.random.default_rng(3)
    with h5py.File(d / "ACE.nc", "w") as f:
        ds = f.create_dataset("solution", shape=(15000, 20, 128, 128),
                              dtype="f4", chunks=(1, 1, 128, 128))
        # train rows + the val/test tail windows under _Patched (4/8).
        for i in list(range(4)) + list(range(14988, 15000)):
            base = rng.normal(size=(128, 128)).astype("f4")
            for t in range(20):
                ds[i, t] = base * np.exp(-0.05 * t)
    return str(d)


class _DS:
    resolution = 128
    input_dim = 1
    output_dim = 1
    channel_slice_list = [0, 1]


class _DS2:
    resolution = 128
    input_dim = 2
    output_dim = 2
    channel_slice_list = [0, 1, 2]


def _make_checkpoint(tmp_path_factory, name: str, cfg) -> str:
    model = ScOT(config=cfg)
    x = np.zeros((1, cfg.num_channels, cfg.image_size, cfg.image_size), np.float32)
    t = np.zeros((1,), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    d = str(tmp_path_factory.mktemp(name))
    save_pretrained(d, jax.tree.map(np.asarray, variables["params"]), cfg)
    return d


@pytest.fixture(scope="module")
def ckpt_same_channels(tmp_path_factory):
    """Checkpoint matching the dataset's channels but with embed_dim 24 —
    distinguishable from the YAML's embed_dim 16."""
    cfg = train.build_model_config(dict(TINY, embed_dim=24), _DS(), True)
    return _make_checkpoint(tmp_path_factory, "ckpt24", cfg)


@pytest.fixture(scope="module")
def ckpt_two_channels(tmp_path_factory):
    """Checkpoint with 2 in/out channels — mismatched with AllenCahn's 1."""
    cfg = train.build_model_config(dict(TINY), _DS2(), True)
    return _make_checkpoint(tmp_path_factory, "ckpt2ch", cfg)


def _run(ace_dir, tmp_path, ckpt, *extra):
    with _Patched():
        return train.main([
            "--config", json.dumps(TINY), "--json_config",
            "--data_path", ace_dir, "--checkpoint_path",
            str(tmp_path / "out"), "--wandb_project_name", "proj",
            "--wandb_run_name", "ft", "--train_small_time_transition",
            "--finetune_from", ckpt, *extra,
        ])


class TestFinetuneBranches:
    def test_no_flag_uses_checkpoint_config(self, ace_dir, ckpt_same_channels,
                                            tmp_path):
        trainer = _run(ace_dir, tmp_path, ckpt_same_channels)
        # The checkpoint's config (embed_dim 24) wins over the YAML's 16.
        assert trainer.config.embed_dim == 24
        assert trainer.config.num_channels == 1

    def test_no_flag_channel_mismatch_fails_loudly(self, ace_dir,
                                                   ckpt_two_channels,
                                                   tmp_path):
        # Checkpoint expects 2 input channels, dataset provides 1: the
        # reference's no-flag path lets this fail loudly rather than
        # silently re-initializing the embeddings.
        with pytest.raises(Exception):
            _run(ace_dir, tmp_path, ckpt_two_channels)

    def test_flag_replaces_embedding_recovery(self, ace_dir,
                                              ckpt_two_channels, tmp_path):
        trainer = _run(ace_dir, tmp_path, ckpt_two_channels,
                       "--replace_embedding_recovery")
        # Dataset-shaped config: 1 channel, YAML embed_dim.
        assert trainer.config.num_channels == 1
        assert trainer.config.num_out_channels == 1
        assert trainer.config.embed_dim == 16

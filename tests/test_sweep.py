"""Round-3: sweep-aware checkpoint layout round trip (VERDICT r2 item 5).

``train.main`` under a sweep (WANDB_SWEEP_ID in the env, as a ``wandb agent``
exports to its workers) must write ``<ckpt>/<project>/<sweep_id>/<run>`` —
the layout ``inference.py eval_sweep`` walks (reference train.py:152-169 /
inference.py:643-693) — and the offline ``eval_sweep`` must then find and
evaluate that checkpoint without a W&B API."""

import json
import os

import h5py
import numpy as np
import pytest

from poseidon_tpu import inference, train

from test_inference import _Patched


@pytest.fixture(scope="module")
def ace_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ace_sweep")
    rng = np.random.default_rng(0)
    with h5py.File(d / "ACE.nc", "w") as f:
        ds = f.create_dataset("solution", shape=(15000, 20, 128, 128),
                              dtype="f4", chunks=(1, 1, 128, 128))
        # train rows (0..3) and test rows (tail window used by _Patched).
        for i in list(range(4)) + list(range(14760, 14768)):
            base = rng.normal(size=(128, 128)).astype("f4")
            for t in range(20):
                ds[i, t] = base * np.exp(-0.05 * t)
    return str(d)


TINY = {
    "dataset": "reaction_diffusion.AllenCahn",
    "num_trajectories": 2,
    "patch_size": 4, "embed_dim": 16, "depths": [1, 1], "num_heads": [2, 2],
    "skip_connections": [1, 0], "window_size": 8, "mlp_ratio": 2.0,
    "num_epochs": 1, "lr": 1e-4, "weight_decay": 1e-6, "batch_size": 1,
}


class TestSweepRoundTrip:
    def test_train_then_eval_sweep(self, ace_dir, tmp_path, monkeypatch):
        ckpt_root = str(tmp_path / "ckpts")
        monkeypatch.setenv("WANDB_SWEEP_ID", "sweep_abc123")
        with _Patched():
            train.main([
                "--config", json.dumps(TINY), "--json_config",
                "--data_path", ace_dir, "--checkpoint_path", ckpt_root,
                "--wandb_project_name", "proj", "--wandb_run_name", "runA",
                # skip the (slow) post-training AR test protocol
                "--train_small_time_transition",
            ])

        run_dir = os.path.join(ckpt_root, "proj", "sweep_abc123", "runA")
        assert os.path.isdir(os.path.join(run_dir, "model")), (
            "train.main must write <ckpt>/<project>/<sweep_id>/<run>")

        csv_path = str(tmp_path / "sweep_eval.csv")
        with _Patched():
            inference.main([
                "--mode", "eval_sweep", "--data_path", ace_dir,
                "--dataset", "reaction_diffusion.AllenCahn",
                "--file", csv_path, "--batch_size", "8",
                "--initial_time", "0", "--final_time", "14",
                "--wandb_project", "proj", "--sweep_id", "sweep_abc123",
                "--base_checkpoint_dir", ckpt_root,
            ])
        lines = open(csv_path).read().strip().split("\n")
        assert len(lines) == 2  # header + the one run
        header = lines[0].split(",")
        row = dict(zip(header, lines[1].split(",")))
        assert row["model"] == run_dir
        assert np.isfinite(float(row["median_relative_l1_error"]))

    def test_no_sweep_keeps_flat_layout(self, ace_dir, tmp_path, monkeypatch):
        ckpt_root = str(tmp_path / "ckpts_flat")
        monkeypatch.delenv("WANDB_SWEEP_ID", raising=False)
        with _Patched():
            train.main([
                "--config", json.dumps(TINY), "--json_config",
                "--data_path", ace_dir, "--checkpoint_path", ckpt_root,
                "--wandb_project_name", "proj", "--wandb_run_name", "runB",
                "--train_small_time_transition",
            ])
        assert os.path.isdir(os.path.join(ckpt_root, "proj", "runB", "model"))


def test_perf_knobs_flow_from_config():
    """attention_impl / score_dtype / scan_blocks are settable from the YAML
    config dict (the production fast path must be reachable from the CLI)."""

    class _DS:
        resolution = 128
        input_dim = 4
        output_dim = 4
        channel_slice_list = [0, 1, 3, 4]

    base = dict(patch_size=4, embed_dim=48, depths=[4, 4, 4, 4],
                num_heads=[3, 6, 12, 24], skip_connections=[2, 2, 2, 0],
                window_size=16, mlp_ratio=4.0)
    cfg = train.build_model_config(
        dict(base, attention_impl="pallas", score_dtype="bfloat16",
             scan_blocks=True), _DS(), time_involved=True)
    assert cfg.attention_impl == "pallas"
    assert cfg.score_dtype == "bfloat16"
    assert cfg.scan_blocks is True
    cfg = train.build_model_config(dict(base), _DS(), time_involved=True)
    assert cfg.attention_impl == "xla" and cfg.scan_blocks is False


def test_unknown_model_name_raises(tmp_path):
    """A typo'd model_name must fail loudly, not silently skip the
    MODEL_MAP merge and train stale dims."""
    import json

    import pytest

    cfg = dict(dataset="reaction_diffusion.AllenCahn", num_trajectories=8,
               model_name="b", lr=1e-4, weight_decay=1e-6,
               lr_scheduler="cosine", warmup_ratio=0.0,
               early_stopping_patience=10, num_epochs=1, batch_size=4,
               max_grad_norm=5.0)
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(cfg))
    with pytest.raises(KeyError, match="model_name"):
        train.main([
            "--config", str(p), "--data_path", str(tmp_path),
            "--checkpoint_path", str(tmp_path / "ckpt"),
        ])

"""Inference library/CLI tests on synthetic data: eval, AR rollout through the
trainer, accumulation error, resolution eval, CSV output."""

import os

import h5py
import numpy as np
import pytest

from poseidon_tpu import ScOT, make_config
from poseidon_tpu.inference import (
    append_csv,
    get_test_set,
    get_trainer,
    get_trajectories,
    make_compute_metrics,
    rollout,
)
from poseidon_tpu.training import Trainer, TrainingArguments


@pytest.fixture(scope="module")
def ace_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ace")
    rng = np.random.default_rng(0)
    with h5py.File(d / "ACE.nc", "w") as f:
        ds = f.create_dataset("solution", shape=(15000, 20, 128, 128),
                              dtype="f4", chunks=(1, 1, 128, 128))
        for i in list(range(4)) + list(range(14760, 14768)):
            base = rng.normal(size=(128, 128)).astype("f4")
            for t in range(20):
                ds[i, t] = base * np.exp(-0.05 * t)
    return str(d)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory, ace_dir):
    """A tiny trained-for-zero-steps model saved in native format."""
    import jax

    d = tmp_path_factory.mktemp("model")
    cfg = make_config("T", image_size=128, num_channels=1, num_out_channels=1,
                      channel_slice_list=(0, 1), use_conditioning=True,
                      embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                      skip_connections=(1, 0), window_size=8, mlp_ratio=2.0)
    model = ScOT(config=cfg)
    args = TrainingArguments(output_dir=str(d), eval_batch_size=8,
                             compute_dtype="float32", num_workers=2,
                             report_to="none")
    trainer = Trainer(model, args)
    trainer.save_model(str(d))
    return str(d)


class _Patched:
    """Shrink split constants to fit the synthetic files."""

    def __enter__(self):
        import poseidon_tpu.data.base as base

        self.orig = base.BaseTimeDataset.post_init
        orig = self.orig

        def post_init(ds):
            ds.N_max, ds.N_val, ds.N_test = 15000, 4, 8
            # keep N_max real so self.start stays valid for "test"
            orig(ds)

        base.BaseTimeDataset.post_init = post_init
        return self

    def __exit__(self, *a):
        import poseidon_tpu.data.base as base

        base.BaseTimeDataset.post_init = self.orig


class TestHelpers:
    def test_get_test_set(self, ace_dir):
        with _Patched():
            ds = get_test_set("reaction_diffusion.AllenCahn", ace_dir, 0, 14)
        assert len(ds) == 8  # N_test * multiplier 1
        s = ds[0]
        np.testing.assert_allclose(s["time"], 14 / 19)

    def test_get_trajectories(self, ace_dir):
        with _Patched():
            inputs, traj = get_trajectories(
                "reaction_diffusion.AllenCahn", ace_dir, 0, 8, 4)
        assert inputs.shape == (8, 1, 128, 128)
        assert traj.shape == (8, 2, 1, 128, 128)  # t=4 and t=8

    def test_append_csv(self, tmp_path):
        p = str(tmp_path / "out.csv")
        append_csv(p, {"a": 1, "b": 2.5})
        append_csv(p, {"a": 3, "b": 4.5})
        lines = open(p).read().strip().split("\n")
        assert lines[0] == "a,b"
        assert len(lines) == 3

    def test_compute_metrics_groups(self):
        fn = make_compute_metrics([0, 1, 3], ["a", "bc"])
        rng = np.random.default_rng(0)
        out = fn(rng.normal(size=(5, 3, 8, 8)), rng.normal(size=(5, 3, 8, 8)))
        assert "a/median_relative_l1_error" in out
        assert "bc/mean_l1_error" in out  # reference's absolute-error key names
        assert "mean_relative_l1_error" in out
        assert "mean_over_median_l1_error" in out

    def test_compute_metrics_full_data(self):
        fn = make_compute_metrics([0, 1, 3], ["a", "bc"], full_data=True)
        rng = np.random.default_rng(0)
        out = fn(rng.normal(size=(5, 3, 8, 8)), rng.normal(size=(5, 3, 8, 8)))
        assert len(out["a/relative_full_data"]) == 5
        assert len(out["bc/full_data"]) == 5
        fn1 = make_compute_metrics([0, 1], ["u"], full_data=True)
        out1 = fn1(rng.normal(size=(5, 1, 8, 8)), rng.normal(size=(5, 1, 8, 8)))
        assert len(out1["relative_full_data"]) == 5


class TestEndToEnd:
    def test_trainer_eval_and_rollout(self, ace_dir, model_dir):
        with _Patched():
            ds = get_test_set("reaction_diffusion.AllenCahn", ace_dir, 0, 8)
            trainer = get_trainer(model_dir, 8, ds, workers=2)
            out = trainer.predict(ds)
            assert out.predictions.shape == (8, 1, 128, 128)
            out_ar = rollout(trainer, ds, ar_steps=2)
            assert out_ar.predictions.shape == (8, 1, 128, 128)
            assert np.isfinite(out_ar.metrics["loss"])

    def test_output_all_steps(self, ace_dir, model_dir):
        with _Patched():
            ds = get_test_set("reaction_diffusion.AllenCahn", ace_dir, 0, 8)
            trainer = get_trainer(model_dir, 8, ds, workers=2)
            trainer.set_ar_steps([0.5, 1.0], output_all_steps=True)
            preds, labels, losses = trainer._predict_arrays(ds)
            assert preds.shape == (8, 2, 1, 128, 128)
            assert np.all(np.isfinite(losses))


class TestResolveModelPath:
    def test_prefers_best_then_highest_checkpoint(self, tmp_path, capsys):
        from poseidon_tpu.inference import _resolve_model_path

        run = tmp_path / "runA"
        for d in ("checkpoint-1000", "checkpoint-2000"):
            (run / d).mkdir(parents=True)
        # numeric, not lexical: checkpoint-2000 beats checkpoint-1000
        assert _resolve_model_path(str(run)).endswith("checkpoint-2000")
        assert "WARNING" in capsys.readouterr().out
        (run / "best").mkdir()
        assert _resolve_model_path(str(run)).endswith("best")
        # native save layout: the run dir itself
        (run / "model").mkdir()
        assert _resolve_model_path(str(run)) == str(run)

    def test_empty_dir(self, tmp_path):
        from poseidon_tpu.inference import _resolve_model_path

        assert _resolve_model_path(str(tmp_path)) is None

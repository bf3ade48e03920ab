"""End-to-end training-loop tests on a synthetic dataset (8 virtual CPU
devices via conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poseidon_tpu import ScOT, make_config
from poseidon_tpu.metrics import compute_channel_group_metrics
from poseidon_tpu.training import Trainer, TrainingArguments, label_params
from poseidon_tpu.training.optimizer import make_lr_schedule
from poseidon_tpu.training.rollout import autoregressive_rollout


class SyntheticTimeDataset:
    """Identity-with-decay operator: label = input * exp(-t). 2 channels, the
    second is a static field copied into labels (like wave's c-channel)."""

    def __init__(self, n=32, res=16, channels=2):
        rng = np.random.default_rng(0)
        self.x = rng.normal(size=(n, channels, res, res)).astype(np.float32)
        self.t = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
        self.resolution = res
        self.input_dim = channels
        self.output_dim = channels
        self.channel_slice_list = [0, 1, 2]
        self.printable_channel_description = ["u", "c"]

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        x = self.x[i]
        y = x.copy()
        y[0] = x[0] * np.exp(-self.t[i])
        return {"pixel_values": x, "labels": y, "time": self.t[i]}


def tiny_cfg(**kw):
    base = dict(image_size=16, patch_size=2, num_channels=2, num_out_channels=2,
                embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                skip_connections=(1, 0), window_size=4, mlp_ratio=2.0,
                channel_slice_list=(0, 1, 2), use_conditioning=True)
    base.update(kw)
    return make_config("T", **base)


def make_trainer(tmp_path, **args_kw):
    cfg = tiny_cfg()
    model = ScOT(config=cfg)
    ds = SyntheticTimeDataset()
    defaults = dict(
        output_dir=str(tmp_path), train_batch_size=8, eval_batch_size=8,
        num_train_epochs=2, learning_rate=1e-3, weight_decay=1e-6,
        max_grad_norm=5.0, compute_dtype="float32", logging_steps=1,
        num_workers=2)
    defaults.update(args_kw)
    args = TrainingArguments(**defaults)
    # Streaming-capable battery, as train.py wires it (ChannelGroupMetrics is
    # callable AND exposes per_sample/from_samples for chunked eval).
    from poseidon_tpu.metrics import ChannelGroupMetrics

    metrics_fn = ChannelGroupMetrics(
        ds.channel_slice_list, ds.printable_channel_description)
    return Trainer(model, args, train_dataset=ds, eval_dataset=ds,
                   compute_metrics=metrics_fn)


class TestOptimizerGrouping:
    def _labels(self, use_emb, use_time):
        cfg = tiny_cfg()
        model = ScOT(config=cfg)
        x = jnp.zeros((1, 2, 16, 16))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
        return label_params(variables["params"], use_emb, use_time), variables

    def test_four_groups(self):
        labels, variables = self._labels(True, True)
        flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
                for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]}
        # embedding + patch recovery params -> embeddings group
        assert flat["embeddings/projection/kernel"] == "embeddings"
        assert flat["embed_norm/cond_scale/kernel"] == "embeddings"  # embeddings rule wins
        assert flat["patch_recovery/projection/kernel"] == "embeddings"
        # CLN params elsewhere -> time_embedding
        assert flat["encoder/stage_0_block_0/norm_attn/cond_scale/kernel"] == "time_embedding"
        assert flat["encoder/stage_0_block_0/norm_attn/cond_scale/bias"] == "time_embedding"
        # plain weights -> decay; biases -> no_decay
        assert flat["encoder/stage_0_block_0/mlp_fc1/kernel"] == "decay"
        assert flat["encoder/stage_0_block_0/mlp_fc1/bias"] == "no_decay"
        # logit_scale and layer_scale count as decay (not bias, not norm)
        assert flat["encoder/stage_0_block_0/attn/logit_scale"] == "decay"
        assert flat["residual_0_0/layer_scale"] == "decay"

    def test_no_extra_groups(self):
        labels, _ = self._labels(False, False)
        vals = set(jax.tree.leaves(labels))
        assert vals <= {"decay", "no_decay"}

    def test_time_only(self):
        labels, _ = self._labels(False, True)
        flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
                for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]}
        # without the embeddings group, embed CLN params fall to time_embedding
        assert flat["embed_norm/cond_scale/kernel"] == "time_embedding"


class TestSchedules:
    def test_cosine(self):
        s = make_lr_schedule("cosine", 1e-3, 100, warmup_ratio=0.1)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
        assert float(s(100)) < 1e-5

    def test_linear(self):
        s = make_lr_schedule("linear", 1e-3, 100, warmup_ratio=0.0)
        np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(50)), 5e-4, rtol=1e-5)

    def test_constant(self):
        s = make_lr_schedule("constant", 1e-3, 100)
        np.testing.assert_allclose(float(s(77)), 1e-3)


class TestTrainLoop:
    def test_loss_decreases_and_checkpoints(self, tmp_path):
        trainer = make_trainer(tmp_path, num_train_epochs=3)
        history = trainer.train()
        assert len(history) == 3
        assert history[-1]["train_loss"] < history[0]["train_loss"]
        assert "eval_loss" in history[-1]
        assert "eval_mean_relative_l1_error" in history[-1]
        # checkpoints exist: best + last epoch only (save_total_limit=1)
        names = sorted(p.name for p in tmp_path.iterdir())
        assert "best" in names
        assert sum(n.startswith("checkpoint-") for n in names) == 1

    def test_resume(self, tmp_path):
        trainer = make_trainer(tmp_path, num_train_epochs=2)
        trainer.train()
        step_before = int(trainer.state.step)
        trainer2 = make_trainer(tmp_path, num_train_epochs=3)
        out = trainer2.load_checkpoint(str(tmp_path))
        assert out is not None
        assert int(trainer2.state.step) == step_before

    def test_legacy_checkpoint_restore(self, tmp_path):
        """Checkpoints written before loss_sum/meta.batch_index existed must
        still restore (ADVICE r4): new fields fall back to their defaults."""
        import os

        import orbax.checkpoint as ocp

        trainer = make_trainer(tmp_path, num_train_epochs=1)
        tree = trainer._ckpt_tree(3, 0.5)
        del tree["loss_sum"]
        tree["meta"] = {"epoch": tree["meta"]["epoch"],
                        "best": tree["meta"]["best"]}
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(str(tmp_path / "checkpoint-3")), tree,
                       force=True)
        out = trainer.load_checkpoint(str(tmp_path))
        assert out is not None
        epoch, best, start_batch = out
        assert (epoch, start_batch) == (4, 0)
        np.testing.assert_allclose(best, 0.5)
        np.testing.assert_allclose(float(trainer.state.loss_sum), 0.0)

    def test_early_stopping(self, tmp_path):
        trainer = make_trainer(tmp_path, num_train_epochs=50,
                               early_stopping_patience=1, learning_rate=0.0)
        history = trainer.train()
        # lr=0 -> no improvement after first epoch -> stops quickly
        assert len(history) <= 3

    def test_predict_shapes(self, tmp_path):
        trainer = make_trainer(tmp_path)
        ds = trainer.eval_dataset
        out = trainer.predict(ds, metric_key_prefix="t/")
        assert out.predictions.shape == (len(ds), 2, 16, 16)
        assert out.label_ids.shape == out.predictions.shape
        assert "t/loss" in out.metrics


class TestRollout:
    def test_static_channel_reattach(self):
        # step_fn returns input state decayed; static channel must be re-fed
        def step_fn(x, t):
            return x[:, :1] * 0.5

        x = np.ones((2, 2, 4, 4), np.float32)
        x[:, 1] = 7.0  # static channel
        out = autoregressive_rollout(step_fn, jnp.asarray(x), jnp.ones((2,)), 3,
                                     num_out_channels=1)
        np.testing.assert_allclose(np.asarray(out), 0.125)

    def test_time_division(self):
        # accumulating +dt for 4 steps must reconstruct the full lead time
        out = autoregressive_rollout(lambda x, t: x + t[:, None, None, None],
                                     jnp.zeros((1, 1, 2, 2)), jnp.asarray([0.8]), 4, 1)
        np.testing.assert_allclose(np.asarray(out), 0.8, rtol=1e-6)

    def test_output_all_steps(self):
        out = autoregressive_rollout(lambda x, t: x * 0.5,
                                     jnp.ones((2, 1, 2, 2)), jnp.ones((2,)), 3, 1,
                                     output_all_steps=True)
        assert out.shape == (2, 3, 1, 2, 2)
        np.testing.assert_allclose(np.asarray(out[:, -1]), 0.125)

    def test_list_mode_times(self):
        out = autoregressive_rollout(
            lambda x, t: jnp.broadcast_to(t[:, None, None, None], x.shape),
            jnp.zeros((1, 1, 2, 2)), jnp.asarray([0.5]), [1.0, 2.0], 1,
            output_all_steps=True)
        np.testing.assert_allclose(np.asarray(out[0, 0]).ravel()[0], 0.5)
        np.testing.assert_allclose(np.asarray(out[0, 1]).ravel()[0], 1.0)

    def test_ar_eval_through_trainer(self, tmp_path):
        trainer = make_trainer(tmp_path)
        ds = trainer.eval_dataset
        trainer.set_ar_steps(2)
        out = trainer.predict(ds, metric_key_prefix="ar/")
        assert out.predictions.shape == (len(ds), 2, 16, 16)
        trainer.set_ar_steps(None)


class TestSharding:
    def test_batch_sharded_over_data_axis(self, tmp_path):
        trainer = make_trainer(tmp_path)
        assert trainer.mesh.shape["data"] == 8
        batch = trainer._device_batch(
            {"pixel_values": np.zeros((8, 2, 16, 16), np.float32),
             "labels": np.zeros((8, 2, 16, 16), np.float32),
             "time": np.ones((8,), np.float32)})
        shards = batch["pixel_values"].sharding
        assert shards.spec[0] == "data"


class TestRolloutGradients:
    def test_rollout_loss_has_gradient(self):
        """Per-step rollout losses must carry gradients through each step's
        own forward (the reference detaches only the fed-back input)."""
        from poseidon_tpu.training.rollout import rollout_loss

        w = jnp.ones((1,))

        def step_fn(x, t):
            return x * w[0]

        def loss(w_):
            def sf(x, t):
                return x * w_[0]

            l, _ = rollout_loss(
                sf, lambda a, b: jnp.mean(jnp.abs(a - b)),
                jnp.ones((2, 1, 4, 4)), jnp.ones((2,)), jnp.zeros((2, 1, 4, 4)),
                3, 1)
            return l

        g = jax.grad(loss)(w)
        assert float(jnp.abs(g).max()) > 0

    def test_final_prediction_has_gradient(self):
        from poseidon_tpu.training.rollout import autoregressive_rollout

        def loss(w_):
            out = autoregressive_rollout(
                lambda x, t: x * w_[0], jnp.ones((1, 1, 2, 2)), jnp.ones((1,)),
                2, 1)
            return jnp.sum(out)

        g = jax.grad(loss)(jnp.ones((1,)))
        # d/dw of (stop(x*w)*w) = stop(x*w) = w -> gradient 4*w = 4
        np.testing.assert_allclose(float(g[0]), 4.0, rtol=1e-6)


class TestEvalPadding:
    def test_eval_loss_excludes_padding(self, tmp_path):
        """With a non-divisible eval set the loader pads the last batch by
        repeating the final sample; the eval loss must equal the unpadded
        computation (VERDICT r1 item 5)."""
        from poseidon_tpu.models.scot import scot_loss

        cfg = tiny_cfg()
        model = ScOT(config=cfg)
        ds = SyntheticTimeDataset(n=10)  # 10 % 8 != 0 -> last batch padded by 6
        args = TrainingArguments(
            output_dir=str(tmp_path), train_batch_size=8, eval_batch_size=8,
            num_train_epochs=1, compute_dtype="float32", num_workers=2,
            report_to="none")
        trainer = Trainer(model, args, train_dataset=ds, eval_dataset=ds)

        got = trainer._predict_arrays(ds)[2]

        # Manual unpadded computation with the same per-batch grouping.
        total, count = 0.0, 0
        for lo in range(0, len(ds), 8):
            samples = [ds[i] for i in range(lo, min(lo + 8, len(ds)))]
            batch = {
                "pixel_values": jnp.stack([jnp.asarray(s["pixel_values"]) for s in samples]),
                "labels": jnp.stack([jnp.asarray(s["labels"]) for s in samples]),
                "time": jnp.asarray([s["time"] for s in samples]),
            }
            loss, _, _ = trainer._loss_and_pred(
                trainer.state.params, None, batch, None, train=False)
            total += float(loss) * len(samples)
            count += len(samples)
        expected = total / count
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestARTraining:
    def test_ar_training_without_conditioning(self, tmp_path):
        """The reference rolls out whenever ar_steps is set, regardless of
        conditioning (trainer.py:452); dropout must fire per rollout step."""
        cfg = tiny_cfg(use_conditioning=False, hidden_dropout_prob=0.1)
        model = ScOT(config=cfg)
        ds = SyntheticTimeDataset()
        args = TrainingArguments(
            output_dir=str(tmp_path), train_batch_size=8, eval_batch_size=8,
            num_train_epochs=1, learning_rate=1e-3, compute_dtype="float32",
            num_workers=2, report_to="none")
        trainer = Trainer(model, args, train_dataset=ds, eval_dataset=ds)
        trainer.set_ar_steps(2)
        batch = trainer._device_batch(next(iter(
            __import__("poseidon_tpu.data.loader", fromlist=["DataLoader"])
            .DataLoader(ds, 8, num_workers=2).epoch(0))))
        params_before = jax.tree.map(np.asarray, trainer.state.params)
        state, metrics = jax.jit(trainer._train_step)(
            trainer.state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params actually moved (gradients flowed through the rollout steps)
        moved = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.params, params_before)
        assert max(jax.tree.leaves(moved)) > 0

    def test_ar_training_updates_batch_stats(self, tmp_path):
        """BatchNorm running stats (resnet residual variant) must thread
        through the rollout scan in train mode (ADVICE r1)."""
        cfg = tiny_cfg(residual_model="resnet")
        model = ScOT(config=cfg)
        ds = SyntheticTimeDataset()
        args = TrainingArguments(
            output_dir=str(tmp_path), train_batch_size=8, eval_batch_size=8,
            num_train_epochs=1, learning_rate=1e-3, compute_dtype="float32",
            num_workers=2, report_to="none")
        trainer = Trainer(model, args, train_dataset=ds, eval_dataset=ds)
        assert trainer.state.batch_stats is not None
        trainer.set_ar_steps(2)
        batch = trainer._device_batch(next(iter(
            __import__("poseidon_tpu.data.loader", fromlist=["DataLoader"])
            .DataLoader(ds, 8, num_workers=2).epoch(0))))
        bs_before = jax.tree.map(np.asarray, trainer.state.batch_stats)
        state, _ = jax.jit(trainer._train_step)(
            trainer.state, batch, jax.random.PRNGKey(0))
        changed = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.batch_stats, bs_before)
        assert max(jax.tree.leaves(changed)) > 0


class TestRemat:
    def test_remat_grads_match(self):
        """gradient_checkpointing (remat) must not change gradients."""
        cfg = tiny_cfg()
        m_plain = ScOT(config=cfg, remat=False)
        m_remat = ScOT(config=cfg, remat=True)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 16, 16)),
                        jnp.float32)
        t = jnp.asarray([0.3, 0.7])
        y = x * 0.5
        variables = jax.jit(m_plain.init)(jax.random.PRNGKey(0), x, t)

        def loss(m):
            def f(p):
                pred = m.apply({"params": p}, x, t)
                return jnp.mean(jnp.abs(pred - y))
            return f

        g1 = jax.grad(loss(m_plain))(variables["params"])
        g2 = jax.grad(loss(m_remat))(variables["params"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5), g1, g2)


class TestCheckpointListing:
    """A SIGKILL during an Orbax save leaves a ``*.orbax-checkpoint-tmp``
    dir; resume must skip it and fall back to the previous complete
    checkpoint (caught live by scripts/e2e_tpu_cli.py RUN 1's kill landing
    mid-write: the old sort key crashed on int('4.orbax'))."""

    def test_tmp_dirs_skipped_and_order(self, tmp_path):
        from poseidon_tpu.training.trainer import Trainer

        for d in ["checkpoint-1", "checkpoint-2-step4.orbax-checkpoint-tmp",
                  "checkpoint-0-step2", "checkpoint-0", "best", "notes"]:
            (tmp_path / d).mkdir()
        assert Trainer._list_checkpoints(str(tmp_path)) == [
            "checkpoint-0-step2", "checkpoint-0", "checkpoint-1"]

    def test_missing_dir(self):
        from poseidon_tpu.training.trainer import Trainer

        assert Trainer._list_checkpoints("/nonexistent/path") == []


class TestConfigCoercion:
    """YAML 1.1 (pyyaml) parses exponent-only floats like ``1e-6`` as
    STRINGS; load_config must coerce them (they'd otherwise crash the
    optimizer's ``wd * param`` with a TypeError)."""

    def test_sci_notation_floats(self, tmp_path):
        import argparse

        import poseidon_tpu.train as train_cli

        p = tmp_path / "c.yaml"
        p.write_text("lr: 1e-4\nweight_decay: 1e-06\nname: run1e\n"
                     "batch_size: 8\nwd2: {value: 5E+2}\n")
        cfg = train_cli.load_config(
            argparse.Namespace(json_config=False, config=str(p)))
        assert cfg["lr"] == pytest.approx(1e-4)
        assert cfg["weight_decay"] == pytest.approx(1e-6)
        assert cfg["wd2"] == pytest.approx(500.0)
        assert cfg["name"] == "run1e"        # non-numeric strings untouched
        assert cfg["batch_size"] == 8


class TestCompilationCacheWiring:
    """The production CLIs must enable the persistent compilation cache
    (VERDICT r4 item 4) — bench.py and __graft_entry__ already did."""

    def test_train_cli_enables_cache(self, monkeypatch, tmp_path):
        import poseidon_tpu.train as train_cli
        import poseidon_tpu.utils.init as uinit

        called = []
        monkeypatch.setattr(uinit, "enable_compilation_cache",
                            lambda *a, **k: called.append(True))
        with pytest.raises(FileNotFoundError):
            train_cli.main(["--config", str(tmp_path / "missing.yaml"),
                            "--data_path", str(tmp_path),
                            "--checkpoint_path", str(tmp_path)])
        assert called

    def test_inference_cli_enables_cache(self, monkeypatch, tmp_path):
        import poseidon_tpu.inference as inf_cli
        import poseidon_tpu.utils.init as uinit

        called = []
        monkeypatch.setattr(uinit, "enable_compilation_cache",
                            lambda *a, **k: called.append(True))
        with pytest.raises(SystemExit):
            inf_cli.main(["--data_path", str(tmp_path),
                          "--file", str(tmp_path / "out.csv"),
                          "--mode", "bogus"])
        assert called

"""Step-granular (mid-epoch) checkpoint/resume (VERDICT r3 item 4).

The reference inherits HF's mid-epoch resume (optimizer + scheduler +
dataloader position, /root/reference/scOT/train.py:409). Here the Orbax tree
carries the optimizer/scheduler step and the epoch-loss accumulator, and the
deterministic loader's (seed, epoch, batch_index) is the dataloader state —
so a run killed at step N and resumed must reproduce the uninterrupted run
BIT-FOR-BIT.
"""

import json
import os
import shutil

import jax
import numpy as np
import pytest

from poseidon_tpu import ScOT, make_config
from poseidon_tpu.training import Trainer, TrainingArguments

pytestmark = pytest.mark.slow  # several full (tiny) training runs, ~15 min

BATCH = 8  # divisible by the 8-device virtual CPU mesh (conftest)
STEPS_PER_EPOCH = 4
EPOCHS = 2


class ToyDataset:
    def __init__(self):
        rng = np.random.default_rng(11)
        n = BATCH * STEPS_PER_EPOCH
        self.x = rng.normal(size=(n, 2, 16, 16)).astype(np.float32)
        self.t = rng.uniform(0.1, 1.0, n).astype(np.float32)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return {"pixel_values": self.x[i], "labels": self.x[i] * 0.5,
                "time": self.t[i]}


def _make_trainer(out_dir, save_steps=None, save_total_limit=0):
    cfg = make_config("T", image_size=16, patch_size=2, num_channels=2,
                      num_out_channels=2, embed_dim=16, depths=(1, 1),
                      num_heads=(2, 2), skip_connections=(1, 0), window_size=4,
                      mlp_ratio=2.0, channel_slice_list=(0, 1, 2),
                      use_conditioning=True)
    model = ScOT(config=cfg)
    args = TrainingArguments(
        output_dir=str(out_dir), train_batch_size=BATCH, eval_batch_size=BATCH,
        num_train_epochs=EPOCHS, learning_rate=1e-3, weight_decay=1e-6,
        max_grad_norm=1.0, lr_scheduler_type="cosine", warmup_ratio=0.0,
        compute_dtype="float32", logging_steps=1, report_to="jsonl",
        save_steps=save_steps, save_total_limit=save_total_limit,
        num_workers=2, seed=0)
    return Trainer(model, args, train_dataset=ToyDataset())


def _step_losses(out_dir):
    """(step -> loss) from logs.jsonl (per-step lines carry 'step')."""
    out = {}
    with open(os.path.join(out_dir, "logs.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "step" in rec and "loss" in rec:
                out[rec["step"]] = rec["loss"]
    return out


class TestStepGranularResume:
    def test_kill_and_resume_bitwise(self, tmp_path):
        # --- uninterrupted run A -------------------------------------------
        dir_a = tmp_path / "a"
        trainer_a = _make_trainer(dir_a)
        trainer_a.train()
        losses_a = _step_losses(dir_a)
        assert set(losses_a) == set(range(1, EPOCHS * STEPS_PER_EPOCH + 1))

        # --- run B with mid-epoch checkpoints, "killed" after step 2 -------
        dir_b = tmp_path / "b"
        trainer_b = _make_trainer(dir_b, save_steps=2)
        trainer_b.train()
        assert os.path.isdir(dir_b / "checkpoint-0-step2")
        # Simulate the kill: a fresh directory holding ONLY the mid-epoch
        # checkpoint written at global step 2 (epoch 0, batch_index 2).
        dir_c = tmp_path / "c"
        os.makedirs(dir_c)
        shutil.copytree(dir_b / "checkpoint-0-step2",
                        dir_c / "checkpoint-0-step2")

        # --- resumed run C --------------------------------------------------
        trainer_c = _make_trainer(dir_c)
        trainer_c.train(resume_from_checkpoint=True)
        losses_c = _step_losses(dir_c)
        # Steps 1-2 happened before the kill; 3..8 must match A exactly.
        assert set(losses_c) == set(range(3, EPOCHS * STEPS_PER_EPOCH + 1))
        for s in range(3, EPOCHS * STEPS_PER_EPOCH + 1):
            assert losses_c[s] == losses_a[s], (
                f"step {s}: resumed loss {losses_c[s]} != {losses_a[s]}")

        # Final params bit-identical to the uninterrupted run.
        flat_a = jax.tree_util.tree_leaves(trainer_a.state.params)
        flat_c = jax.tree_util.tree_leaves(trainer_c.state.params)
        assert len(flat_a) == len(flat_c)
        for la, lc in zip(flat_a, flat_c):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))

        # Epoch-0 train_loss (loss accumulator restored mid-epoch) matches.
        def epoch_losses(d):
            out = {}
            with open(os.path.join(d, "logs.jsonl")) as f:
                for line in f:
                    rec = json.loads(line)
                    if "train_loss" in rec:
                        out[rec["epoch"]] = rec["train_loss"]
            return out

        ea, ec = epoch_losses(dir_a), epoch_losses(dir_c)
        assert ea[0] == pytest.approx(ec[0], rel=1e-6)
        assert ea[1] == pytest.approx(ec[1], rel=1e-6)

    def test_boundary_resume_still_works(self, tmp_path):
        """Epoch-boundary resume (the pre-existing path) under the new
        checkpoint naming/sort."""
        dir_a = tmp_path / "full"
        _make_trainer(dir_a).train()

        dir_b = tmp_path / "boundary"
        os.makedirs(dir_b)
        shutil.copytree(dir_a / "checkpoint-0", dir_b / "checkpoint-0")
        trainer_b = _make_trainer(dir_b)
        trainer_b.train(resume_from_checkpoint=True)
        losses_a, losses_b = _step_losses(dir_a), _step_losses(dir_b)
        for s in range(STEPS_PER_EPOCH + 1, EPOCHS * STEPS_PER_EPOCH + 1):
            assert losses_b[s] == losses_a[s]

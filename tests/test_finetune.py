"""End-to-end finetune workflow test: pretrained checkpoint (reference
PyTorch format) -> embedding/recovery replacement for new channel counts ->
short training with the dedicated embeddings/time-embedding learning rates."""

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

from poseidon_tpu import ScOT
from poseidon_tpu.hub import from_pretrained, load_config
from poseidon_tpu.metrics import compute_channel_group_metrics
from poseidon_tpu.training import Trainer, TrainingArguments


@pytest.fixture(scope="module")
def pretrained_dir(tmp_path_factory):
    torch.manual_seed(0)
    tcfg = TorchScOTConfig(
        image_size=16, patch_size=2, num_channels=2, num_out_channels=2,
        embed_dim=16, depths=[1, 1], num_heads=[2, 2],
        skip_connections=[1, 0], window_size=4, mlp_ratio=2.0, qkv_bias=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, hidden_act="gelu", use_absolute_embeddings=False,
        initializer_range=0.02, layer_norm_eps=1e-5, p=1,
        channel_slice_list_normalized_loss=[0, 1, 2],
        residual_model="convnext", use_conditioning=True, learn_residual=False)
    tmodel = TorchScOT(tcfg)
    d = tmp_path_factory.mktemp("pretrained")
    torch.save(tmodel.state_dict(), d / "pytorch_model.bin")
    with open(d / "config.json", "w") as f:
        json.dump(tcfg.to_dict(), f)
    return str(d)


class FinetuneDataset:
    def __init__(self, channels=3):
        rng = np.random.default_rng(1)
        self.x = rng.normal(size=(16, channels, 16, 16)).astype(np.float32)
        self.t = rng.uniform(0.1, 1.0, 16).astype(np.float32)
        self.channel_slice_list = [0, 1, channels]
        self.printable_channel_description = ["a", "rest"]

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return {"pixel_values": self.x[i], "labels": self.x[i] * 0.5,
                "time": self.t[i]}


class TestFinetuneWorkflow:
    def test_replace_and_train(self, pretrained_dir, tmp_path):
        # new task: 3 channels instead of 2 -> replaced embeddings/recovery
        new_cfg = load_config(pretrained_dir).replace(
            num_channels=3, num_out_channels=3,
            channel_slice_list_normalized_loss=(0, 1, 3))
        model, variables, replaced = from_pretrained(
            pretrained_dir, config=new_cfg, ignore_mismatched_sizes=True)
        assert replaced  # embeddings/recovery re-initialized

        ds = FinetuneDataset()
        args = TrainingArguments(
            output_dir=str(tmp_path), train_batch_size=8, eval_batch_size=8,
            num_train_epochs=2, learning_rate=5e-5,
            learning_rate_embedding_recovery=5e-4,
            learning_rate_time_embedding=5e-4, weight_decay=1e-6,
            max_grad_norm=5.0, compute_dtype="float32", num_workers=2,
            report_to="none")
        metrics_fn = lambda p, l: compute_channel_group_metrics(
            p, l, ds.channel_slice_list, ds.printable_channel_description)
        trainer = Trainer(model, args, train_dataset=ds, eval_dataset=ds,
                          compute_metrics=metrics_fn, variables=variables)
        history = trainer.train()
        assert len(history) == 2
        assert np.isfinite(history[-1]["train_loss"])
        assert history[-1]["train_loss"] < history[0]["train_loss"] * 1.5

        # the 4-group optimizer actually carries 4 groups
        from poseidon_tpu.training.optimizer import label_params

        labels = label_params(variables["params"], True, True)
        import jax

        groups = set(jax.tree.leaves(labels))
        assert groups == {"decay", "no_decay", "embeddings", "time_embedding"}

"""Worker for the REAL 2-process multihost test (tests/test_multihost.py).

Run as::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python tests/_multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form the 8-device
global mesh the single-process tests use. ``run_trial`` is also imported by
the pytest process (single-process, 8 local devices) to produce the golden
values — the global computation must be identical either way."""

import json
import sys


def run_trial(tmpdir: str) -> dict:
    import numpy as np

    import jax

    from poseidon_tpu import ScOT, make_config
    from poseidon_tpu.metrics import ChannelGroupMetrics
    from poseidon_tpu.parallel.host import broadcast_object, process_count
    from poseidon_tpu.parallel.mesh import make_mesh
    from poseidon_tpu.training import Trainer, TrainingArguments

    class DecayDataset:
        """label = input * exp(-t), deterministic per index."""

        resolution = 16
        input_dim = 2
        output_dim = 2
        channel_slice_list = [0, 1, 2]
        printable_channel_description = ["u", "c"]

        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            rng = np.random.default_rng(1000 + i)
            x = rng.normal(size=(2, 16, 16)).astype(np.float32)
            t = np.float32(0.1 + 0.8 * (i % 7) / 7)
            y = x.copy()
            y[0] = x[0] * np.exp(-t)
            return {"pixel_values": x, "labels": y, "time": t}

    cfg = make_config(
        "T", image_size=16, patch_size=2, num_channels=2, num_out_channels=2,
        embed_dim=16, depths=(1, 1), num_heads=(2, 2), skip_connections=(1, 0),
        window_size=4, mlp_ratio=2.0, channel_slice_list=(0, 1, 2),
        use_conditioning=True)
    model = ScOT(config=cfg)
    mesh = make_mesh(num_data=4, num_model=2)
    args = TrainingArguments(
        output_dir=tmpdir, train_batch_size=8, eval_batch_size=8,
        num_train_epochs=1, learning_rate=1e-3, weight_decay=1e-6,
        compute_dtype="float32", num_workers=2, report_to="none",
        num_model_shards=2)
    # eval set size 12: NOT divisible by the global batch (8), so the second
    # batch is padded and the _valid_global trim path is exercised.
    train_ds, eval_ds = DecayDataset(16), DecayDataset(12)
    trainer = Trainer(model, args, train_dataset=train_ds,
                      eval_dataset=eval_ds,
                      compute_metrics=ChannelGroupMetrics(
                          eval_ds.channel_slice_list,
                          eval_ds.printable_channel_description),
                      mesh=mesh)

    out = {"processes": process_count(),
           "broadcast": broadcast_object(f"hello-{0}")}

    # One real optimizer step through _device_batch (the multihost branch
    # routes through jax.make_array_from_process_local_data).
    from poseidon_tpu.data.loader import DataLoader

    loader = DataLoader(train_ds, 8, shuffle=True, seed=0, drop_last=True,
                        num_hosts=process_count(),
                        host_id=jax.process_index(), num_workers=2)
    batch = next(iter(loader.epoch(0)))
    batch.pop("_valid", None), batch.pop("_valid_global", None)
    dbatch = trainer._device_batch(batch)
    state, metrics = jax.jit(trainer._train_step)(
        trainer.state, dbatch, jax.random.PRNGKey(0))
    trainer.state = state
    out["train_loss"] = float(metrics["loss"])

    # Streamed evaluate: exercises the allgather + global-valid trim.
    ev = trainer.evaluate(eval_ds)
    out["eval_loss"] = ev["loss"]
    out["eval_median"] = ev["u/median_relative_l1_error"]

    # Materialized path: predictions allgathered and trimmed to the GLOBAL
    # valid count on every host.
    preds, labels, loss = trainer._predict_arrays(eval_ds)
    out["pred_shape"] = list(preds.shape)
    out["pred_loss"] = loss
    out["pred_sum"] = float(np.float64(np.abs(preds).sum()))
    return out


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import tempfile

    out = run_trial(tempfile.mkdtemp(prefix=f"mh{pid}_"))
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

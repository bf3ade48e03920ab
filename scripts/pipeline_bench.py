"""End-to-end input-pipeline benchmark (VERDICT r3 item 2).

Proves the DataLoader -> collate -> H2D -> train-step path at production
rate on the real TPU chip, against bench.py's device-resident number:

1. generates full-shape synthetic HDF5 for the 6-dataset fluids mix
   (configs/pretrain_fluids.yaml) — sparse files: the split's full (20000 /
   10000)-row shape, with only the trajectories the run reads written;
2. measures the standalone loader (DataLoader + collate, no device) with the
   native OpenMP collate and with the numpy fallback;
3. measures host->device transfer bandwidth for one batch (through the
   axon tunnel on this dev setup — recorded separately because the tunnel,
   not PCIe, can cap it);
4. runs >=200 real loader-fed train steps (ScOT-B, pallas, bf16, the
   bench.py configuration) with the Trainer's double-buffered prefetch and
   reports steady-state step time vs the device-resident bench.

Writes PIPELINE_r04.json at the repo root.

Usage:  python scripts/pipeline_bench.py  [--steps 200] [--batch 128]
        [--data_dir /tmp/pipeline_data] [--skip_gen] [--loader_only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIX = [
    "fluids.incompressible.BrownianBridge",
    "fluids.incompressible.Gaussians",
    "fluids.incompressible.Sines",
    "fluids.incompressible.PiecewiseConstants",
    "fluids.incompressible.VortexSheet",
    "fluids.compressible.Riemann",
]
FILES = {  # file -> (hdf5 key, channels)
    "NS-BB.nc": ("velocity", 2), "NS-Gauss.nc": ("velocity", 2),
    "NS-Sines.nc": ("velocity", 2), "NS-PwC.nc": ("velocity", 2),
    "NS-SVS.nc": ("velocity", 2), "CE-RP.nc": ("data", 4),
}
N_MAX = {"CE-RP.nc": 10000}  # others 20000
T = 15  # defaults read t1,t2 <= 14 (max_num_time_steps 7 x step 2)


def generate(data_dir: str, num_traj: int) -> None:
    import h5py

    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for fname, (key, c) in FILES.items():
        path = os.path.join(data_dir, fname)
        if os.path.exists(path):
            continue
        n = N_MAX.get(fname, 20000)
        t0 = time.perf_counter()
        with h5py.File(path, "w") as f:
            ds = f.create_dataset(key, shape=(n, T, c, 128, 128), dtype="f4",
                                  chunks=(1, 1, 1, 128, 128))
            for i in range(num_traj):
                ds[i] = rng.standard_normal((T, c, 128, 128), np.float32)
        print(f"# wrote {fname}: {num_traj}/{n} trajectories in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)


def build_mix(data_dir: str, num_traj: int):
    from poseidon_tpu.data.registry import get_dataset

    return get_dataset(MIX, which="train", num_trajectories=num_traj,
                       data_path=data_dir)


def bench_loader(dataset, batch: int, n_batches: int, use_native: bool) -> float:
    """Standalone loader samples/s (collate included, no device)."""
    from poseidon_tpu.data import native
    from poseidon_tpu.data.loader import DataLoader

    saved = (native._LIB, native._TRIED)
    if not use_native:
        native._LIB, native._TRIED = None, True
    try:
        loader = DataLoader(dataset, batch, shuffle=True, seed=0,
                            drop_last=True, num_workers=8)
        it = loader.epoch(0)
        for _ in range(5):  # warmup (thread pool spin-up, page cache)
            next(it)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        it.close()
        return batch * n_batches / dt
    finally:
        native._LIB, native._TRIED = saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--num_traj", type=int, default=160)
    ap.add_argument("--data_dir", default="/tmp/pipeline_data")
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--loader_only", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PIPELINE_r04.json"))
    args = ap.parse_args()

    if not args.skip_gen:
        generate(args.data_dir, args.num_traj)

    mix = build_mix(args.data_dir, args.num_traj)
    n_samples = len(mix)
    print(f"# mix: {n_samples} samples/epoch", file=sys.stderr, flush=True)
    result = {"mix_samples_per_epoch": n_samples,
              "batch": args.batch, "steps": args.steps}

    # --- standalone loader ---------------------------------------------------
    from poseidon_tpu.data import native as native_mod

    result["native_collate_available"] = native_mod.available()
    result["loader_samples_per_sec_native"] = round(
        bench_loader(mix, args.batch, 30, use_native=True), 1)
    result["loader_samples_per_sec_numpy"] = round(
        bench_loader(mix, args.batch, 30, use_native=False), 1)
    print(f"# loader: native {result['loader_samples_per_sec_native']} "
          f"numpy {result['loader_samples_per_sec_numpy']} samples/s",
          file=sys.stderr, flush=True)

    if args.loader_only:
        print(json.dumps(result, indent=2))
        return

    # --- device path ----------------------------------------------------------
    import jax
    import jax.numpy as jnp
    import optax

    from poseidon_tpu import ScOT, make_config, scot_loss
    from poseidon_tpu.models.scot import apply_pixel_mask
    from poseidon_tpu.training.optimizer import build_optimizer
    from poseidon_tpu.utils.init import enable_compilation_cache, shape_variables

    enable_compilation_cache()

    # H2D bandwidth probe: one batch worth of input+label bytes.
    probe = np.random.default_rng(0).standard_normal(
        (args.batch, 4, 128, 128)).astype(np.float32)
    for _ in range(2):
        t0 = time.perf_counter()
        a = jax.device_put(probe)
        float(jnp.sum(a[0, 0, 0, :2]))  # value fetch = real barrier
        h2d_s = time.perf_counter() - t0
    result["h2d_ms_per_32mb"] = round(h2d_s * 1e3, 1)
    result["h2d_gbps"] = round(probe.nbytes / h2d_s / 1e9, 2)
    print(f"# H2D: {result['h2d_ms_per_32mb']} ms / 32MB "
          f"({result['h2d_gbps']} GB/s)", file=sys.stderr, flush=True)

    cfg = make_config("B", image_size=128, num_channels=4, num_out_channels=4,
                      channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                      score_dtype="bfloat16", attention_impl="pallas")
    model = ScOT(config=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((args.batch, 4, 128, 128), jnp.float32)
    t0_ = jnp.zeros((args.batch,), jnp.float32)
    variables = shape_variables(model, x0, t0_, fill="normal")
    params = variables["params"]
    tx = build_optimizer(params, learning_rate=1e-4, total_steps=10_000,
                         weight_decay=1e-6, lr_scheduler_type="cosine",
                         warmup_ratio=0.02, max_grad_norm=5.0)
    opt_state = jax.jit(tx.init)(params)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            pred = model.apply({"params": p}, batch["pixel_values"],
                               batch["time"])
            pred = apply_pixel_mask(pred, batch["labels"], batch["pixel_mask"])
            return scot_loss(pred, batch["labels"], cfg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    from poseidon_tpu.data.loader import DataLoader

    loader = DataLoader(mix, args.batch, shuffle=True, seed=0, drop_last=True,
                        num_workers=8)

    def device_batches(epoch_iter):
        """One-batch H2D lookahead (the Trainer's double buffering)."""
        from concurrent.futures import ThreadPoolExecutor

        def put(b):
            return {k: jax.device_put(v) for k, v in b.items()
                    if not k.startswith("_")}

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = None
            for b in epoch_iter:
                nxt = pool.submit(put, b)
                if fut is not None:
                    yield fut.result()
                fut = nxt
            if fut is not None:
                yield fut.result()

    t0 = time.perf_counter()
    print("# compiling loader-fed train step...", file=sys.stderr, flush=True)
    warm = 3
    times = []
    n_done = 0
    window_t0 = None
    epoch = 0
    while n_done < args.steps + warm:
        for dbatch in device_batches(loader.epoch(epoch)):
            params, opt_state, loss = step(params, opt_state, dbatch)
            n_done += 1
            if n_done == warm:
                float(loss)  # end of compile+warmup
                result["compile_plus_warmup_s"] = round(time.perf_counter() - t0, 1)
                print(f"# warmup done in {result['compile_plus_warmup_s']}s",
                      file=sys.stderr, flush=True)
                window_t0 = time.perf_counter()
                window_n = 0
            elif n_done > warm:
                window_n += 1
                if window_n % 20 == 0:
                    float(loss)  # bounded pipeline depth, like logging
                    now = time.perf_counter()
                    times.append((now - window_t0) / 20)
                    window_t0 = now
            if n_done >= args.steps + warm:
                break
        epoch += 1

    step_time = float(np.median(times))
    result["pipeline_step_time_ms"] = round(step_time * 1e3, 2)
    result["pipeline_samples_per_sec"] = round(args.batch / step_time, 1)
    result["per_window_step_ms"] = [round(t * 1e3, 1) for t in times]
    result["loss"] = float(loss)
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()

"""Host-dispatch overhead vs device-resident throughput (VERDICT r3 item 1).

Round-2 accounting mismatch: the per-op device timeline sums to ~118 ms for
the flagship step, but the dispatch-loop wall measurement says ~152 ms. This
probe separates program time from host/tunnel overhead by timing the SAME
train step two ways:

  A. dispatch-loop — one jit call per step, scalar fetch per 10-step window
     (bench.py's historical measurement). Each call pays host arg handling +
     remote-tunnel dispatch from this 1-core host.
  B. device-loop — ``lax.scan`` of K steps inside ONE jit (the shape of a
     production TPU inner loop: log every K steps, not every step). The
     device runs K steps back-to-back with zero host involvement.

B-time / K is the true per-step program cost; A minus B is pure dispatch
overhead, not program time.

Run (quiet host!): python scripts/step_overhead_probe.py [--batch 96] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--k", type=int, default=10, help="steps per device loop")
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--attention_impl", default="pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from poseidon_tpu import ScOT, make_config, scot_loss
    from poseidon_tpu.models.scot import apply_pixel_mask
    from poseidon_tpu.training.optimizer import build_optimizer
    from poseidon_tpu.utils.init import enable_compilation_cache, shape_variables

    enable_compilation_cache()
    batch = args.batch
    cfg = make_config("B", image_size=128, num_channels=4, num_out_channels=4,
                      channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                      score_dtype="bfloat16", attention_impl=args.attention_impl)
    model = ScOT(config=cfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 4, 128, 128), jnp.float32)
    t = jnp.full((batch,), 0.5, jnp.float32)
    labels = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 128, 128),
                               jnp.float32)
    pixel_mask = jnp.zeros((batch, 4), bool).at[:, 3].set(True)

    variables = shape_variables(model, x, t, fill="normal")
    params = variables["params"]
    tx = build_optimizer(
        params, learning_rate=1e-4, total_steps=10_000, weight_decay=1e-6,
        lr_scheduler_type="cosine", warmup_ratio=0.0, max_grad_norm=5.0)
    opt_state = jax.jit(tx.init)(params)

    def train_step(params, opt_state, x, t, labels):
        def loss_fn(p):
            pred = model.apply({"params": p}, x, t)
            pred = apply_pixel_mask(pred, labels, pixel_mask)
            return scot_loss(pred, labels, cfg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    # --- A: dispatch loop (bench.py historical) -----------------------------
    step = jax.jit(train_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    step_c = step.lower(params, opt_state, x, t, labels).compile()
    print(f"# single-step compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    float(loss)

    a_windows = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.k):
            params, opt_state, loss = step(params, opt_state, x, t, labels)
        float(loss)
        a_windows.append((time.perf_counter() - t0) / args.k)
    a_ms = float(np.median(a_windows)) * 1e3

    # --- B: device loop (scan of K steps in one jit) ------------------------
    def k_steps(params, opt_state):
        def body(carry, _):
            p, s = carry
            p2, s2, loss = train_step(p, s, x, t, labels)
            return (p2, s2), loss

        (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=args.k)
        return p, s, losses[-1]

    kstep = jax.jit(k_steps, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    kstep_c = kstep.lower(params, opt_state).compile()
    print(f"# {args.k}-step scan compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    params, opt_state, loss = kstep(params, opt_state)
    float(loss)  # warmup + barrier

    b_windows = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        params, opt_state, loss = kstep(params, opt_state)
        float(loss)
        b_windows.append((time.perf_counter() - t0) / args.k)
    b_ms = float(np.median(b_windows)) * 1e3

    flops = float(step_c.cost_analysis().get("flops", float("nan")))
    from poseidon_tpu.utils.device import tpu_spec

    peak = tpu_spec().peak_bf16_flops
    print(json.dumps({
        "batch": batch, "k": args.k,
        "dispatch_loop_ms": round(a_ms, 2),
        "device_loop_ms": round(b_ms, 2),
        "dispatch_overhead_ms": round(a_ms - b_ms, 2),
        "device_loop_samples_per_s": round(batch / (b_ms / 1e3), 1),
        "device_loop_mfu": round(flops / (b_ms / 1e3) / peak, 4),
        "a_windows_ms": [round(w * 1e3, 2) for w in a_windows],
        "b_windows_ms": [round(w * 1e3, 2) for w in b_windows],
    }), flush=True)


if __name__ == "__main__":
    main()

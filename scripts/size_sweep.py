"""Throughput across the model family (MODEL_MAP T/S/B/L) — one v5e chip,
128^2 pretraining step, bf16 + fused pallas attention.

Run ALONE: PYTHONPATH=/root/.axon_site:/root/repo python scripts/size_sweep.py
"""

import json
import time

import jax
import jax.numpy as jnp
import optax

from poseidon_tpu import ScOT, make_config, scot_loss
from poseidon_tpu.models.scot import apply_pixel_mask
from poseidon_tpu.training.optimizer import build_optimizer
from poseidon_tpu.utils.init import enable_compilation_cache, shape_variables

enable_compilation_cache()
PEAK = 197e12


def measure(size, batch):
    cfg = make_config(size, image_size=128, num_channels=4, num_out_channels=4,
                      channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                      score_dtype="bfloat16", attention_impl="pallas")
    model = ScOT(config=cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 4, 128, 128), jnp.float32)
    t = jnp.full((batch,), 0.5, jnp.float32)
    labels = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 128, 128), jnp.float32)
    pixel_mask = jnp.zeros((batch, 4), bool).at[:, 3].set(True)
    variables = shape_variables(model, x[:1], t[:1], fill="normal")
    params = variables["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    tx = build_optimizer(params, learning_rate=1e-4, total_steps=10_000,
                         weight_decay=1e-6, max_grad_norm=5.0)
    opt_state = jax.jit(tx.init)(params)

    def train_step(params, opt_state, x, t, labels):
        def loss_fn(p):
            pred = model.apply({"params": p}, x, t)
            pred = apply_pixel_mask(pred, labels, pixel_mask)
            return scot_loss(pred, labels, cfg)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    compiled = step.lower(params, opt_state, x, t, labels).compile()
    compile_s = time.perf_counter() - t0
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    float(loss)
    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"size": size, "batch": batch,
                      "params_m": round(n_params / 1e6, 1),
                      "step_ms": round(dt * 1e3, 2),
                      "samples_per_s": round(batch / dt, 1),
                      "mfu": round(flops / dt / PEAK, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)
    del params, opt_state, compiled


if __name__ == "__main__":
    import sys
    runs = [("T", 96), ("S", 96), ("B", 96), ("L", 48), ("L", 64)]
    which = sys.argv[1] if len(sys.argv) > 1 else None
    for size, batch in runs:
        if which and f"{size}{batch}" != which and size != which:
            continue
        try:
            measure(size, batch)
        except Exception as e:
            print(json.dumps({"size": size, "error": repr(e)[:200]}), flush=True)

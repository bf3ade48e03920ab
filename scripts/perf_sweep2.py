"""Sweep 2: scan_blocks compile/step time, pallas attention, ablations.

Run: PYTHONPATH=/root/repo nohup python scripts/perf_sweep2.py > /tmp/sweep2.txt 2>&1 &
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


def measure(tag, batch=32, iters=30, remat=False, **cfg_over):
    base = dict(image_size=128, num_channels=4, num_out_channels=4,
                channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                scan_blocks=True)
    base.update(cfg_over)
    cfg = make_config("B", **base)
    model = ScOT(config=cfg, dtype=jnp.bfloat16, remat=remat)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 4, 128, 128), jnp.float32)
    t = jnp.full((batch,), 0.5, jnp.float32)
    labels = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 128, 128), jnp.float32)
    pixel_mask = jnp.zeros((batch, 4), bool).at[:, 3].set(True)
    variables = shape_variables(model, x[:1], t[:1], fill="normal")
    params = variables["params"]
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
    params, opt_state, loss = step(params, opt_state, x, t, labels)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "batch": batch,
                      "step_ms": round(dt * 1e3, 2),
                      "samples_per_s": round(batch / dt, 1),
                      "compile_s": round(compile_s, 1),
                      "loss": float(loss)}), flush=True)


if __name__ == "__main__":
    runs = [
        ("scan_b32", dict()),
        ("scan_pallas_b32", dict(attention_impl="pallas")),
        ("scan_no_cond", dict(use_conditioning=False)),
        ("scan_no_skipblocks", dict(skip_connections=(0, 0, 0, 0))),
    ]
    for tag, over in runs:
        try:
            measure(tag, **over)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": repr(e)[:300]}), flush=True)

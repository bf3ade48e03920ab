"""Sweep 3 (round 2): batch scaling, remat, scan_blocks, pallas attention —
full ScOT-B train step on one chip.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_sweep3.py
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


def measure(tag, batch=48, iters=20, remat=False, **cfg_over):
    base = dict(image_size=128, num_channels=4, num_out_channels=4,
                channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                score_dtype="bfloat16", scan_blocks=False)
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
    compiled = step.lower(params, opt_state, x, t, labels).compile()
    compile_s = time.perf_counter() - t0
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    mfu = flops / dt / PEAK
    print(json.dumps({"tag": tag, "batch": batch,
                      "step_ms": round(dt * 1e3, 2),
                      "samples_per_s": round(batch / dt, 1),
                      "mfu": round(mfu, 4),
                      "compile_s": round(compile_s, 1),
                      "loss": float(loss)}), flush=True)
    del params, opt_state, compiled


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    runs = {
        "b48": dict(batch=48),
        "b96": dict(batch=96),
        "b96_remat": dict(batch=96, remat=True),
        "b128": dict(batch=128),
        "b192_remat": dict(batch=192, remat=True),
        "b96_scan_remat": dict(batch=96, remat=True, scan_blocks=True),
        "b48_pallas": dict(batch=48, attention_impl="pallas"),
        "b96_pallas": dict(batch=96, attention_impl="pallas"),
        "b128_pallas": dict(batch=128, attention_impl="pallas"),
        "b96_scan_pallas": dict(batch=96, attention_impl="pallas", scan_blocks=True),
        "b96_scan_remat_pallas": dict(batch=96, attention_impl="pallas",
                                      scan_blocks=True, remat=True),
    }
    for tag, over in runs.items():
        if which != "all" and which != tag:
            continue
        try:
            measure(tag, **over)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": repr(e)[:300]}), flush=True)

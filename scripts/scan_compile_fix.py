"""scan_blocks TPU compile-crash investigation (VERDICT r2 item 2).

Known failure (round 1/2): scan_blocks=True + non-remat backward + optimizer
in ONE jit reliably kills the remote TPU compiler (HTTP 500). Unrolled
configs compile in ~383 s. This script compiles + times one variant per
invocation (concurrent remote compiles also crash the compile helper):

    python scripts/scan_compile_fix.py <variant>

variants:
    unrolled  — scan_blocks=False (baseline; the 383-s compile)
    crash     — scan_blocks=True, no remat, one jit (expected: compiler 500)
    saveall   — scan_blocks=True, remat="save_all" (structured per-block
                backward, everything_saveable policy: NO recompute, same
                FLOPs as non-remat)
    savedots  — scan_blocks=True, remat="save_dots" (stash matmul outputs,
                recompute elementwise/norms only)
    remat     — scan_blocks=True, remat=True (recompute backward)
    split     — scan_blocks=True, no remat, grads-jit + optimizer-jit

FINDINGS (round 3, recorded as they land):
  - "crash" is NOT a compiler bug: the remote helper's HTTP 500 wraps an
    HBM OOM — 19.49G needed vs 15.75G, unpadded only 5.23G but 72.9%
    FRAGMENTATION from the scan-stacked residual buffers (dozens of
    288MB/144MB broadcast-of-constant stacked-zeros init buffers).
  - "saveall" (everything_saveable) keeps the same residual set -> OOMs
    identically (19.50G). The fix must SHRINK the stash, not restructure it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(variant: str):
    import jax
    import jax.numpy as jnp
    import optax

    from poseidon_tpu import ScOT, make_config, scot_loss
    from poseidon_tpu.models.scot import apply_pixel_mask
    from poseidon_tpu.training.optimizer import build_optimizer
    from poseidon_tpu.utils.init import enable_compilation_cache, shape_variables

    enable_compilation_cache()

    batch = 96
    scan = variant != "unrolled"
    remat = {"saveall": "save_all", "savedots": "save_dots",
             "remat": True}.get(variant, False)
    cfg = make_config("B", image_size=128, num_channels=4, num_out_channels=4,
                      channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                      score_dtype="bfloat16", attention_impl="pallas",
                      scan_blocks=scan)
    model = ScOT(config=cfg, dtype=jnp.bfloat16, remat=remat)

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

    def loss_fn(p):
        pred = model.apply({"params": p}, x, t)
        pred = apply_pixel_mask(pred, labels, pixel_mask)
        return scot_loss(pred, labels, cfg)

    if variant == "split":
        def grad_step(params):
            return jax.value_and_grad(loss_fn)(params)

        def opt_step(grads, opt_state, params):
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2

        gstep = jax.jit(grad_step)
        ostep = jax.jit(opt_step, donate_argnums=(0, 1, 2))

        t0 = time.perf_counter()
        cg = gstep.lower(params).compile()
        co = ostep.lower(jax.eval_shape(lambda p: p, params), opt_state,
                         params).compile()
        compile_s = time.perf_counter() - t0
        flops = float(cg.cost_analysis().get("flops", float("nan")))

        def step(params, opt_state):
            loss, grads = gstep(params)
            params, opt_state = ostep(grads, opt_state, params)
            return params, opt_state, loss
    else:
        def train_step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        jstep = jax.jit(train_step, donate_argnums=(0, 1))
        t0 = time.perf_counter()
        print(f"# [{variant}] lowering+compiling...", file=sys.stderr, flush=True)
        compiled = jstep.lower(params, opt_state).compile()
        compile_s = time.perf_counter() - t0
        flops = float(compiled.cost_analysis().get("flops", float("nan")))
        step = jstep

    print(f"# [{variant}] compile {compile_s:.1f}s", file=sys.stderr, flush=True)

    for _ in range(3):
        params, opt_state, loss = step(params, opt_state)
    loss0 = float(loss)

    import numpy as np

    windows = []
    for _ in range(5):
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state)
        float(loss)
        windows.append((time.perf_counter() - t0) / iters)
    step_ms = float(np.median(windows)) * 1e3

    print(json.dumps({
        "variant": variant, "compile_s": round(compile_s, 1),
        "step_ms": round(step_ms, 2),
        "samples_per_s": round(batch / (step_ms / 1e3), 1),
        "flops": flops, "loss_after_3": loss0,
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1])

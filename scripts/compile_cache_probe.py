"""Warm-compile probe (VERDICT r3 item 6): does the persistent JAX
compilation cache shortcut a SECOND process's compile of the same jitted
train step on this backend?

Runs a ScOT-T train-step compile (small enough to finish in ~1-2 min) and
prints the compile time; run it twice — the second run's time tells the
warm-start story. The axon backend compiles TERMINAL-SIDE (remote_compile=1
in the sitecustomize), so the question is whether the serialized executable
round-trips through jax's persistent cache.

Usage: python scripts/compile_cache_probe.py [--size T] [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="T")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from poseidon_tpu import ScOT, make_config, scot_loss
    from poseidon_tpu.training.optimizer import build_optimizer
    from poseidon_tpu.utils.init import enable_compilation_cache, shape_variables

    enable_compilation_cache()
    cfg = make_config(args.size, image_size=128, num_channels=4,
                      num_out_channels=4, channel_slice_list=(0, 1, 3, 4),
                      use_conditioning=True, score_dtype="bfloat16",
                      attention_impl="pallas")
    model = ScOT(config=cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (args.batch, 4, 128, 128))
    t = jnp.full((args.batch,), 0.5, jnp.float32)
    labels = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 4, 128, 128))
    variables = shape_variables(model, x, t, fill="normal")
    params = variables["params"]
    tx = build_optimizer(params, learning_rate=1e-4, total_steps=1000,
                         weight_decay=1e-6, max_grad_norm=5.0)
    opt_state = jax.jit(tx.init)(params)

    def train_step(params, opt_state, x, t, labels):
        def loss_fn(p):
            return scot_loss(model.apply({"params": p}, x, t), labels, cfg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    step.lower(params, opt_state, x, t, labels).compile()
    dt = time.perf_counter() - t0
    print(f"compile_s={dt:.1f} size={args.size} batch={args.batch} "
          f"backend={jax.default_backend()} "
          f"cache_dir={jax.config.jax_compilation_cache_dir}")


if __name__ == "__main__":
    main()

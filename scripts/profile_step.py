"""Capture a jax.profiler trace of the bench train step on the TPU, then
aggregate device time by python source line (trace events carry args.source).

Run: PYTHONPATH=/root/repo python scripts/profile_step.py [--batch 48]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

# Runnable as a bare subprocess (no PYTHONPATH): scripts/ is what python
# puts on sys.path, the package root is one level up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(batch, trace_dir, score_dtype="bfloat16", remat=False, scan_blocks=False, attention_impl="xla", fused_block_tail=True, model_size="B"):
    import jax
    import jax.numpy as jnp
    import optax

    from poseidon_tpu import ScOT, make_config, scot_loss
    from poseidon_tpu.models.scot import apply_pixel_mask
    from poseidon_tpu.training.optimizer import build_optimizer
    from poseidon_tpu.utils.init import enable_compilation_cache, shape_variables

    enable_compilation_cache()
    cfg = make_config(model_size, image_size=128, num_channels=4, num_out_channels=4,
                      channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                      score_dtype=score_dtype, scan_blocks=scan_blocks,
                      attention_impl=attention_impl,
                      fused_block_tail=fused_block_tail)
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
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    jax.block_until_ready(loss)
    step_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"step_time: {step_ms:.2f} ms (batch {batch})")

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    return step_ms


def analyze(trace_dir, top=40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find device-TensorCore pids
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in pid_name.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    by_src = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    nsteps = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # us
        args = e.get("args", {}) or {}
        if "run_id" in args or name.startswith("jit_train_step"):
            nsteps += 1
            continue
        src = args.get("source", "")
        # strip long prefixes
        src = src.replace("/root/repo/", "")
        key = src if src else name.split(".")[0]
        by_src[key] += dur
        by_op[name.split(".")[0].split("(")[0]] += dur
        total += dur
    print(f"\ntrace: {path}\ntotal device-op time: {total/1e3:.2f} ms over traced steps")
    print("\n== by source line ==")
    for k, v in by_src.most_common(top):
        print(f"{v/1e3:9.3f} ms  {v/total*100:5.1f}%  {k}")
    print("\n== by op family ==")
    for k, v in by_op.most_common(top):
        print(f"{v/1e3:9.3f} ms  {v/total*100:5.1f}%  {k}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--model", default="B")
    ap.add_argument("--trace_dir", default="/tmp/prof_step")
    ap.add_argument("--score_dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--scan_blocks", action="store_true")
    ap.add_argument("--attention_impl", default="xla")
    ap.add_argument("--no_fused_tail", action="store_true")
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        run_trace(args.batch, args.trace_dir, args.score_dtype, args.remat,
                  args.scan_blocks, args.attention_impl,
                  not args.no_fused_tail, model_size=args.model)
    analyze(args.trace_dir)

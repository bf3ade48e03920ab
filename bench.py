"""Benchmark: ScOT-B pretraining step throughput on one TPU chip.

Measures the full training step (fwd + bwd + AdamW with the 4-group optimizer,
bf16 compute / fp32 params) on the flagship configuration — ScOT-B, 128x128,
4-channel NS-style input, per-chip batch 128 (BENCH_BATCH to override) — and
prints ONE JSON line:
  {"metric": ..., "value": samples/sec, "unit": ..., "vs_baseline": ...}

vs_baseline reports measured model FLOP utilization (MFU) relative to the
45%-MFU north-star target from BASELINE.md (vs_baseline = MFU / 0.45).

The ``extra`` dict additionally carries the compile time (cold vs warm
persistent-cache story) and a ScOT-L measurement (``extra.scot_l``) so the
family-scaling claim (MFU tracks contraction width) is regression-tracked
every round. Set BENCH_SKIP_L=1 to skip the L entry.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _wait_for_backend(max_wait_s: float = 1800.0) -> None:
    """Block until the TPU backend answers a trivial computation.

    The remote ("axon") tunnel occasionally goes UNAVAILABLE for extended
    stretches (observed outages of several hours) and a probe from inside
    this process can HANG instead of raising — so probe from a killable
    SUBPROCESS with a hard timeout, and only touch the in-process backend
    once a probe has succeeded. The driver runs this script unattended."""
    import subprocess
    import sys

    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((8, 8)))))")
    deadline = time.perf_counter() + max_wait_s
    delay = 30.0
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=120,
                               capture_output=True)
            if r.returncode == 0:
                return
            reason = (r.stderr or b"").decode()[-200:].strip()
        except subprocess.TimeoutExpired:
            reason = "probe hung >120s"
        if time.perf_counter() >= deadline:
            raise RuntimeError(f"TPU backend unreachable for {max_wait_s:.0f}s "
                               f"(last: {reason})")
        print(f"# TPU backend unavailable ({reason or 'nonzero exit'}); "
              f"retrying in {delay:.0f}s", file=sys.stderr, flush=True)
        time.sleep(delay)
        delay = min(delay * 1.5, 180.0)


def _traced_device_span_ms(step, step_args, trace_dir: str):
    """Trace 2 steps with jax.profiler and reconstruct the per-step device
    span (the scripts/trace_accounting.py logic, reduced to the headline
    number). This makes the artifact of record LOAD-IMMUNE: the wall number
    on this 1-core host can silently inflate 2x under sustained load
    (BENCH_r04 regressed 15.8% from exactly that), while the device span is
    measured by the TPU itself. Returns (span_ms, updated_step_args) or
    (None, step_args) — a profiler hiccup must never sink the bench."""
    import glob
    import gzip
    import shutil

    import jax

    shutil.rmtree(trace_dir, ignore_errors=True)
    try:
        jax.profiler.start_trace(trace_dir)
        try:
            params, opt_state, rest = step_args[0], step_args[1], step_args[2:]
            for _ in range(2):
                params, opt_state, loss = step(params, opt_state, *rest)
            float(loss)  # value fetch = the only reliable barrier here
            step_args = (params, opt_state) + rest
        finally:
            jax.profiler.stop_trace()

        paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True)
        if not paths:
            return None, step_args
        with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
            events = json.load(f)["traceEvents"]

        pid_name, tid_name = {}, {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
        dev_pids = {p for p, n in pid_name.items()
                    if "TPU" in n or "Device" in n or "/device" in n.lower()}
        # The "XLA Modules" line holds one long event per executed module
        # (the jitted step span); "Steps" umbrella events are skipped.
        spans = []
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in dev_pids:
                continue
            name = tid_name.get((e["pid"], e.get("tid")), "")
            if "Steps" in name:
                continue
            if e["name"].startswith("jit_") or "Modules" in name:
                spans.append(e["dur"] / 1e3)
        if not spans:
            return None, step_args
        # Median traced step span in ms (2 steps traced; tiny warm-up jitter
        # on the first is rejected by the median of >=2).
        return float(np.median(spans)), step_args
    except Exception as e:
        import sys

        print(f"# device-span trace failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None, step_args
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def run_bench(size: str, batch: int, scan_len: int) -> dict:
    """Measure the full ScOT-<size> train step at the given per-chip batch;
    returns a dict of measurements (step time, samples/s, MFU, compile time).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from poseidon_tpu import ScOT, make_config, scot_loss
    from poseidon_tpu.models.scot import apply_pixel_mask
    from poseidon_tpu.training.optimizer import build_optimizer
    from poseidon_tpu.utils.init import shape_variables

    # Best measured config (round 3): unrolled stages, fused D-major Pallas
    # attention (fwd + recompute-bwd — no probability stash, so large batch
    # scales where the XLA path thrashes HBM), fused QKV, slice-based CPB,
    # bf16 compute, per-chip batch 128 (the step is device-bound; the bigger
    # batch amortizes the ~5 ms/step host+tunnel dispatch overhead better
    # than b96 at the same device-side samples/s: BENCH_r03 artifact of
    # record: 192.5 ms = 664.9 samples/s at b128, vs 649 at b96).
    # Progression: 167 (initial) -> 317 (fused QKV) -> 404 (slice CPB) ->
    # 468 (folded scale) -> 568 (bf16 scores, b48) -> 633 (D-major pallas
    # attention, b96) -> 649 (fused pallas MLP) -> 664.9 samples/s (b128).
    cfg = make_config(size, image_size=128, num_channels=4, num_out_channels=4,
                      channel_slice_list=(0, 1, 3, 4), use_conditioning=True,
                      score_dtype="bfloat16", attention_impl="pallas")
    model = ScOT(config=cfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 4, 128, 128), jnp.float32)
    t = jnp.full((batch,), 0.5, jnp.float32)
    labels = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, 128, 128), jnp.float32)
    pixel_mask = jnp.zeros((batch, 4), bool).at[:, 3].set(True)

    # Throughput doesn't depend on parameter values: materialize the variable
    # tree from eval_shape (instant) instead of compiling the init graph.
    variables = shape_variables(model, x, t, fill="normal")
    params = variables["params"]
    # Grouped optax chain is the production optimizer (a flat-buffer AdamW
    # A/B measured ~23 ms/step SLOWER at ScOT-B — r3 traces: ~29 ms of
    # optimizer ops vs ~6.6 ms for the chain — and was deleted in r5).
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
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    # scan_len > 0 runs K steps inside ONE jit via lax.scan (same batch
    # each step — throughput does not depend on data values). This removes
    # every per-step host round trip through the remote tunnel (step
    # dispatch AND per-custom-call dispatch, measured at 0-20 ms/step
    # load-dependent), i.e. it measures true device throughput the way a
    # production host with local chips would see it.
    if scan_len > 0:
        def train_scan(params, opt_state, x, t, labels):
            def body(carry, _):
                p, s = carry
                p2, s2, loss = train_step(p, s, x, t, labels)
                return (p2, s2), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=scan_len)
            return params, opt_state, losses[-1]

        step = jax.jit(train_scan, donate_argnums=(0, 1))
    else:
        step = jax.jit(train_step, donate_argnums=(0, 1))

    import sys

    t0 = time.perf_counter()
    print(f"# lowering+compiling ScOT-{size} train step...", file=sys.stderr,
          flush=True)
    compiled = step.lower(params, opt_state, x, t, labels).compile()
    compile_s = time.perf_counter() - t0
    print(f"# compile done in {compile_s:.1f}s", file=sys.stderr, flush=True)
    try:
        if scan_len > 0:
            # Neither the compiled scan's cost_analysis (counts the body
            # once for a plain matmul but 1.5x-ish for the full step) nor a
            # lowered pre-optimization analysis (undercounts ~5x) gives
            # trustworthy per-step flops, and compiling the single step just
            # for accounting costs a second multi-minute remote compile.
            # Scan mode is a step-TIME A/B diagnostic: take the flops from
            # BENCH_FLOPS (e.g. the value a scan_len=0 run printed) or
            # report MFU as null.
            flops_per_step = float(os.environ.get("BENCH_FLOPS", "nan"))
        else:
            flops_per_step = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_step = float("nan")
    print(f"# cost analysis done", file=sys.stderr, flush=True)

    # Warmup (3 steps). NOTE: through the remote tunnel only a scalar VALUE
    # fetch is a reliable execution barrier (block_until_ready on arrays can
    # return early); float(loss) forces the chain.
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, t, labels)
    float(loss)
    print(f"# warmup done", file=sys.stderr, flush=True)

    # Same-graph step time varies ~+-8% run-to-run on the shared dev TPU;
    # report the MEDIAN of several timing windows to reject transient noise.
    windows = []
    for _ in range(5):
        iters = max(1, 10 // max(scan_len, 1))
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, x, t, labels)
        float(loss)
        windows.append((time.perf_counter() - t0) / (iters * max(scan_len, 1)))

    step_time = float(np.median(windows))
    samples_per_sec = batch / step_time

    # Device-side companion number (load-immune; see _traced_device_span_ms).
    device_span_ms = None
    if scan_len == 0 and not os.environ.get("BENCH_SKIP_TRACE"):
        device_span_ms, (params, opt_state, x, t, labels) = \
            _traced_device_span_ms(step, (params, opt_state, x, t, labels),
                                   f"/tmp/bench_trace_{size}_{batch}")

    # Peak bf16 throughput derived from the device generation (v5e: 197e12).
    from poseidon_tpu.utils.device import tpu_spec

    dev = jax.devices()[0]
    peak = tpu_spec(dev).peak_bf16_flops
    kind = getattr(dev, "device_kind", "unknown")
    mfu = (flops_per_step / step_time) / peak if np.isfinite(flops_per_step) else float("nan")

    # Device-side derived metrics: when the wall number disagrees with the
    # device span by much more than the known ~5-8 ms single-core dispatch
    # overhead, the HOST was loaded and the wall number is poisoned — the
    # gap field makes that self-evident in the artifact (VERDICT r4 item 1).
    dev_mfu = (round((flops_per_step / (device_span_ms / 1e3)) / peak, 4)
               if device_span_ms and np.isfinite(flops_per_step) else None)
    return {
        "samples_per_sec": samples_per_sec,
        "step_time_ms": round(step_time * 1e3, 2),
        "mfu": round(mfu, 4) if np.isfinite(mfu) else None,
        "device_span_ms": (round(device_span_ms, 2)
                           if device_span_ms else None),
        "device_samples_per_sec": (round(batch / (device_span_ms / 1e3), 3)
                                   if device_span_ms else None),
        "device_mfu": dev_mfu,
        "wall_vs_device_gap_ms": (round(step_time * 1e3 - device_span_ms, 2)
                                  if device_span_ms else None),
        "flops_per_step": flops_per_step,
        "batch": batch,
        "model": size,
        "scan_len": scan_len,
        "compile_s": round(compile_s, 1),
        "device": str(kind),
        "loss": float(loss),
    }


def main():
    from poseidon_tpu.utils.init import enable_compilation_cache

    enable_compilation_cache()
    _wait_for_backend()

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    size = os.environ.get("BENCH_MODEL", "B")  # T/S/B/L (B = metric of record)
    scan_len = int(os.environ.get("BENCH_SCAN", "0"))

    res = run_bench(size, batch, scan_len)
    mfu = res["mfu"]
    extra = {
        "step_time_ms": res["step_time_ms"],
        "mfu": mfu,
        "device_span_ms": res["device_span_ms"],
        "device_samples_per_sec": res["device_samples_per_sec"],
        "device_mfu": res["device_mfu"],
        "wall_vs_device_gap_ms": res["wall_vs_device_gap_ms"],
        "flops_per_step": res["flops_per_step"],
        "batch": batch,
        "model": size,
        "scan_len": scan_len,
        "compile_s": res["compile_s"],
        "device": res["device"],
        "score_dtype": "bfloat16",
        "attention_impl": "pallas",
        "loss": res["loss"],
    }

    # Second, non-headline entry: ScOT-L (same code, wider contractions —
    # BASELINE.md's family-scaling claim) tracked as an artifact each round.
    if size == "B" and scan_len == 0 and not os.environ.get("BENCH_SKIP_L"):
        l_batch = int(os.environ.get("BENCH_L_BATCH", "64"))
        try:
            l_res = run_bench("L", l_batch, 0)
            l_res["samples_per_sec"] = round(l_res["samples_per_sec"], 3)
            extra["scot_l"] = l_res
        except Exception as e:  # the L entry must never sink the B metric
            extra["scot_l"] = {"error": f"{type(e).__name__}: {e}"}

    vs_baseline = mfu / 0.45 if mfu is not None else 0.0
    print(json.dumps({
        "metric": "samples_per_sec_per_chip_scot_b_pretrain",
        "value": round(res["samples_per_sec"], 3),
        "unit": "samples/s",
        "vs_baseline": round(vs_baseline, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()

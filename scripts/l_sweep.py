"""ScOT-L optimization sweep (VERDICT r4 item 2): measure the L train step
under the kernel-gate settings that were tuned on B's shapes and never
re-derived for L (embed_dim 192, head_dim 64, K=192..1536 GEMMs).

Variants (each in a fresh subprocess so env knobs + VMEM state are clean;
profile_step writes a trace, the parent reduces it to the per-step device
span with the trace_accounting timeline logic — wall numbers on this 1-core
host are load-poisonable, spans are not):

  base        pallas attention, bf16 scores (the bench config)
  mt128       + POSEIDON_MLP_MIN_TILE=128 — admits the fused D-major MLP
              kernel for L's stage-1 (C=384 lands at token tile 128, just
              under the B-derived 256 threshold: ops/mlp.py:805-810)
  b96         best-of-above at batch 96 (amortizes the 628.6M-param
              optimizer HBM sweep, ~21.5 ms/step: scripts/l_floor.py)

Run ALONE on the TPU: python scripts/l_sweep.py [--out /tmp/l_sweep.json]
"""

import argparse
import collections
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import trace_accounting as ta  # noqa: E402


def device_spans_ms(trace_dir):
    """Median (span, busy) over the traced steps, in ms."""
    _, events = ta.load_events(trace_dir)
    dev_pids, _, tid_name = ta.device_lines(events)
    per_line = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        per_line[(e["pid"], e.get("tid"))].append(e)
    step_events, op_events = [], []
    for key, evs in per_line.items():
        name = tid_name.get(key, "")
        if "Steps" in name:
            continue
        for e in evs:
            if e["name"].startswith("jit_") or "Modules" in name:
                step_events.append(e)
            else:
                op_events.append(e)
    spans, busys = [], []
    for se in sorted(step_events, key=lambda e: e["ts"]):
        s0, s1 = se["ts"], se["ts"] + se["dur"]
        inside = [(e["ts"], e["ts"] + e["dur"]) for e in op_events
                  if e["ts"] >= s0 - 1 and e["ts"] + e["dur"] <= s1 + 1]
        spans.append((s1 - s0) / 1e3)
        busys.append(ta.union_len(inside) / 1e3)
    spans.sort()
    busys.sort()
    mid = len(spans) // 2
    return (spans[mid], busys[mid]) if spans else (None, None)


def run_variant(name, batch, extra_args, env_extra, results, out, model="L"):
    trace_dir = f"/tmp/l_sweep_{model}_{name}"
    cmd = [sys.executable, "scripts/profile_step.py", "--model", model,
           "--batch", str(batch), "--attention_impl", "pallas",
           "--no_fused_tail", "--trace_dir", trace_dir] + extra_args
    env = dict(os.environ, **env_extra)
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       env=env, timeout=3600)
    wall_s = time.perf_counter() - t0
    m = re.search(r"step_time: ([\d.]+) ms", r.stdout)
    if r.returncode != 0 or not m:
        results[name] = {"error": (r.stdout + r.stderr)[-1500:],
                         "rc": r.returncode}
        print(f"# {name}: FAILED rc={r.returncode}", flush=True)
    else:
        span, busy = device_spans_ms(trace_dir)
        results[name] = {
            "batch": batch, "wall_step_ms": float(m.group(1)),
            "device_span_ms": span, "device_busy_ms": busy,
            "samples_per_sec_device": (round(batch / span * 1e3, 1)
                                       if span else None),
            "total_s": round(wall_s, 1), "args": extra_args,
            "env": env_extra}
        print(f"# {name}: wall {m.group(1)} ms, span {span and round(span,2)} "
              f"ms, busy {busy and round(busy,2)} ms", flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/l_sweep.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="L",
                    help="model size (the same gate A/Bs apply to B at b128)")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import _wait_for_backend

    _wait_for_backend(max_wait_s=6 * 3600)

    results = {}
    # Order: base first (its program is already in the persistent compile
    # cache from the bench L entry), then the combined candidate winner, then
    # the singles for attribution if time allows.
    variants = {
        "base": ([], {}),
        "mt128": ([], {"POSEIDON_MLP_MIN_TILE": "128"}),
        # atail and dmajor variants removed with their kernels/knobs
        # (measured negative at both geometries — r5 results in BASELINE.md).
    }
    only = set(args.only.split(",")) if args.only else None
    for name, (xargs, env) in variants.items():
        if only and name not in only:
            continue
        run_variant(name, args.batch, xargs, env, results, args.out,
                    model=args.model)

    # Best-of at batch 96 (L only: amortizes the optimizer HBM sweep; skip
    # if everything failed).
    ok = {k: v for k, v in results.items() if "device_span_ms" in v
          and v["device_span_ms"]}
    if ok and args.model == "L" and (only is None or "b96" in only):
        best = min(ok, key=lambda k: ok[k]["device_span_ms"])
        print(f"# best at b{args.batch}: {best}", flush=True)
        xargs, env = variants[best]
        run_variant(f"b96_{best}", 96, xargs, env, results, args.out,
                    model=args.model)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

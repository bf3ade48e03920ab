"""Complete per-step device-time accounting from a jax.profiler trace.

Unlike profile_step.analyze (which sums op durations and therefore misses
device IDLE time), this reconstructs the TensorCore timeline: per traced step
it reports the wall span, the busy time (union of op intervals), the idle gap
total, and a breakdown of busy time by op family and by python source line.
This is the tool that reconciles "sum of ops" vs "measured step time"
(VERDICT r2 weakness 1: 118 ms attributed vs 152 ms measured).

Run after scripts/profile_step.py wrote a trace:
    python scripts/trace_accounting.py --trace_dir /tmp/prof_r3
"""

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data["traceEvents"]


def device_lines(events):
    """Map (pid, tid) -> thread name for device-side op lines."""
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    return dev_pids, pid_name, tid_name


def union_len(intervals):
    if not intervals:
        return 0.0
    intervals.sort()
    total, cs, ce = 0.0, intervals[0][0], intervals[0][1]
    for s, e in intervals[1:]:
        if s > ce:
            total += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    return total + (ce - cs)


FAMILIES = (
    ("fusion", "fusion"),
    ("custom-call", "custom"),        # pallas kernels
    ("convolution", "conv"),
    ("dot", "dot"),
    ("copy", "copy"),
    ("transpose", "transpose"),
    ("bitcast", "bitcast"),
    ("reduce", "reduce"),
    ("dynamic-update-slice", "dus"),
    ("all-reduce", "collective"),
    ("fft", "fft"),
)


def family(name):
    low = name.lower()
    for pat, fam in FAMILIES:
        if pat in low:
            return fam
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/prof_r3")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    dev_pids, pid_name, tid_name = device_lines(events)
    print(f"trace: {path}")

    # Collect device X events per (pid, tid) line.
    per_line = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        per_line[(e["pid"], e.get("tid"))].append(e)

    # The "XLA Modules" line holds one long event per executed module
    # (jit_train_step, the step span); the "Steps" line holds umbrella events
    # named "0"/"1"/"2"; only the "XLA Ops" line holds individual HLO ops.
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
    step_events.sort(key=lambda e: e["ts"])
    print(f"device lines: { {tid_name.get(k, k): len(v) for k, v in per_line.items()} }")
    if not step_events:
        # fall back: treat whole trace span as one step
        ts0 = min(e["ts"] for e in op_events)
        ts1 = max(e["ts"] + e["dur"] for e in op_events)
        step_events = [{"ts": ts0, "dur": ts1 - ts0, "name": "whole-trace"}]

    for i, se in enumerate(step_events):
        s0, s1 = se["ts"], se["ts"] + se["dur"]
        inside = [e for e in op_events if e["ts"] >= s0 - 1 and e["ts"] + e["dur"] <= s1 + 1]
        busy = union_len([(e["ts"], e["ts"] + e["dur"]) for e in inside])
        span = s1 - s0
        print(f"\n== step {i}: span {span/1e3:.2f} ms, busy {busy/1e3:.2f} ms, "
              f"idle {(span-busy)/1e3:.2f} ms ({(span-busy)/span*100:.1f}%), "
              f"{len(inside)} ops ==")
        if i > 0:
            continue  # detail only for the first traced step
        by_fam = collections.Counter()
        n_fam = collections.Counter()
        by_src = collections.Counter()
        by_op = collections.Counter()
        for e in inside:
            fam = family(e["name"])
            by_fam[fam] += e["dur"]
            n_fam[fam] += 1
            src = (e.get("args", {}) or {}).get("source", "")
            by_src[src.replace("/root/repo/", "") or e["name"][:40]] += e["dur"]
            by_op[e["name"].split(".")[0]] += e["dur"]
        print("-- busy by op family --")
        for k, v in by_fam.most_common():
            print(f"{v/1e3:9.3f} ms  {v/busy*100:5.1f}%  n={n_fam[k]:4d}  {k}")
        print("-- top source lines --")
        for k, v in by_src.most_common(args.top):
            print(f"{v/1e3:9.3f} ms  {k}")
        print("-- top individual op groups --")
        for k, v in by_op.most_common(args.top):
            print(f"{v/1e3:9.3f} ms  {k}")
        # largest idle gaps
        iv = sorted((e["ts"], e["ts"] + e["dur"]) for e in inside)
        gaps = []
        cur = s0
        for s, e_ in iv:
            if s > cur:
                gaps.append((s - cur, cur - s0))
            cur = max(cur, e_)
        if s1 > cur:
            gaps.append((s1 - cur, cur - s0))
        gaps.sort(reverse=True)
        print("-- largest idle gaps (dur_us, offset_us_into_step) --")
        for g, off in gaps[:15]:
            print(f"{g:9.1f} us at +{off/1e3:8.3f} ms")


if __name__ == "__main__":
    main()

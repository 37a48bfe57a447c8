"""Attribute a bench-step device trace (bench.py --trace DIR) to measured
phases (VERDICT r3 #1: replace the inferred roofline-gap story with a
measured one).

Reads the Chrome-trace export the TPU profiler writes
(DIR/plugins/profile/*/vm.trace.json.gz), takes the LAST full step on the
device timeline, computes leaf self-times (the XLA Ops lane nests), and
aggregates per hlo_category with each op's own model_flops /
bytes_accessed from the trace — so the output is an exact measured
decomposition: device busy %, conv MXU efficiency, and how many ms go to
data movement (scan-carry copies, loop fusions, slices) that no per-op
roofline sees.

Usage: python tools/analyze_trace.py results/tpu_r4/trace [--out f.json]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os

PEAK_F = 197e12  # bf16 TFLOP/s, one v5e chip
PEAK_B = 819e9   # HBM bytes/s


def load_steps(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pid = next(e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in e["args"].get("name", ""))
    lanes = {e["tid"]: e["args"]["name"] for e in ev
             if e.get("ph") == "M" and e.get("name") == "thread_name"
             and e["pid"] == dev_pid}
    steps_tid = next(t for t, n in lanes.items() if n == "Steps")
    ops_tid = next(t for t, n in lanes.items() if n == "XLA Ops")
    steps = sorted([e for e in ev if e.get("ph") == "X"
                    and e["pid"] == dev_pid and e["tid"] == steps_tid],
                   key=lambda e: e["ts"])
    ops = [e for e in ev if e.get("ph") == "X" and e["pid"] == dev_pid
           and e["tid"] == ops_tid]
    return steps, ops


def analyze_step(step, ops):
    t0, d0 = step["ts"], step["dur"]
    w = sorted([e for e in ops if t0 <= e["ts"] < t0 + d0],
               key=lambda e: (e["ts"], -e["dur"]))
    child = collections.Counter()
    stack = []
    for e in w:
        while stack and e["ts"] >= stack[-1][0] + stack[-1][1] - 1e-9:
            stack.pop()
        if stack:
            child[id(stack[-1][2])] += e["dur"]
        stack.append((e["ts"], e["dur"], e))
    rows = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for e in w:
        st = (e["dur"] - child[id(e)]) / 1e6  # seconds of SELF time
        if st <= 0:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category", "other")
        r = rows[cat]
        r[0] += st
        r[1] += float(a.get("model_flops", 0) or 0)
        r[2] += float(a.get("bytes_accessed", 0) or 0)
        r[3] += 1
    busy = sum(r[0] for r in rows.values())
    return {
        "step_wall_ms": d0 / 1e3,
        "device_busy_ms": round(busy * 1e3, 2),
        "device_busy_frac": round(busy * 1e6 / d0, 4),
        "categories": {
            k: {"ms": round(r[0] * 1e3, 2),
                "tflop": round(r[1] / 1e12, 3),
                "achieved_tflops": (round(r[1] / r[0] / 1e12, 1)
                                    if r[0] > 0 else None),
                "mxu_frac_of_peak": (round(r[1] / r[0] / PEAK_F, 3)
                                     if r[0] > 0 else None),
                "n_ops": r[3]}
            for k, r in sorted(rows.items(), key=lambda kv: -kv[1][0])},
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    steps, ops = load_steps(args.trace_dir)
    rep = analyze_step(steps[-1], ops)
    conv = rep["categories"].get("convolution fusion", {})
    other_ms = round(rep["device_busy_ms"] - conv.get("ms", 0.0), 2)
    rep["summary"] = {
        "conv_ms": conv.get("ms"),
        "conv_tflop": conv.get("tflop"),
        "conv_mxu_frac": conv.get("mxu_frac_of_peak"),
        "conv_time_at_peak_ms": (round(conv["tflop"] / (PEAK_F / 1e12) * 1e3,
                                       2) if conv else None),
        "non_conv_ms": other_ms,
    }
    print(json.dumps(rep, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()

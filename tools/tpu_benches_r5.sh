#!/bin/bash
# Round-5 TPU measurement batch — run when the chip is otherwise idle
# (time-sliced numbers are not comparable). Each bench wrapped in the
# stall-retry runner (CLAUDE.md: one-shot benches hang ~1-in-3 during bad
# tunnel windows). Ordered by VERDICT-r4 priority.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/tpu_r5
mkdir -p "$OUT"

run() {  # run <name> <per-attempt-secs> <attempts> cmd...
  local name=$1 t=$2 n=$3; shift 3
  echo "=== $name: $* [$(date -u +%H:%M:%S)]"
  tools/run_with_retries.sh "$t" "$n" "$@" \
      > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- rc=$rc ; $(tail -c 400 "$OUT/$name.json")"
}

# VERDICT r4 #5: batched long-read serving with the cutoff_top_n prune
# wired through the streaming beam (plus a bigger serving batch)
run long_read_b8_cut4 1500 3 python benchmarks/long_read.py \
    --read-len 131072 --batch 8 --reps 2 --cutoff-top-n 4
run long_read_b16_cut4 1800 3 python benchmarks/long_read.py \
    --read-len 131072 --batch 16 --reps 2 --cutoff-top-n 4
run long_read_b16 1800 2 python benchmarks/long_read.py \
    --read-len 131072 --batch 16 --reps 2

# does unrolling the K-step loop let XLA overlap across step boundaries
# (step i's optimizer tail vs step i+1's early-layer forward)?
run bench_k20_unroll2 1500 2 python bench.py --scan-unroll 2

# VERDICT r4 #7: trace the champion and attribute the residue. Two traces:
# K=1 is apples-to-apples with the round-4 attribution (per-step lanes);
# K=20 shows whether the scanned loop changed the device-side picture
# (its "step" is the whole 20-step program — divide by 20).
run bench_trace_k1 1200 2 python bench.py --steps-per-call 1 --steps 10 \
    --trace "$OUT/trace_k1"
run bench_trace_k20 1200 2 python bench.py --trace "$OUT/trace_k20"
for T in trace_k1 trace_k20; do
  if [ -d "$OUT/$T" ]; then
    python tools/analyze_trace.py "$OUT/$T" \
        > "$OUT/${T}_attribution.json" 2> "$OUT/${T}_attribution.err"
    echo "--- $T attribution: $(tail -c 300 "$OUT/${T}_attribution.json")"
  fi
done

echo "=== r5 benches done [$(date -u +%H:%M:%S)]"

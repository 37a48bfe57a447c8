#!/bin/bash
# Round-4 TPU measurements, phase E — the exclusive-chip runs after the
# 30k quality run frees the chip, ordered by VERDICT-r3 priority so an
# out-of-time truncation loses the least:
#   1. batched long-read streaming-beam serving (VERDICT r3 #4): B=8
#      concurrent 131k reads, target >= 5x the 11.5k samples/s single rate
#   2. trace-attribution levers end-to-end (RESULTS.md round 4): matmul
#      conv lowering, unrolled cycles, their combination
#   3. bench.py --batch 4 (completes the batch ablation below B=8)
#   4. latency-hiding-scheduler XLA flag on the default bench
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/tpu_r4
mkdir -p "$OUT"

run() {  # run <name> <timeout-secs> cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name: $* [$(date -u +%H:%M:%S)]"
  timeout --signal=KILL "$t" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- rc=$rc ; $(tail -c 400 "$OUT/$name.json")"
  # never commit empty evidence files (advisor r3)
  [ -s "$OUT/$name.json" ] || mv "$OUT/$name.json" "$OUT/$name.json.empty" 2>/dev/null
}

run long_read_batch 3600 python benchmarks/long_read.py --read-len 131072 \
    --batch 8 --reps 2
run bench_conv_matmul 1800 python bench.py --conv-matmul
run bench_unrolled 2700 python bench.py --no-scan
run bench_conv_matmul_unrolled 2700 python bench.py --conv-matmul --no-scan
run bench_b4 1500 python bench.py --batch 4
# subshell so the flag cannot leak into later runs
( export XLA_FLAGS="${XLA_FLAGS:-} --xla_tpu_enable_latency_hiding_scheduler=true"
  run bench_lhs 1500 python bench.py )
echo "=== r4e done [$(date -u +%H:%M:%S)]"

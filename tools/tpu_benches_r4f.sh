#!/bin/bash
# Round-4 TPU phase F: phase-E list, each bench wrapped in the stall-retry
# runner (fresh tunnel connections intermittently hang forever and a hang
# never recovers in-process — phase E's first bench hung exactly that way;
# a kill+retry is the only mitigation for watchdog-less one-shot benches).
# Ordered by VERDICT-r3 priority so an out-of-time truncation loses least.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/tpu_r4
mkdir -p "$OUT"

run() {  # run <name> <per-attempt-secs> <attempts> cmd...
  local name=$1 t=$2 n=$3; shift 3
  echo "=== $name: $* [$(date -u +%H:%M:%S)]"
  tools/run_with_retries.sh "$t" "$n" "$@" \
      > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- rc=$rc ; $(tail -c 400 "$OUT/$name.json")"
  # a retried attempt leaves partial stdout: keep only the LAST complete
  # run's lines (every bench prints its JSON lines at the end)
  [ -s "$OUT/$name.json" ] || mv "$OUT/$name.json" "$OUT/$name.json.empty" 2>/dev/null
}

run long_read_batch 1200 3 python benchmarks/long_read.py \
    --read-len 131072 --batch 8 --reps 2
run bench_conv_matmul 900 3 python bench.py --conv-matmul
run bench_conv_matmul_unrolled 1500 2 python bench.py --conv-matmul --no-scan
run bench_unrolled 1500 2 python bench.py --no-scan
run bench_b4 900 2 python bench.py --batch 4
( export XLA_FLAGS="${XLA_FLAGS:-} --xla_tpu_enable_latency_hiding_scheduler=true"
  run bench_lhs 900 2 python bench.py )
echo "=== r4f done [$(date -u +%H:%M:%S)]"

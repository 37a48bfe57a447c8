#!/bin/bash
# Round-4 TPU measurements, phase D (exclusive chip, after the 30k quality
# run): everything tpu_benches_r4c.sh scoped minus hdf5_train (already run
# concurrently; results/tpu_r4/hdf5_train*.log) —
#  - batched long-read streaming-beam serving (VERDICT r3 #4): B=8
#    concurrent 131k reads, target >= 5x the 11.5k samples/s single-read rate
#  - bench.py --batch 4 (completes the batch ablation below B=8)
#  - trace-attribution levers end-to-end: unrolled cycles, matmul conv
#    lowering, their combination
#  - latency-hiding-scheduler XLA flag on the default bench
#  - idle-chip re-pair of the isolated block forms
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/tpu_r4
mkdir -p "$OUT"

run() {  # run <name> <timeout-secs> cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name: $*"
  timeout --signal=KILL "$t" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- rc=$rc ; $(tail -c 400 "$OUT/$name.json")"
  # never commit empty evidence files (advisor r3)
  [ -s "$OUT/$name.json" ] || mv "$OUT/$name.json" "$OUT/$name.json.empty" 2>/dev/null
}

run long_read_batch 4800 python benchmarks/long_read.py --read-len 131072 \
    --batch 8 --reps 2
run bench_conv_matmul 2400 python bench.py --conv-matmul
run bench_unrolled 3600 python bench.py --no-scan
run bench_conv_matmul_unrolled 3600 python bench.py --conv-matmul --no-scan
run bench_b4 2400 python bench.py --batch 4
# subshell so the flag cannot leak into later runs (bash env-prefix on a
# function call persists past the call)
( export XLA_FLAGS="${XLA_FLAGS:-} --xla_tpu_enable_latency_hiding_scheduler=true"
  run bench_lhs 2400 python bench.py )
run roofline_block_forms 2400 python benchmarks/roofline.py \
    --section block_bwd --iters 10
run roofline_block_matmul 2400 python benchmarks/roofline.py \
    --section block_bwd_matmul --iters 10
echo "=== r4d done"

#!/bin/bash
# Round-4 TPU measurements, phase C (after the quality run frees the chip):
#  - HDF5 real-data-path end-to-end training (VERDICT r3 #6): threaded
#    QueueLoader -> prefetch -> jitted joint step on TPU, 3000 steps on the
#    realistic synthetic E.coli reads file (tools/make_synthetic_reads.py)
#  - batched long-read streaming-beam serving (VERDICT r3 #4): B=8
#    concurrent 131k reads, target >= 5x the 11.5k samples/s single-read rate
#  - bench.py --batch 4 (completes the batch ablation below B=8)
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
  [ -s "$OUT/$name.json" ] || mv "$OUT/$name.json" "$OUT/$name.json.empty" 2>/dev/null
}

# HDF5 end-to-end: the CLI train loop IS the measurement (loss trajectory +
# samples/s in runs/ecoli_hdf5/logs); copy the metrics out afterwards.
[ -f runs/data/ecoli_synth.hdf5 ] || \
  python tools/make_synthetic_reads.py runs/data/ecoli_synth.hdf5 \
      --reads 24 --events 20000
echo "=== hdf5_train: cli train configs/ecoli_hdf5.json"
timeout --signal=KILL 7200 python -c "
from wavenet_speech_tpu.cli import main
import sys
sys.exit(main(['train', 'configs/ecoli_hdf5.json']))" \
    > "$OUT/hdf5_train.log" 2>&1
echo "--- rc=$? ; $(tail -c 300 "$OUT/hdf5_train.log")"
cp runs/ecoli_hdf5/logs/metrics.jsonl "$OUT/hdf5_train_metrics.jsonl" 2>/dev/null

run long_read_batch 5400 python benchmarks/long_read.py --read-len 131072 \
    --batch 8 --reps 2
run bench_b4 2400 python bench.py --batch 4
# trace-attribution experiments (RESULTS.md round 4):
#  - unrolled cycles (no scan-carry copies / stacked-param slicing)
#  - matmul conv lowering (isolated block: 79.9% -> 89.5% of peak)
run bench_unrolled 3600 python bench.py --no-scan
run bench_conv_matmul 2400 python bench.py --conv-matmul
run bench_conv_matmul_unrolled 3600 python bench.py --conv-matmul --no-scan
# idle-chip re-pair of the isolated block forms (the first matmul-form
# measurement ran concurrently with the quality run)
run roofline_block_forms 2400 python benchmarks/roofline.py \
    --section block_bwd --iters 10
run roofline_block_matmul 2400 python benchmarks/roofline.py \
    --section block_bwd_matmul --iters 10
echo "=== r4c done"

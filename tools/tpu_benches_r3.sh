#!/bin/bash
# Round-3 TPU measurement sequence — run ONLY after the quality run frees
# the chip. Ordered safest-first; the fused-bwd compile attempt (new Mosaic
# territory; a grad-adjacent compile wedged the chip ~2h in round 2) runs
# LAST so a hang cannot poison the other measurements. Every job runs under
# timeout with output captured into results/.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/tpu_r3
mkdir -p "$OUT"

run() {  # run <name> <timeout-secs> cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name: $*"
  timeout --signal=KILL "$t" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "--- rc=$? ; $(tail -c 400 "$OUT/$name.json")"
}

# 1. headline training bench (strict MFU + hw util)
run bench_default 1800 python bench.py
# 2. whole-step HBM bandwidth (memory-roofline exoneration)
run hbm_step 1800 python benchmarks/hbm_step.py
run hbm_step_noremat 1800 python benchmarks/hbm_step.py --no-remat
# 3. decode benches: DNA regression row + speech-scale rows
run decode_dna 1800 python benchmarks/decode.py --bf16 --engines device greedy
run decode_speech 2400 python benchmarks/decode.py --labels 30 --beam-width 16 \
    --engines device beam-only
run decode_speech_pruned 2400 python benchmarks/decode.py --labels 30 \
    --beam-width 16 --prune-labels 32 --engines device beam-only
# 4. long-read streaming beam (>=100k samples)
run long_read 3600 python benchmarks/long_read.py --read-len 131072
# 5. LAST: the one careful fused-bwd compile attempt (background semantics:
#    timeout KILLs only after 35 min; never interrupt it manually mid-compile)
run bench_fused_bwd 2100 python bench.py --fused-bwd --no-remat
run bench_fused_bwd_remat 2100 python bench.py --fused-bwd
echo "=== all done; results in $OUT/"

#!/bin/bash
# Round-4 TPU measurements, phase A (VERDICT r3 #1 + #7):
#  - batch-scaling ablation b16/b32 (the r3 runs stalled and shipped
#    EMPTY JSONs; rerun until numbers exist)
#  - one device trace of the default bench step (attribute the
#    42.6-vs-27.1ms roofline gap by measurement)
#  - pallas-beam flake repro (r3b rc=1 with empty output, twice)
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
  [ -s "$OUT/$name.json" ] || { mv "$OUT/$name.json" "$OUT/$name.json.empty" 2>/dev/null; }
}

run bench_b16 2400 python bench.py --batch 16
run bench_b32 2400 python bench.py --batch 32
run bench_default_trace 2400 python bench.py --trace "$OUT/trace"
run decode_pallas_beam 1500 python benchmarks/decode.py --bf16 \
    --beam-impl pallas --engines beam-only
echo "=== r4a done"

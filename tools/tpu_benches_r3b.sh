#!/bin/bash
# Round-3 follow-up TPU measurements:
#  - speech-scale beam with an EFFECTIVE label pre-prune (the r3a run used
#    cutoff 32 >= alphabet 30, a no-op) and a wider-beam point where the
#    O(W^2) merge should dominate
#  - the fused Pallas beam-search kernel's first hardware compile (new
#    Mosaic territory: run LAST, under timeout, never interrupt manually)
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

run decode_speech_prune8 1800 python benchmarks/decode.py --labels 30 \
    --beam-width 16 --prune-labels 8 --engines beam-only
run decode_speech_w32 1800 python benchmarks/decode.py --labels 30 \
    --beam-width 32 --engines beam-only
run decode_speech_w32_prune8 1800 python benchmarks/decode.py --labels 30 \
    --beam-width 32 --prune-labels 8 --engines beam-only
# LAST: fused Pallas beam kernel, first hardware compile
run decode_pallas_beam 1500 python benchmarks/decode.py --bf16 \
    --beam-impl pallas --engines beam-only
run decode_pallas_beam_speech 1500 python benchmarks/decode.py \
    --labels 30 --beam-width 16 --beam-impl pallas --engines beam-only
echo "=== r3b done"

#!/bin/bash
# Round-5 leg 4: recovery with the FIXED skip guard (the f32 global-norm
# overflow silently froze legs 1-3's progress past grad scale ~1.8e19 —
# see RESULTS.md round-5 postmortem). Constant 2.5e-4 from the 60k state;
# the 30-step hardware verification already showed CTC 1.82 -> 1.61.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
CKPT="$PWD/runs/gauss_r5/ckpts"
mkdir -p results/gauss_r5
tools/run_with_retries.sh 10800 40 \
  python examples/gaussian_eval.py \
    --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
    --lr 2.5e-4 --warmup 300 --max-update-norm 30 \
    --steps 75000 --save-every 1500 --async-ckpt \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r5/eval_75000.json" \
  || exit 1
cp runs/gauss_r5/eval_75000.json results/gauss_r5/eval_75000.json
echo "[leg4_r5] DONE: $(cat runs/gauss_r5/eval_75000.json)"

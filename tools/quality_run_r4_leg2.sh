#!/bin/bash
# Round-4 quality leg 2: continue the completed 30k full-schedule run
# (tools/quality_run_r4_full.sh) from its checkpoint for 10k more steps
# under a second cosine tail — the optimizer state carries, the schedule
# function is re-parameterized to 40k total so the leg anneals from
# ~6e-5 down to 1e-5. Guards + forensics stay armed. Goal: beat the
# round-3 record (ref-conv 0.306 / identity 0.863 at 40k).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
CKPT="$PWD/runs/gauss_r4_full/ckpts"
mkdir -p results/gauss_r4
tools/run_with_retries.sh 10800 40 \
  python examples/gaussian_eval.py \
    --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
    --lr 2e-4 --cosine --max-update-norm 30 \
    --steps 40000 --save-every 500 \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r4_full/eval_40000.json" \
  || exit 1
cp runs/gauss_r4_full/eval_40000.json results/gauss_r4/eval_leg2_40000.json
echo "[leg2_r4] DONE: $(cat runs/gauss_r4_full/eval_40000.json)"

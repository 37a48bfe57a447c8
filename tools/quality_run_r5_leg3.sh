#!/bin/bash
# Round-5 leg 3: constant-LR recovery from the post-anneal 48k state. The
# 30k->40k window of leg 1 degraded into a noisy era (eval 0.361 -> 0.570)
# that the anneal then froze in place (48k: 0.653/0.700); round 3 showed
# such eras recover with more constant-LR budget (its 20k era at 0.656
# became the 0.304 record by 30k). Resumes the same checkpoint chain at
# constant 2.5e-4 for 12k steps, async checkpointing, guards + forensics
# armed.
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
    --steps 60000 --save-every 1500 --async-ckpt \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r5/eval_60000.json" \
  || exit 1
cp runs/gauss_r5/eval_60000.json results/gauss_r5/eval_60000.json
echo "[leg3_r5] DONE: $(cat runs/gauss_r5/eval_60000.json)"

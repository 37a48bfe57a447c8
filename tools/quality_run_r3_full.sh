#!/bin/bash
# Round-3 full-schedule headline run: the reference eval architecture from
# scratch through ONE complete schedule — linear warmup + cosine decay to
# 5% of peak lr over 25k steps — with the whole divergence-guard set armed
# (--max-update-norm clipping + non-finite step skip). This is the
# headline-scale version of the 12k compressed anneal demo: a single run
# that covers both the quality target and the
# "schedule finishes end-to-end" question at once.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
STEPS=${STEPS:-25000}
CKPT="$PWD/runs/gauss_r3_full/ckpts"
mkdir -p runs/gauss_r3_full results/gauss_r3
tools/run_with_retries.sh 14400 40 \
  python examples/gaussian_eval.py \
    --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
    --lr 2.5e-4 --cosine --max-update-norm 30 \
    --steps "$STEPS" --save-every 500 \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r3_full/eval_${STEPS}.json" \
  || exit 1
cp "runs/gauss_r3_full/eval_${STEPS}.json" \
   "results/gauss_r3/eval_fullsched_${STEPS}.json"
echo "[full_r3] DONE: $(cat runs/gauss_r3_full/eval_${STEPS}.json)"

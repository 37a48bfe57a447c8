#!/bin/bash
# Round-4 headline run (VERDICT r3 #2 + #3): the reference eval
# architecture from scratch through ONE complete schedule — linear warmup
# + cosine decay to 5% of peak over $STEPS steps — with the whole guard
# set armed (--max-update-norm post-optimizer clipping + non-finite step
# skip) AND the anomaly forensics hook live (examples/gaussian_eval.py:
# on the first non-finite or >25x loss spike, the exact batch + params
# are dumped to runs/gauss_r4_full/anomalies/ for offline bisection via
# tools/bisect_nonfinite.py).
#
# 30k (not r3's scripted 25k): the 0.306/0.863 record took 40k constant
# + anneal; a 30k one-shot schedule is the budget where both round-4
# targets (ref-conv <= 0.35, identity >= 0.86) are in reach.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
STEPS=${STEPS:-30000}
CKPT="$PWD/runs/gauss_r4_full/ckpts"
mkdir -p runs/gauss_r4_full results/gauss_r4
tools/run_with_retries.sh 18000 40 \
  python examples/gaussian_eval.py \
    --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
    --lr 2.5e-4 --cosine --max-update-norm 30 \
    --steps "$STEPS" --save-every 500 \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r4_full/eval_${STEPS}.json" \
  || exit 1
cp "runs/gauss_r4_full/eval_${STEPS}.json" \
   "results/gauss_r4/eval_fullsched_${STEPS}.json"
echo "[full_r4] DONE: $(cat runs/gauss_r4_full/eval_${STEPS}.json)"

#!/bin/bash
# Round-3 anneal-leg demonstration: a COMPLETE training schedule — linear
# warmup + cosine decay to lr 0 over 12k steps — run from scratch under the
# full divergence-guard set (--max-update-norm clipping + non-finite step
# skip). Round 2's 43k and round 3's 46k divergences both happened in the
# low-lr anneal leg, which no surviving checkpoint lets us resume into; this
# compressed schedule is the live proof that the hardened harness FINISHES
# an anneal leg end-to-end (the 40k headline run covers the quality target;
# this covers the "could the harness have finished" question). One leg, one
# horizon: resuming with a different --steps would move the cosine horizon.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
CKPT="$PWD/runs/gauss_r3_anneal/ckpts"
mkdir -p runs/gauss_r3_anneal results/gauss_r3
tools/run_with_retries.sh 10800 30 \
  python examples/gaussian_eval.py \
    --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
    --lr 2.5e-4 --cosine --max-update-norm 30 \
    --steps 12000 --save-every 500 \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r3_anneal/eval_12000.json" \
  || exit 1
cp runs/gauss_r3_anneal/eval_12000.json results/gauss_r3/eval_anneal_12000.json
echo "[anneal_r3] DONE: $(cat runs/gauss_r3_anneal/eval_12000.json)"

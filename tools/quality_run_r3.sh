#!/bin/bash
# Round-3 headline quality run (VERDICT r2 item #2): the full reference eval
# architecture, from scratch, with the update-norm divergence guard armed for
# the WHOLE run including the post-40k cosine anneal leg (the leg that
# diverged to NaN unguarded in round 2). Eval JSONs are copied into the
# tracked results/gauss_r3/ directory as durable evidence (VERDICT item #8).
set -u
cd "$(dirname "$0")/.."
# prepend, don't clobber: /root/.axon_site (TPU plugin sitecustomize) must
# stay on PYTHONPATH or the axon backend never registers
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
CKPT="$PWD/runs/gauss_r3/ckpts"
mkdir -p runs/gauss_r3 results/gauss_r3
for target in 10000 20000 30000 40000; do
  tools/run_with_retries.sh 10800 30 \
    python examples/gaussian_eval.py \
      --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
      --lr 2.5e-4 --warmup 300 --max-update-norm 30 \
      --steps "$target" --save-every 500 \
      --eval-batches 4 \
      --ckpt-dir "$CKPT" \
      --out "runs/gauss_r3/eval_${target}.json" \
    || exit 1
  cp "runs/gauss_r3/eval_${target}.json" "results/gauss_r3/eval_${target}.json"
  echo "[quality_run_r3] eval at $target: $(cat runs/gauss_r3/eval_${target}.json)"
done
# Anneal leg: warmup-cosine over the full 48k horizon; the restored optimizer
# count (40k) lands mid-decay, giving a smoothly annealing 40k->48k leg.
tools/run_with_retries.sh 10800 30 \
  python examples/gaussian_eval.py \
    --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
    --lr 2.5e-4 --cosine --max-update-norm 30 \
    --steps 48000 --save-every 500 \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r3/eval_48000.json" \
  || exit 1
cp runs/gauss_r3/eval_48000.json results/gauss_r3/
echo "[quality_run_r3] DONE: $(cat runs/gauss_r3/eval_48000.json)"

#!/bin/bash
# Round-5 record attempt (VERDICT r4 #1): the two-leg recipe CLAUDE.md
# records as the record path — constant-lr budget FIRST (the round-3 40k
# constant run holds the 0.306/0.863 record), THEN a cosine anneal leg
# 40k->48k. Both prior divergences (r2 @43k, r3 @46k) struck in exactly
# this low-lr leg; the anomaly-forensics kit (training/diagnostics.py,
# armed via --ckpt-dir) stays live the whole run, so the outcome is
# EITHER a new record (anneal completes) OR a captured (batch, params)
# dump that tools/bisect_nonfinite.py names the overflow site with.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
CKPT="$PWD/runs/gauss_r5/ckpts"
mkdir -p runs/gauss_r5 results/gauss_r5

# Leg 1: constant LR (warmup 300) — the round-3 record recipe verbatim
# (tools/quality_run_r3.sh), eval checkpoints at 30k and 40k.
for target in 30000 40000; do
  tools/run_with_retries.sh 10800 40 \
    python examples/gaussian_eval.py \
      --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
      --lr 2.5e-4 --warmup 300 --max-update-norm 30 \
      --steps "$target" --save-every 1500 \
      --eval-batches 4 \
      --ckpt-dir "$CKPT" \
      --out "runs/gauss_r5/eval_${target}.json" \
    || exit 1
  cp "runs/gauss_r5/eval_${target}.json" "results/gauss_r5/eval_${target}.json"
  echo "[quality_r5] eval at $target: $(cat runs/gauss_r5/eval_${target}.json)"
done

# Leg 2: cosine anneal over a 48k horizon — the restored optimizer count
# (40k) lands mid-decay, so the leg anneals ~1.4e-4 -> 1.25e-5 over
# 40k->48k. This is the regime that produced both bf16 divergences.
tools/run_with_retries.sh 10800 40 \
  python examples/gaussian_eval.py \
    --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
    --lr 2.5e-4 --cosine --max-update-norm 30 \
    --steps 48000 --save-every 1500 \
    --eval-batches 4 \
    --ckpt-dir "$CKPT" \
    --out "runs/gauss_r5/eval_48000.json" \
  || exit 1
cp runs/gauss_r5/eval_48000.json results/gauss_r5/eval_48000.json
echo "[quality_r5] DONE: $(cat runs/gauss_r5/eval_48000.json)"

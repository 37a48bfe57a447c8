#!/bin/bash
# Round-2 quality-parity run: reference eval architecture (2048-feat
# featurizer / 512-wide 100-block stack), input batch-norm, Adamax.
# Runs in eval-punctuated chunks: each chunk trains to the next step target,
# then evaluates per-logit CTC + basecall identity and writes
# runs/gauss_r2/eval_<steps>.json. Stall-healing via run_with_retries +
# the in-process watchdog (checkpoint auto-resume).
set -u
cd "$(dirname "$0")/.."
# prepend, don't clobber: /root/.axon_site (TPU plugin sitecustomize) must
# stay on PYTHONPATH or the axon backend never registers
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export GAUSS_STALL_SECS=${GAUSS_STALL_SECS:-420}
CKPT="$PWD/runs/gauss_r2/ckpts"
mkdir -p runs/gauss_r2
for target in "$@"; do
  tools/run_with_retries.sh 10800 20 \
    python examples/gaussian_eval.py \
      --scale 1.0 --nhid 512 --batch-size 16 --bf16 \
      --lr 2.5e-4 --warmup 300 \
      --steps "$target" --save-every 500 \
      --eval-batches 4 \
      --ckpt-dir "$CKPT" \
      --out "runs/gauss_r2/eval_${target}.json" \
    || exit 1
  echo "[quality_run] eval at $target done: $(cat runs/gauss_r2/eval_${target}.json)"
done

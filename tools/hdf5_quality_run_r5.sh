#!/bin/bash
# Round-5 real-data convergence run (VERDICT r4 #3): 15k joint XE+CTC steps
# over a 200-read synthetic E.coli HDF5 corpus (reference worker_fns
# layout, r9.4 physics; tools/make_synthetic_reads.py --reads 200), with
# the levers the round-4 run lacked: warmup+cosine LR schedule, fixed
# held-out validation batches, update-norm guard, and the device-side
# 5-step dispatch loop. Afterwards: decode-identity eval (beam) on the
# held-out split. CLI auto-resumes from Orbax checkpoints; the stall
# watchdog re-execs on tunnel hangs.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export WAVENET_CLI_STALL_SECS=${WAVENET_CLI_STALL_SECS:-420}
mkdir -p results/tpu_r5

[ -f runs/data/ecoli_synth_200.hdf5 ] || \
  python tools/make_synthetic_reads.py runs/data/ecoli_synth_200.hdf5 \
    --reads 200 --events 20000 --seed 1

tools/run_with_retries.sh 10800 40 \
  python -m wavenet_speech_tpu.cli train configs/ecoli_hdf5_quality.json \
  || exit 1
cp runs/ecoli_hdf5_quality/logs/metrics.jsonl \
   results/tpu_r5/hdf5_quality_metrics.jsonl
tools/run_with_retries.sh 3600 5 \
  python -m wavenet_speech_tpu.cli evaluate configs/ecoli_hdf5_quality.json \
  > results/tpu_r5/hdf5_quality_eval.txt 2>&1
echo "[hdf5_r5] DONE: $(tail -1 results/tpu_r5/hdf5_quality_eval.txt)"

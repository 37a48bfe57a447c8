#!/bin/bash
# Stall-resilient runner for long TPU jobs over the flaky tunnel: run the
# command under a timeout; on stall/kill, rely on checkpoint auto-resume and
# retry. Usage: tools/run_with_retries.sh <per-attempt-seconds> <max-attempts> cmd...
PER=${1:?}; MAX=${2:?}; shift 2
for i in $(seq 1 "$MAX"); do
  echo "[retry-runner] attempt $i/$MAX: $*" >&2
  timeout --signal=KILL "$PER" "$@"
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[retry-runner] success on attempt $i" >&2
    exit 0
  fi
  echo "[retry-runner] attempt $i exited rc=$rc; retrying" >&2
  sleep 5
done
echo "[retry-runner] exhausted $MAX attempts" >&2
exit 1

#!/bin/bash
# Strictly-serial TPU artifact queue for the tunneled axon worker,
# OUTAGE-MODE layout: the worker has been UNAVAILABLE for hours (every
# contact blocks ~25 min then raises), so instead of burning 3 back-to-back
# retries per job, each cycle probes with the highest-value job (bench.py,
# the headline) and -- only once the worker answers -- runs the whole
# artifact list serially. Failed cycles sleep >= 40 min (contact attempts
# reset the worker's lazy-release clock; see axon notes).
set -u
cd "$(dirname "$0")/.."
QUIET_INITIAL=${QUIET_INITIAL:-1800}
TRY_TIMEOUT=${TRY_TIMEOUT:-2700}
CYCLE_SLEEP=${CYCLE_SLEEP:-2400}
GAP=${GAP:-300}
CYCLES=${CYCLES:-8}

echo "[tpu_queue] initial quiet ${QUIET_INITIAL}s $(date)"
sleep "$QUIET_INITIAL"

run() {
  echo "[tpu_queue] START: $* $(date)"
  if timeout "$TRY_TIMEOUT" "$@"; then
    echo "[tpu_queue] OK: $* $(date)"
    return 0
  fi
  echo "[tpu_queue] FAILED: $* $(date)"
  return 1
}

for c in $(seq 1 "$CYCLES"); do
  echo "[tpu_queue] cycle $c $(date)"
  if G8_BENCH_NO_WATCHDOG=1 run python -u bench.py; then
    sleep "$GAP"
    run python -u tools/probe_int4.py 4096
    sleep "$GAP"
    run python -u tools/probe_dot_emit.py 8192 16
    sleep "$GAP"
    run python -u benchmarks/solver_flops.py --ops getrf,potrf --sizes 4096 \
        --nu 14 --block 1024 --iters 2
    sleep "$GAP"
    run python -u benchmarks/accuracy.py --dtype f64 --oracle-stored \
        --phis 0,2 --ks 1024,16384 --nus 9,12,16,20
    sleep "$GAP"
    G8_ALLOC_RETRIES=4 run python -u benchmarks/big_flops.py --sizes 16384 \
        --nu 16 --budget-gb 6 --iters 3
    echo "[tpu_queue] queue complete $(date)"
    exit 0
  fi
  echo "[tpu_queue] worker still unavailable; quiet ${CYCLE_SLEEP}s $(date)"
  sleep "$CYCLE_SLEEP"
done
echo "[tpu_queue] giving up after ${CYCLES} cycles $(date)"

#!/bin/bash
# Strictly-serial TPU artifact queue for the tunneled axon worker.
#
# The worker admits ONE client at a time and releases a dead client's
# state lazily, only while NO client is connected (observed: first
# contact blocked >25 min after a heavy client was killed; failed
# attempts raise UNAVAILABLE after ~25 min of blocking). Any client
# contact appears to RESET the lazy-release clock, so retry sleeps must
# exceed the ~25-min recovery window: one long initial quiet window,
# long per-try timeouts, >=40-min quiet gaps between retries, and NEVER
# two jobs at once.
set -u
cd "$(dirname "$0")/.."
QUIET_INITIAL=${QUIET_INITIAL:-4500}
TRY_TIMEOUT=${TRY_TIMEOUT:-2700}
RETRY_SLEEP=${RETRY_SLEEP:-2400}
GAP=${GAP:-600}

echo "[tpu_queue] initial quiet ${QUIET_INITIAL}s $(date)"
sleep "$QUIET_INITIAL"

run() {
  echo "[tpu_queue] START: $* $(date)"
  for t in 1 2 3; do
    timeout "$TRY_TIMEOUT" "$@" && { echo "[tpu_queue] OK: $* $(date)"; return 0; }
    echo "[tpu_queue] attempt $t failed ($*); quiet ${RETRY_SLEEP}s $(date)"
    sleep "$RETRY_SLEEP"
  done
  echo "[tpu_queue] GIVING UP: $* $(date)"
  return 1
}

# highest-value artifacts first: each job's success is independent
G8_ALLOC_RETRIES=4 run python -u benchmarks/big_flops.py --sizes 16384 --nu 16 --budget-gb 6 --iters 3
sleep "$GAP"
run python -u benchmarks/solver_flops.py --ops getrf,potrf --sizes 4096 \
    --nu 14 --block 1024 --iters 2
sleep "$GAP"
run python -u benchmarks/accuracy.py --dtype f64 --oracle-stored \
    --phis 0,2 --ks 1024,16384 --nus 9,12,16,20
sleep "$GAP"
run python -u tools/probe_int4.py 4096
sleep "$GAP"
# queue-level retries replace bench.py's internal watchdog (no nesting)
G8_BENCH_NO_WATCHDOG=1 run python -u bench.py
echo "[tpu_queue] queue complete $(date)"

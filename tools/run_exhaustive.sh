#!/bin/bash
# Run the reference debug tier's FULL combinatorial product
# (GEMMUL8_TEST_EXHAUSTIVE=1, tests/test_debug_sweep.py::
# test_exhaustive_debug_product) with one pytest PROCESS PER CELL.
#
# Why per-cell isolation: a single long-lived process accumulates hours of
# XLA:CPU compile state across ~3500 distinct programs and has segfaulted
# inside backend_compile_and_load twice (round 4: the zstd cache writer;
# round 5: plain compile in the complex64 cell) — both crashes are in
# jaxlib's native code, not this library. Fresh processes bound the blast
# radius and make reruns resumable per cell.
cd /root/repo
L=tools/logs/exhaustive_cells
mkdir -p $L
SUMMARY=tools/logs/exhaustive_summary.log
: > $SUMMARY
FAIL=0
for mode in True False robust; do
  for cell in float32-nus0 float64-nus1 complex64-nus2 complex128-nus3; do
    id="tests/test_debug_sweep.py::test_exhaustive_debug_product[${mode}-${cell}]"
    log="$L/${mode}-${cell}.log"
    if grep -q "1 passed" "$log" 2>/dev/null; then
      echo "SKIP (already green) $id" >> $SUMMARY
      continue
    fi
    echo "RUN $id $(date -u +%H:%M:%S)" >> $SUMMARY
    GEMMUL8_TEST_EXHAUSTIVE=1 GEMMUL8_TEST_NO_COMPCACHE=1 \
      timeout 14400 python -m pytest "$id" -q -p no:cacheprovider \
      > "$log" 2>&1
    rc=$?
    echo "  rc=$rc $(tail -1 "$log" | head -c 120) $(date -u +%H:%M:%S)" >> $SUMMARY
    [ $rc -ne 0 ] && FAIL=1
  done
done
echo "EXHAUSTIVE DONE fail=$FAIL $(date -u +%H:%M:%S)" >> $SUMMARY
exit $FAIL

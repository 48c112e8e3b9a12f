#!/bin/bash
# Run the reference debug tier's FULL combinatorial product
# (GEMMUL8_TEST_EXHAUSTIVE=1, tests/test_debug_sweep.py::
# test_exhaustive_debug_product) with one pytest PROCESS PER
# (mode, dtype, SIZE) SUB-CELL.
#
# Why per-sub-cell isolation: jaxlib's XLA:CPU compiler segfaults inside
# backend_compile_and_load during long single-process compile marathons --
# observed in the full-suite run (round 4: zstd cache writer; round 5:
# plain compile), and again in a fresh single-cell process after ~53 min
# (complex128, ~1500 distinct programs). The crash is in jaxlib's native
# code, not this library (the same cases pass in shorter processes:
# tools/logs/repro_c64.log runs one full cell's 486 cases green).
# Size-split sub-cells keep each process ~5-20 min, below the hazard zone,
# and make reruns resumable per sub-cell.
cd /root/repo
L=tools/logs/exhaustive_cells
mkdir -p $L
SUMMARY=tools/logs/exhaustive_summary.log
FAIL=0
echo "=== size-split runner start $(date -u +%H:%M:%S) ===" >> $SUMMARY
# dtype-major order, complex128 LAST: its sub-cells are ~35-min compiles
# each; if wall clock runs out, the cheap cells are already green.
for cell in float32-nus0 float64-nus1 complex64-nus2 complex128-nus3; do
  for mode in True False robust; do
    # full-cell green logs from the pre-split runner cover all 3 sizes
    if grep -q "1 passed" "$L/${mode}-${cell}.log" 2>/dev/null; then
      echo "SKIP (full cell already green) ${mode}-${cell}" >> $SUMMARY
      continue
    fi
    for size in 33 40 47; do
      id="tests/test_debug_sweep.py::test_exhaustive_debug_product[${size}-${mode}-${cell}]"
      log="$L/${mode}-${cell}-${size}.log"
      if grep -q "1 passed" "$log" 2>/dev/null; then
        echo "SKIP (already green) $id" >> $SUMMARY
        continue
      fi
      echo "RUN $id $(date -u +%H:%M:%S)" >> $SUMMARY
      GEMMUL8_TEST_EXHAUSTIVE=1 GEMMUL8_TEST_NO_COMPCACHE=1 \
        timeout 7200 python -m pytest "$id" -q -p no:cacheprovider \
        > "$log" 2>&1
      rc=$?
      echo "  rc=$rc $(tail -1 "$log" | head -c 120) $(date -u +%H:%M:%S)" >> $SUMMARY
      [ $rc -ne 0 ] && FAIL=1
    done
  done
done
echo "EXHAUSTIVE DONE fail=$FAIL $(date -u +%H:%M:%S)" >> $SUMMARY
exit $FAIL

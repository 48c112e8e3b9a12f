#!/bin/bash
# Round-4 remaining artifact queue — STRICTLY serial (one TPU client at a time)
cd /root/repo
L=tools/logs
echo "=== big_flops 16384 $(date -u +%H:%M:%S) ===" > $L/queue_r4b.log
timeout 5400 python benchmarks/big_flops.py --sizes 16384 --nu 16 --budget-gb 8 --iters 2 >> $L/queue_r4b.log 2>&1
echo "big_flops rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r4b.log
sleep 30
echo "=== solver_flops getrf (panel v2) $(date -u +%H:%M:%S) ===" >> $L/queue_r4b.log
timeout 3600 python benchmarks/solver_flops.py --ops getrf --sizes 4096 --nu 14 --iters 2 >> $L/queue_r4b.log 2>&1
echo "solver rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r4b.log
sleep 30
echo "=== accuracy c128 on-device $(date -u +%H:%M:%S) ===" >> $L/queue_r4b.log
timeout 3600 python benchmarks/accuracy.py --dtype c128 --oracle-stored >> $L/queue_r4b.log 2>&1
echo "accuracy rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r4b.log
echo "QUEUE DONE $(date -u +%H:%M:%S)" >> $L/queue_r4b.log

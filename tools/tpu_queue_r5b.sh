#!/bin/bash
# Round-5 queue b: on-device accuracy CSVs for the two dtypes still missing
# hardware rows (f32, c64). STRICTLY serial; = syntax for negative phi lists.
cd /root/repo
L=tools/logs
: > $L/queue_r5b.log
sleep 90   # let the worker release the previous client (RESOURCE_EXHAUSTED tail)

echo "=== accuracy f32 on-device $(date -u +%H:%M:%S) ===" >> $L/queue_r5b.log
timeout 5400 python benchmarks/accuracy.py --dtype f32 --oracle-stored \
  --phis=-1,0,0.5,2,4 --ks=1024,2048,16384 >> $L/queue_r5b.log 2>&1
echo "acc_f32 rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r5b.log
sleep 60

echo "=== accuracy c64 on-device (planar) $(date -u +%H:%M:%S) ===" >> $L/queue_r5b.log
timeout 5400 python benchmarks/accuracy.py --dtype c64 --oracle-stored \
  --phis=-1,0,0.5,2,4 --ks=1024,2048,16384 >> $L/queue_r5b.log 2>&1
echo "acc_c64 rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r5b.log
echo "QUEUE R5B DONE $(date -u +%H:%M:%S)" >> $L/queue_r5b.log

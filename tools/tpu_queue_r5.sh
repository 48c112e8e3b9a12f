#!/bin/bash
# Round-5 artifact queue — STRICTLY serial (the tunneled device admits ONE
# client process at a time; sleep between jobs to let it release state).
cd /root/repo
L=tools/logs
log() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> $L/queue_r5.log; }
: > $L/queue_r5.log

log "bench headline"
timeout 1200 python bench.py >> $L/queue_r5.log 2>&1
echo "bench rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r5.log
sleep 45

log "accuracy f32 on-device"
timeout 3600 python benchmarks/accuracy.py --dtype f32 --oracle-stored \
  --phis -1,0,0.5,2,4 --ks 1024,2048,16384 >> $L/queue_r5.log 2>&1
echo "acc_f32 rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r5.log
sleep 45

log "accuracy c64 on-device (planar)"
timeout 3600 python benchmarks/accuracy.py --dtype c64 --oracle-stored \
  --phis -1,0,0.5,2,4 --ks 1024,2048,16384 >> $L/queue_r5.log 2>&1
echo "acc_c64 rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r5.log
sleep 45

log "probe_dot_xla ceiling re-check"
timeout 2400 python tools/probe_dot_xla.py > benchmarks/results/probe_dot_xla_r5_$(date -u +%Y%m%d).txt 2>&1
echo "probe rc=$? $(date -u +%H:%M:%S)" >> $L/queue_r5.log

echo "QUEUE R5 DONE $(date -u +%H:%M:%S)" >> $L/queue_r5.log

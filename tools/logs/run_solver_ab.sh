#!/bin/bash
cd /root/repo
timeout 4800 python benchmarks/solver_flops.py --ops potrf,geqrf --sizes 4096 --nu 14 --iters 2 > tools/logs/solver_ab1.log 2>&1
echo rc=$? >> tools/logs/solver_ab1.log
sleep 20
timeout 3600 python benchmarks/solver_flops.py --ops potrf --sizes 4096 --nu 14 --block 512 --no-native --iters 2 > tools/logs/solver_ab2.log 2>&1
echo rc=$? >> tools/logs/solver_ab2.log

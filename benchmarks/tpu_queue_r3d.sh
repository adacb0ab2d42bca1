#!/bin/bash
# Round-3 fourth TPU batch (run after tpu_queue_r3c.sh):
#  - sinkhorn vs FIXED ceilings, attempt 2 (the MXU-peak matmul now
#    takes its operand as an argument — a closed-over 256 MB constant
#    blew the relay's compile-payload limit, HTTP 413)
#  - warm fit split (same process so the lev GCUPS row is fresh)
#  - Pallas-vs-XLA Myers at lengths 1600/3200 with the VMEM-fitted
#    tile (fixed T=1024 OOM'd scoped VMEM at length >= 1600)
cd /root/repo
date >> /tmp/q3d_status.log

timeout 3600 python benchmarks/bench_kernels.py --lev --sinkhorn --fit-split \
  > /tmp/q3d_kernels.log 2>&1
echo kernels3_done >> /tmp/q3d_status.log
date >> /tmp/q3d_status.log

timeout 1800 python benchmarks/bench_kernels.py --lev --n 4000 \
  --length 1600 --pairs 16384 > /tmp/q3d_lev1600.log 2>&1
timeout 1800 python benchmarks/bench_kernels.py --lev --n 4000 \
  --length 3200 --pairs 8192 > /tmp/q3d_lev3200.log 2>&1
echo lev_sweep_done >> /tmp/q3d_status.log
echo QUEUE_DONE >> /tmp/q3d_status.log
date >> /tmp/q3d_status.log

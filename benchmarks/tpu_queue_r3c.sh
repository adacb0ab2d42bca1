#!/bin/bash
# Round-3 third TPU batch (run after tpu_queue_r3b.sh):
#  1. re-measure the Sinkhorn scout against FIXED ceilings (the first
#     cut's "pure matmul" ceiling accidentally timed the 25-55 MB/s
#     relay download of its own state; the ceilings now return
#     scalars: matvec-loop twin, bf16/f32 MXU peak, HBM stream BW)
#  2. re-measure the fit wall split on a WARM fit (first cut timed a
#     cold fit: 502 s of session+compiles inside the denominator)
#  3. BruteForce strings-1600 on-device: the reference's 173.302 s
#     exact-baseline row
#  4. 100k expansion push: double the expansion budget (0.001x, 4
#     rounds) over the 0.9738 record to see where the lever saturates
cd /root/repo
date >> /tmp/q3c_status.log

timeout 3600 python benchmarks/bench_kernels.py --sinkhorn --fit-split \
  > /tmp/q3c_kernels.log 2>&1
echo kernels2_done >> /tmp/q3c_status.log
date >> /tmp/q3c_status.log

# Pallas-vs-XLA Myers across string lengths: at 400 chars the two
# tiers tie (0.97x); longer strings raise the VMEM-residency stakes
timeout 1800 python benchmarks/bench_kernels.py --lev --n 4000 \
  --length 1600 --pairs 16384 > /tmp/q3c_lev1600.log 2>&1
timeout 1800 python benchmarks/bench_kernels.py --lev --n 4000 \
  --length 3200 --pairs 8192 > /tmp/q3c_lev3200.log 2>&1
echo lev_sweep_done >> /tmp/q3c_status.log
date >> /tmp/q3c_status.log

timeout 2400 python benchmarks/bench_brute.py --strings \
  > /tmp/q3c_brute.log 2>&1
echo brute_done >> /tmp/q3c_status.log
date >> /tmp/q3c_status.log

ANNCHOR_TPU_PAIR_CAP=700 timeout 7200 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 30 \
  --expand-evals 0.001 --expand-rounds 4 --warm \
  > /tmp/q3c_100k_push.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q3c_100k_push.log | tail -1)
[ -n "$line" ] && echo "$line" >> /root/repo/benchmarks/results/scale_strings.jsonl
echo 100k_push_done >> /tmp/q3c_status.log
echo QUEUE_DONE >> /tmp/q3c_status.log
date >> /tmp/q3c_status.log

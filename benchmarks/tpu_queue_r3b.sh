#!/bin/bash
# Round-3 follow-up TPU measurements (run after tpu_queue_r3.sh):
# kernel-level efficiency evidence, the post-fusion digits number on a
# fresh session, and the exact-metric digits parity row.
cd /root/repo
set -x
date >> /tmp/q3b_status.log

# kernel-level evidence (VERDICT r2 #3): Myers GCUPS, Sinkhorn
# TFLOP/s vs pure-matmul ceiling, fused maxmin, 20k fit wall split
timeout 3600 python benchmarks/bench_kernels.py --all \
  > /tmp/q3b_kernels.log 2>&1
echo kernels_done >> /tmp/q3b_status.log
date >> /tmp/q3b_status.log

# digits hybrid on a FRESH session (VERDICT r2 #2 wants two fresh
# sessions; this is session 1 — the driver bench provides more)
timeout 2400 python benchmarks/bench_digits.py > /tmp/q3b_digits.log 2>&1
grep -o '{"metric".*}' /tmp/q3b_digits.log | tail -1 \
  >> /root/repo/benchmarks/results/tpu_session.jsonl
echo digits_done >> /tmp/q3b_status.log
date >> /tmp/q3b_status.log

# digits hybrid, second fresh session
timeout 2400 python benchmarks/bench_digits.py > /tmp/q3b_digits2.log 2>&1
grep -o '{"metric".*}' /tmp/q3b_digits2.log | tail -1 \
  >> /root/repo/benchmarks/results/tpu_session.jsonl
echo digits2_done >> /tmp/q3b_status.log
date >> /tmp/q3b_status.log

# exact-metric digits fit (VERDICT r2 #6): the reference's 21.3 s
# protocol row, measured honestly (host-serial native EMD)
timeout 3600 python benchmarks/bench_digits.py --exact \
  > /tmp/q3b_digits_exact.log 2>&1
grep -o '{"metric".*}' /tmp/q3b_digits_exact.log | tail -1 \
  >> /root/repo/benchmarks/results/tpu_session.jsonl
echo digits_exact_done >> /tmp/q3b_status.log
date >> /tmp/q3b_status.log

# 20k p_work-matched cap + expansion (round-4 handoff item that hit
# its session window): does expansion recover the cap's recall loss
# at small scale too?  (cap-280 record: 20.6 s / 0.919 / cov 0.954)
ANNCHOR_TPU_PAIR_CAP=280 timeout 3600 python benchmarks/scale_strings.py \
  --n 20000 --length 400 --k 15 --p-work 0.02 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 48 --check-rows 50 \
  --expand-evals 0.002 --warm > /tmp/q3b_20k_capexpand.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q3b_20k_capexpand.log | tail -1)
[ -n "$line" ] && echo "$line" >> /root/repo/benchmarks/results/scale_strings.jsonl
echo 20k_capexpand_done >> /tmp/q3b_status.log
echo QUEUE_DONE >> /tmp/q3b_status.log
date >> /tmp/q3b_status.log

#!/bin/bash
# Round-3 sixth TPU batch: validate the headline after the Myers tier
# switch (W<=24 now routes to the XLA bitplane kernel, which measures
# 8% faster at the headline shape — confirm end-to-end), and
# re-measure digits-5620 on the fused certify pipeline.
cd /root/repo
date >> /tmp/q3f_status.log

timeout 2400 python bench.py > /tmp/q3f_headline.log 2>&1
grep -o '{"metric".*}' /tmp/q3f_headline.log | tail -1 \
  >> /root/repo/benchmarks/results/tpu_session.jsonl
echo headline_done >> /tmp/q3f_status.log
date >> /tmp/q3f_status.log

# stage-level decomposition of the stable ~9 s digits hybrid: where
# do the non-EMD seconds go (the serial exact batch is ~3.4 s and
# partially overlapped)?
ANNCHOR_TPU_DEBUG_TIMING=1 timeout 2400 python benchmarks/bench_digits.py \
  > /tmp/q3f_digits_debug.log 2>&1
echo digits_debug_done >> /tmp/q3f_status.log
date >> /tmp/q3f_status.log

timeout 3600 python benchmarks/bench_digits_large.py \
  > /tmp/q3f_digits_large.log 2>&1
grep -o '{"metric".*}' /tmp/q3f_digits_large.log | tail -1 \
  >> /root/repo/benchmarks/results/tpu_session.jsonl
echo digits_large_done >> /tmp/q3f_status.log
echo QUEUE_DONE >> /tmp/q3f_status.log
date >> /tmp/q3f_status.log

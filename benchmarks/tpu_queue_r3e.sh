#!/bin/bash
# Round-3 fifth TPU batch: the 100k record push combining all three
# measured levers.  Expansion SATURATED at 0.9738 on the t3 build
# (0.0005x/3r and 0.001x/4r measure identically — the misses are not
# 2-hop reachable), so coverage must come from the FILTER: t2 admits
# ~251M candidates (vs t3's ~100M), the per-point lb budget keeps the
# best 700 (same residency), and expansion converts the remainder.
cd /root/repo
date >> /tmp/q3e_status.log

ANNCHOR_TPU_PAIR_CAP=700 timeout 9000 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 2 --locality 5 --n-anchors 96 --check-rows 30 \
  --expand-evals 0.0005 --expand-rounds 3 --warm \
  > /tmp/q3e_100k_wide.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q3e_100k_wide.log | tail -1)
[ -n "$line" ] && echo "$line" >> /root/repo/benchmarks/results/scale_strings.jsonl
echo 100k_wide_expand_done >> /tmp/q3e_status.log
echo QUEUE_DONE >> /tmp/q3e_status.log
date >> /tmp/q3e_status.log

#!/bin/bash
# Round-3 seventh TPU batch: re-measure the scale records with the
# distance-multiset recall column (the reference's own error
# semantics).  Integer Levenshtein puts a measured 12.5% of true
# k-NN edges in tie groups straddling the k boundary, and all three
# expansion configs missed the identical 11/420 id-edges — the
# id-based recall has a tie ceiling, not a quality ceiling.
cd /root/repo
date >> /tmp/q3g_status.log

ANNCHOR_TPU_PAIR_CAP=700 timeout 9000 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 30 \
  --expand-evals 0.0005 --expand-rounds 3 --warm \
  > /tmp/q3g_100k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q3g_100k.log | tail -1)
[ -n "$line" ] && echo "$line" >> /root/repo/benchmarks/results/scale_strings.jsonl
echo 100k_drecall_done >> /tmp/q3g_status.log
date >> /tmp/q3g_status.log

ANNCHOR_TPU_PAIR_CAP=280 timeout 3600 python benchmarks/scale_strings.py \
  --n 20000 --length 400 --k 15 --p-work 0.02 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 48 --check-rows 50 \
  --expand-evals 0.002 --warm > /tmp/q3g_20k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q3g_20k.log | tail -1)
[ -n "$line" ] && echo "$line" >> /root/repo/benchmarks/results/scale_strings.jsonl
echo 20k_drecall_done >> /tmp/q3g_status.log
echo QUEUE_DONE >> /tmp/q3g_status.log
date >> /tmp/q3g_status.log

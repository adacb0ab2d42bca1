#!/bin/bash
# Round-4h: fourth 500k attempt (GT-rows-first bench order) — extraction row-slices (r4e fix) +
# column-chunked tighten panel (this fix).  The locality-stage XLA
# programs are in the persistent compile cache from the r4e attempt,
# so this run prices closer to the warm cost.
cd /root/repo
set -x
RES=/root/repo/benchmarks/results

timeout 10800 python benchmarks/scale_strings.py \
  --n 500000 --clusters 256 --length 400 --k 15 --p-work 0.002 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 192 \
  --check-rows 50 --pair-cap 400 \
  --expand-evals 0.0002 --expand-rounds 3 \
  > /tmp/q4h_500k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q4h_500k.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R4H_DONE >> /tmp/q4c_status.log

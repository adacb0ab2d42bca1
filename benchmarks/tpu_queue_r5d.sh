#!/bin/bash
# Round-5d: gated 1M-string attempt.  Prereqs measured this round:
# rms band score (pass-1/2 panels lose their na factor -> ~2-4 s/band
# at 2048 rows), working persistent compile cache, row-slice floor
# removed (ADVICE r4: 2^28/1e6 = 268 rows/slice at 1M), device
# expansion screen.  Memory: cap 300 -> 3e8 resident pairs ~ 8-10 GB
# of fit state on the 16 GB chip (SCALE.md go/no-go analysis).
cd /tmp/q5drepo
set -x
RES=/root/repo/benchmarks/results

timeout 18000 python benchmarks/scale_strings.py \
  --n 1000000 --clusters 512 --length 400 --k 15 --p-work 0.0015 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 192 \
  --check-rows 50 --pair-cap 300 --build-score rms \
  --expand-evals 0.0001 --expand-rounds 3 \
  > /tmp/q5d_1m.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5d_1m.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5D_1M_DONE >> /tmp/q5d_status.log

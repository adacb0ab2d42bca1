#!/bin/bash
# Round-5b queue: timed exact-digits with the refine split (CPU sweep
# measured 4 -> 2 errors at refine_frac=0.1), then the 200k frontier
# re-run with the round-5 device expansion screen (r4 ask: expansion
# <= 40 s, host share < 30%).
cd /tmp/q5brepo
set -x
RES=/root/repo/benchmarks/results

timeout 3000 python benchmarks/bench_digits.py --exact --refine-frac=0.1 \
  > /tmp/q5b_digits_exact.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5b_digits_exact.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/digits.jsonl
echo R5B_DIGITS_DONE >> /tmp/q5b_status.log

timeout 7200 python benchmarks/scale_strings.py \
  --n 200000 --clusters 128 --length 400 --k 15 --p-work 0.005 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 128 \
  --check-rows 100 --pair-cap 700 \
  --expand-evals 0.0003 --expand-rounds 3 --warm \
  > /tmp/q5b_200k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5b_200k.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5B_200K_DONE >> /tmp/q5b_status.log

# re-sweep the 20k index with the symmetrised query walk (the r5a
# sweep reproduced the r4 numbers bit-for-bit: the ceiling was
# reachability — out-edges only — not selection order)
timeout 4000 python benchmarks/query_sweep.py   > /tmp/q5b_query_sweep.log 2>&1
grep -o '{"metric".*}' /tmp/q5b_query_sweep.log >> $RES/query_sweep.jsonl
echo R5B_QUERY_DONE >> /tmp/q5b_status.log

# cache-warm second visit: identical 20k rms config as r5a step 2 —
# the warmup_s delta vs 317 s is the persistent-cache claim measured
# at pipeline scale (fresh process, same shapes)
timeout 2500 python benchmarks/scale_strings.py   --n 20000 --clusters 32 --length 400 --k 15 --p-work 0.02   --niters 4 --loc-thresh 3 --locality 5 --n-anchors 48   --check-rows 50 --pair-cap 280 --build-score rms   --expand-evals 0.002 --expand-rounds 3 --warm   > /tmp/q5b_20k_rms2.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5b_20k_rms2.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5B_CACHEWARM_DONE >> /tmp/q5b_status.log
echo R5B_ALL_DONE >> /tmp/q5b_status.log

#!/bin/bash
# Round-5e (final cleanup): digits_large BruteForce re-run on a quiet
# host (the round-5 first measurement ran 4x slow under deliberate CPU
# contention), then a final headline refresh.
cd /tmp/q5erepo
set -x
RES=/root/repo/benchmarks/results

JAX_PLATFORMS=cpu timeout 3000 python benchmarks/bench_brute.py --digits-large \
  > /tmp/q5e_brute_dl.log 2>&1
grep -o '{"metric".*}' /tmp/q5e_brute_dl.log | tail -1 >> $RES/tpu_session.jsonl
echo R5E_BRUTE_DONE >> /tmp/q5e_status.log

# 200k expansion with the pool-padding fix (one screen compile per
# fit): the r5c re-measure still paid ~85 s/round because the pool
# arrays' growing shapes recompiled the screen each round
timeout 7200 python benchmarks/scale_strings.py \
  --n 200000 --clusters 128 --length 400 --k 15 --p-work 0.005 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 128 \
  --check-rows 100 --pair-cap 700 \
  --expand-evals 0.0003 --expand-rounds 3 --warm \
  > /tmp/q5e_200k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5e_200k.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5E_200K_DONE >> /tmp/q5e_status.log

# focused query sweep: tie-ceiling + distance-recall columns (the
# id-recall gap on the 20k index measured 97% equidistant swaps)
timeout 4000 python benchmarks/query_sweep.py --quick   > /tmp/q5e_query_tie.log 2>&1
grep -o '{"metric".*}' /tmp/q5e_query_tie.log >> $RES/query_sweep.jsonl
echo R5E_TIE_DONE >> /tmp/q5e_status.log

timeout 3000 python bench.py > /tmp/q5e_bench.log 2>&1
echo R5E_BENCH_DONE >> /tmp/q5e_status.log
echo R5E_ALL_DONE >> /tmp/q5e_status.log

#!/bin/bash
# Round-5a queue: query-gap fix sweep, rms build-score validation at
# 20k, default-ctor 100k verification, headline refresh.  All runs now
# benefit from the round-5 persistent-cache fix (package init wires
# jax_compilation_cache_dir; the env var alone was silently ignored).
cd /root/repo
set -x
RES=/root/repo/benchmarks/results

# 1. query sweep on the saved 20k index (new expansion + knobs)
timeout 4000 python benchmarks/query_sweep.py \
  > /tmp/q5a_query_sweep.log 2>&1
grep -o '{"metric".*}' /tmp/q5a_query_sweep.log >> $RES/query_sweep.jsonl
echo R5A_QUERY_DONE >> /tmp/q5a_status.log

# 2. 20k rms-score validation (same config as the committed linf row)
timeout 4000 python benchmarks/scale_strings.py \
  --n 20000 --clusters 32 --length 400 --k 15 --p-work 0.02 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 48 \
  --check-rows 50 --pair-cap 280 --build-score rms \
  --expand-evals 0.002 --expand-rounds 3 --warm \
  > /tmp/q5a_20k_rms.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5a_20k_rms.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5A_RMS_DONE >> /tmp/q5a_status.log

# 3. default-ctor 100k row (VERDICT r4 #2 verification): knobs from
# the scale-aware defaults only; in-fit refine via refine_frac=0.05
timeout 7000 python benchmarks/scale_strings.py \
  --n 100000 --clusters 32 --length 400 --k 15 --p-work 0.01 \
  --defaults --check-rows 100 --warm \
  > /tmp/q5a_100k_defaults.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5a_100k_defaults.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5A_DEFAULTS_DONE >> /tmp/q5a_status.log

# 4. headline refresh on the round-5 code
timeout 3000 python bench.py > /tmp/q5a_bench.log 2>&1
echo R5A_BENCH_DONE >> /tmp/q5a_status.log
echo R5A_ALL_DONE >> /tmp/q5a_status.log

#!/bin/bash
# Sequential TPU measurement queue (fires when the relay returns).
cd /root/repo
set -x

harvest() {
  # append the run's final JSON line (if any) to the repo record so
  # results survive even if no interactive session harvests the logs
  local log="$1"
  local line
  line=$(grep -o '{"metric".*}' "$log" | tail -1)
  if [ -n "$line" ]; then
    echo "$line" >> /root/repo/benchmarks/results/scale_strings.jsonl
  fi
}
date >> /tmp/q_status.log
# 1. headline re-measure with the 1-trip pipeline
timeout 2400 python bench.py > /tmp/q_bench.log 2>&1
grep -o '{"metric".*}' /tmp/q_bench.log | tail -1 >> /root/repo/benchmarks/results/tpu_session.jsonl
echo bench_done >> /tmp/q_status.log
# 2. digits re-measure
timeout 2400 python benchmarks/bench_digits.py > /tmp/q_digits.log 2>&1
grep -o '{"metric".*}' /tmp/q_digits.log | tail -1 >> /root/repo/benchmarks/results/tpu_session.jsonl
echo digits_done >> /tmp/q_status.log
# 3. 20k strings with the p_work-matched cap (uncapped record:
#    45.0 s / recall 0.95 at p0.02)
ANNCHOR_TPU_PAIR_CAP=280 timeout 3600 python benchmarks/scale_strings.py \
  --n 20000 --length 400 --k 15 --p-work 0.02 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 48 --check-rows 50 \
  --warm > /tmp/q_20k_cap.log 2>&1
harvest /tmp/q_20k_cap.log
echo 20k_done >> /tmp/q_status.log
# 4. query scaling record incl. nq=5000
timeout 7200 python benchmarks/bench_query_scaling.py --tpu > /tmp/q_qscale.log 2>&1
grep -o '{"nq".*}' /tmp/q_qscale.log >> /root/repo/benchmarks/results/tpu_session.jsonl
echo qscale_done >> /tmp/q_status.log
# 5. 100k p0.01 cap700 + graph-expansion refinement (the coverage-gap fix)
ANNCHOR_TPU_PAIR_CAP=700 timeout 7200 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 30 \
  --expand-evals 0.0005 --expand-rounds 3 --warm > /tmp/q_100k_expand.log 2>&1
harvest /tmp/q_100k_expand.log
echo 100k_expand_done >> /tmp/q_status.log
# 6. 100k wide-filter + cap: run the filter wide for coverage, let
#    the lb budget prune (t2 admits ~251M; budgeted keeps 700/point)
ANNCHOR_TPU_PAIR_CAP=700 timeout 9000 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 2 --locality 5 --n-anchors 96 --check-rows 30 \
  --warm > /tmp/q_100k_wide.log 2>&1
harvest /tmp/q_100k_wide.log
echo 100k_wide_done >> /tmp/q_status.log
# 7. 50k re-run on the current pipeline + expansion (prior best:
#    213.4 s / recall 0.916 at p0.014 t3 na96)
ANNCHOR_TPU_PAIR_CAP=980 timeout 5400 python benchmarks/scale_strings.py \
  --n 50000 --length 400 --k 15 --p-work 0.014 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 40 \
  --expand-evals 0.001 --warm > /tmp/q_50k.log 2>&1
harvest /tmp/q_50k.log
echo 50k_done >> /tmp/q_status.log
# 8. 100k same-total-budget split: p0.01 with 15% held for refinement
ANNCHOR_TPU_PAIR_CAP=700 timeout 7200 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 30 \
  --refine-frac 0.15 --warm > /tmp/q_100k_refinefrac.log 2>&1
harvest /tmp/q_100k_refinefrac.log
echo QUEUE_DONE >> /tmp/q_status.log
date >> /tmp/q_status.log

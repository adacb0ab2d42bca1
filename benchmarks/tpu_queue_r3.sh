#!/bin/bash
# Round-3 sequential TPU measurement queue: the four unmeasured
# variants from tpu_queue.sh (items 5-8) — 100k + graph-expansion,
# 100k wide-filter + cap, 50k re-run + expansion, 100k refine_frac
# split.  Results harvested into scale_strings.jsonl as they land.
cd /root/repo
set -x

harvest() {
  local log="$1"
  local line
  line=$(grep -o '{"metric".*}' "$log" | tail -1)
  if [ -n "$line" ]; then
    echo "$line" >> /root/repo/benchmarks/results/scale_strings.jsonl
  fi
}
date >> /tmp/q3_status.log
# 5. 100k p0.01 cap700 + graph-expansion refinement (the coverage-gap fix)
ANNCHOR_TPU_PAIR_CAP=700 timeout 7200 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 30 \
  --expand-evals 0.0005 --expand-rounds 3 --warm > /tmp/q3_100k_expand.log 2>&1
harvest /tmp/q3_100k_expand.log
echo 100k_expand_done >> /tmp/q3_status.log
date >> /tmp/q3_status.log
# 7. 50k re-run on the current pipeline + expansion (prior best:
#    213.4 s / recall 0.916 at p0.014 t3 na96) — run before the two
#    remaining 100k variants so the cheaper datapoint lands early
ANNCHOR_TPU_PAIR_CAP=980 timeout 5400 python benchmarks/scale_strings.py \
  --n 50000 --length 400 --k 15 --p-work 0.014 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 40 \
  --expand-evals 0.001 --warm > /tmp/q3_50k.log 2>&1
harvest /tmp/q3_50k.log
echo 50k_done >> /tmp/q3_status.log
date >> /tmp/q3_status.log
# 8. 100k same-total-budget split: p0.01 with 15% held for refinement
ANNCHOR_TPU_PAIR_CAP=700 timeout 7200 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 30 \
  --refine-frac 0.15 --warm > /tmp/q3_100k_refinefrac.log 2>&1
harvest /tmp/q3_100k_refinefrac.log
echo 100k_refinefrac_done >> /tmp/q3_status.log
date >> /tmp/q3_status.log
# 6. 100k wide-filter + cap: run the filter wide for coverage, let the
#    lb budget prune (t2 admits ~251M; budgeted keeps 700/point) — last
#    because it risks the longest pair-build
ANNCHOR_TPU_PAIR_CAP=700 timeout 9000 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 2 --locality 5 --n-anchors 96 --check-rows 30 \
  --warm > /tmp/q3_100k_wide.log 2>&1
harvest /tmp/q3_100k_wide.log
echo 100k_wide_done >> /tmp/q3_status.log
echo QUEUE_DONE >> /tmp/q3_status.log
date >> /tmp/q3_status.log

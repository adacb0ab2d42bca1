#!/bin/bash
# Round-4 sequential TPU measurement queue.  Runs from a snapshot dir
# (REPO env var) so interactive edits to /root/repo cannot change the
# code mid-queue; results are harvested into the real repo's JSONL
# records either way.
REPO="${REPO:-/root/repo}"
cd "$REPO"
set -x

RES=/root/repo/benchmarks/results

harvest() {
  local log="$1" dest="$2"
  local line
  line=$(grep -o '{"metric".*}' "$log" | tail -1)
  if [ -n "$line" ]; then
    echo "$line" >> "$dest"
  fi
}
date >> /tmp/q4_status.log

# 1. headline re-measure (fresh session record for the round)
timeout 2400 python bench.py > /tmp/q4_bench.log 2>&1
harvest /tmp/q4_bench.log $RES/tpu_session.jsonl
echo bench_done >> /tmp/q4_status.log

# 2. kernel parity record (pallas vs XLA on-device value equality ->
#    kernels.jsonl) at the headline string shape + a long-string shape
timeout 2400 python benchmarks/bench_kernels.py --lev --length 400 \
  > /tmp/q4_kern1.log 2>&1
timeout 2400 python benchmarks/bench_kernels.py --lev --length 1600 \
  > /tmp/q4_kern2.log 2>&1
echo kernels_done >> /tmp/q4_status.log

# 3. exact-metric digits with the stage table (where do the 33
#    non-EMD seconds go? VERDICT r3 next #5)
timeout 3600 python benchmarks/bench_digits.py --exact --verbose \
  > /tmp/q4_digits_exact.log 2>&1
harvest /tmp/q4_digits_exact.log $RES/tpu_session.jsonl
echo digits_exact_done >> /tmp/q4_status.log

# 4. 20k full-population exact-GT check + out-of-sample query check
#    (reference contract: compare_neighbor_graphs over every row)
timeout 7200 python benchmarks/scale_strings.py \
  --n 20000 --length 400 --k 15 --p-work 0.02 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 48 --check-rows 50 \
  --pair-cap 280 --expand-evals 0.002 --expand-rounds 3 \
  --exact-gt --query-check 1000 --query-p-work 0.01 \
  --warm > /tmp/q4_20k_gt.log 2>&1
harvest /tmp/q4_20k_gt.log $RES/scale_strings.jsonl
echo 20k_gt_done >> /tmp/q4_status.log

# 5. 100k with 500 exact check rows + instrumented expansion
timeout 10800 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 500 \
  --pair-cap 700 --expand-evals 0.0005 --expand-rounds 3 \
  --warm > /tmp/q4_100k.log 2>&1
harvest /tmp/q4_100k.log $RES/scale_strings.jsonl
echo 100k_done >> /tmp/q4_status.log

# 6. 200k frontier point (beyond BASELINE's 100k north star)
timeout 14400 python benchmarks/scale_strings.py \
  --n 200000 --clusters 128 --length 400 --k 15 --p-work 0.005 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 128 \
  --check-rows 100 --pair-cap 700 \
  --expand-evals 0.0003 --expand-rounds 3 \
  --warm > /tmp/q4_200k.log 2>&1
harvest /tmp/q4_200k.log $RES/scale_strings.jsonl
echo 200k_done >> /tmp/q4_status.log

echo QUEUE_DONE >> /tmp/q4_status.log
date >> /tmp/q4_status.log

#!/bin/bash
# Round-4b sequential TPU measurement queue (after tpu_queue_r4.sh).
# Re-measures every row the 2.3x-faster exact EMD moves (digits
# exact/hybrid, digits_large), re-runs the 20k exact-GT point with a
# non-starvation query budget (+ save/load timing; the GT npz is
# cached in /tmp from r4), records a 100k save, and attempts a 500k
# frontier point if the 200k r4 item succeeded.
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
date >> /tmp/q4b_status.log

# 1. exact-metric digits with the new network simplex (was 26.4 s on
#    the old solver vs reference 21.3 s; EMD serial floor now ~12 s)
timeout 3600 python benchmarks/bench_digits.py --exact --verbose \
  > /tmp/q4b_digits_exact.log 2>&1
harvest /tmp/q4b_digits_exact.log $RES/tpu_session.jsonl
echo digits_exact_done >> /tmp/q4b_status.log

# 2. hybrid digits (certify pass rides the same EMD)
timeout 2400 python benchmarks/bench_digits.py \
  > /tmp/q4b_digits_hybrid.log 2>&1
harvest /tmp/q4b_digits_hybrid.log $RES/tpu_session.jsonl
echo digits_hybrid_done >> /tmp/q4b_status.log

# 3. digits_large hybrid (120,853 exact certify evals)
timeout 3600 python benchmarks/bench_digits_large.py \
  > /tmp/q4b_digits_large.log 2>&1
harvest /tmp/q4b_digits_large.log $RES/tpu_session.jsonl
echo digits_large_done >> /tmp/q4b_status.log

# 4. 20k exact-GT re-run: query check at a non-starvation budget
#    (0.01 gave 200 evals/query = recall 0.39; the library contract
#    is recall-at-budget, bench should sit on the usable shoulder),
#    plus scale-safe save/load timing.  GT cached from r4 -> fast.
timeout 7200 python benchmarks/scale_strings.py \
  --n 20000 --length 400 --k 15 --p-work 0.02 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 48 --check-rows 50 \
  --pair-cap 280 --expand-evals 0.002 --expand-rounds 3 \
  --exact-gt --query-check 1000 --query-p-work 0.05 \
  --save /tmp/annchor_20k.npz \
  --warm > /tmp/q4b_20k.log 2>&1
harvest /tmp/q4b_20k.log $RES/scale_strings.jsonl
echo 20k_done >> /tmp/q4b_status.log

# 5. 100k save/load timing + query check (VERDICT r3 next #2/#7:
#    "a measured 100k save in seconds, not minutes"); few check rows,
#    no expansion — this row is persistence + query evidence
timeout 10800 python benchmarks/scale_strings.py \
  --n 100000 --clusters 64 --length 400 --k 15 --p-work 0.01 --niters 4 \
  --loc-thresh 3 --locality 5 --n-anchors 96 --check-rows 10 \
  --pair-cap 700 --query-check 500 --query-p-work 0.01 \
  --save /tmp/annchor_100k.npz \
  > /tmp/q4b_100k_save.log 2>&1
harvest /tmp/q4b_100k_save.log $RES/scale_strings.jsonl
echo 100k_save_done >> /tmp/q4b_status.log

# 6. 500k frontier (only meaningful if the r4 200k item succeeded;
#    cap sized to keep resident pairs ~ the measured 100k budget)
if grep -q '"n": 200000' $RES/scale_strings.jsonl; then
  timeout 14400 python benchmarks/scale_strings.py \
    --n 500000 --clusters 256 --length 400 --k 15 --p-work 0.002 \
    --niters 4 --loc-thresh 3 --locality 5 --n-anchors 192 \
    --check-rows 50 --pair-cap 400 \
    --expand-evals 0.0002 --expand-rounds 3 \
    > /tmp/q4b_500k.log 2>&1
  harvest /tmp/q4b_500k.log $RES/scale_strings.jsonl
  echo 500k_done >> /tmp/q4b_status.log
fi

echo QUEUE_DONE >> /tmp/q4b_status.log
date >> /tmp/q4b_status.log

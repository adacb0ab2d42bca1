#!/bin/bash
# Round-5c: the 500k re-run with the round-5 levers — rms band score
# (MXU matmul; r4h measured the linf band panels at 1970 s of the
# 2928 s build), device expansion screen, working persistent compile
# cache — plus the save/query columns the r4 verdict asked for.
# Gate: only run after the 20k rms validation (r5a step 2) holds
# recall; the launcher checks the jsonl.
cd /tmp/q5crepo
set -x
RES=/root/repo/benchmarks/results

# 200k expansion re-measure with the fixed screen (bucketed slate
# width -> one compile; packed-key top_k instead of the row sort):
# the first device-screen measurement regressed to 381 s of
# expansion at ~110 s/round.  Same fit config as round 10.
timeout 7200 python benchmarks/scale_strings.py \
  --n 200000 --clusters 128 --length 400 --k 15 --p-work 0.005 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 128 \
  --check-rows 100 --pair-cap 700 \
  --expand-evals 0.0003 --expand-rounds 3 --warm \
  > /tmp/q5c_200k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5c_200k.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5C_200K_DONE >> /tmp/q5c_status.log

timeout 10800 python benchmarks/scale_strings.py \
  --n 500000 --clusters 256 --length 400 --k 15 --p-work 0.002 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 192 \
  --check-rows 100 --pair-cap 400 --build-score rms \
  --expand-evals 0.0002 --expand-rounds 3 \
  --save /tmp/annchor_500k.npz \
  --query-check 200 --query-p-work 0.005 \
  > /tmp/q5c_500k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q5c_500k.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo R5C_500K_DONE >> /tmp/q5c_status.log
echo R5C_ALL_DONE >> /tmp/q5c_status.log

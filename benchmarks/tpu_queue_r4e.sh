#!/bin/bash
# Round-4e: retry the 500k frontier with the extraction row-slice OOM
# fix (the r4c attempt compile-OOM'd at a 17.3 GB whole-band top_k),
# then a 1M attempt gated on 500k success.  Waits for the r4d query
# sweep so the relay is free.  Runs from /root/repo — the fix
# postdates the r4c snapshot.
cd /root/repo
set -x
RES=/root/repo/benchmarks/results

while ! grep -q SWEEP_DONE /tmp/q4c_status.log 2>/dev/null; do
  sleep 60
done

timeout 10800 python benchmarks/scale_strings.py \
  --n 500000 --clusters 256 --length 400 --k 15 --p-work 0.002 \
  --niters 4 --loc-thresh 3 --locality 5 --n-anchors 192 \
  --check-rows 50 --pair-cap 400 \
  --expand-evals 0.0002 --expand-rounds 3 \
  > /tmp/q4e_500k.log 2>&1
line=$(grep -o '{"metric".*}' /tmp/q4e_500k.log | tail -1)
[ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
echo 500k_retry_done >> /tmp/q4c_status.log

if grep -q '"n": 500000' $RES/scale_strings.jsonl; then
  timeout 14400 python benchmarks/scale_strings.py \
    --n 1000000 --clusters 512 --length 400 --k 15 --p-work 0.001 \
    --niters 4 --loc-thresh 3 --locality 5 --n-anchors 192 \
    --check-rows 50 --pair-cap 250 \
    --expand-evals 0.0001 --expand-rounds 3 \
    > /tmp/q4e_1m.log 2>&1
  line=$(grep -o '{"metric".*}' /tmp/q4e_1m.log | tail -1)
  [ -n "$line" ] && echo "$line" >> $RES/scale_strings.jsonl
fi
echo R4E_DONE >> /tmp/q4c_status.log

#!/bin/bash
# Round-4f: the r4d query sweep, re-queued behind r4e (the first
# attempt's session claim wedged after the 500k OOM crash and was
# killed without running).
cd /root/repo
set -x
RES=/root/repo/benchmarks/results

while ! grep -q R4E_DONE /tmp/q4c_status.log 2>/dev/null; do
  sleep 60
done

timeout 7200 python benchmarks/query_sweep.py \
  --index /tmp/annchor_20k.npz \
  > /tmp/q4f_query_sweep.log 2>&1
grep -o '{"metric".*}' /tmp/q4f_query_sweep.log >> $RES/query_sweep.jsonl
echo R4F_DONE >> /tmp/q4c_status.log

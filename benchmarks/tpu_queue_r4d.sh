#!/bin/bash
# Round-4d follow-up: waits for the r4c queue's QUEUE_DONE marker,
# then sweeps query budget + the query-side filter override on the
# 20k index r4c saved (benchmarks/query_sweep.py).  Runs from
# /root/repo (the sweep + override code postdates the r4c snapshot).
cd /root/repo
set -x
RES=/root/repo/benchmarks/results

while ! grep -q QUEUE_DONE /tmp/q4c_status.log 2>/dev/null; do
  sleep 60
done

timeout 7200 python benchmarks/query_sweep.py \
  --index /tmp/annchor_20k.npz \
  > /tmp/q4d_query_sweep.log 2>&1
grep -o '{"metric".*}' /tmp/q4d_query_sweep.log >> $RES/query_sweep.jsonl
echo SWEEP_DONE >> /tmp/q4c_status.log

#!/bin/bash
# Round-4 relay watcher: poll the axon pool endpoint until it accepts
# connections, then run the round-4 measurement queue from the frozen
# snapshot.  The relay outage (ports 8082/8083 closed since ~23:26) is
# launcher-side and transient; this keeps the queue from losing the
# window when it returns.
set -u
echo "watch start $(date)" >> /tmp/q4_watch.log
while true; do
  if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    echo "relay up $(date)" >> /tmp/q4_watch.log
    # settle: require two consecutive successes 30 s apart so a
    # flapping tunnel doesn't burn the 100-500 s session setup
    sleep 30
    if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
      break
    fi
    echo "relay flapped $(date)" >> /tmp/q4_watch.log
  fi
  sleep 60
done
echo "launching queue $(date)" >> /tmp/q4_watch.log
REPO=/tmp/q4repo bash /root/repo/benchmarks/tpu_queue_r4.sh \
  >> /tmp/q4_queue.log 2>&1
echo "queue exited $(date)" >> /tmp/q4_watch.log

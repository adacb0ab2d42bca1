#!/bin/bash
# Snapshot /root/repo to /tmp/q4crepo and launch tpu_queue_r4c.sh
# detached (setsid) so the queue survives interactive-session ends —
# the r4/r4b/r4c-attempt-1 queues all died when their session did.
set -e
rm -rf /tmp/q4crepo
mkdir -p /tmp/q4crepo
cp -a /root/repo/. /tmp/q4crepo/
rm -rf /tmp/q4crepo/.git
rm -f /tmp/q4c_status.log
setsid nohup env REPO=/tmp/q4crepo \
  bash /tmp/q4crepo/benchmarks/tpu_queue_r4c.sh \
  > /tmp/q4c_shell.log 2>&1 < /dev/null &
echo $! > /tmp/q4c.pid
echo "queue launched, pid $(cat /tmp/q4c.pid)"

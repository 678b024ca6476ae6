#!/bin/bash
# wait for queue1 to finish, then run queue2
while ! grep -q "QUEUE COMPLETE" /root/repo/results/r3b/../r3b/queue_status.log 2>/dev/null; do sleep 30; done
if ! grep -q "QUEUE2" /root/repo/results/r3b/queue_status.log; then
  bash /root/repo/results/r3b/queue2.sh
fi

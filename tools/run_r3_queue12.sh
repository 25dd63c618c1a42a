#!/bin/bash
# Round-3 wave 12: dispatch-latency decomposition of config A.
cd /root/repo
until grep -q "QUEUE11 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE12 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_dispatch 2400
echo "QUEUE12 DONE $(date)" >> tools/logs/r3_queue.log

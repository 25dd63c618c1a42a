#!/bin/bash
# Round-3 wave 8: end-to-end verify with the tie-aware assertion.
cd /root/repo
until grep -q "QUEUE7 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE8 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run verify_e2e 1200
echo "QUEUE8 DONE $(date)" >> tools/logs/r3_queue.log

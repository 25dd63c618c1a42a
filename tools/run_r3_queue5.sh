#!/bin/bash
# Round-3 wave 5: width-16 headline knob sweep + turbo+refit candidate.
cd /root/repo
until grep -q "QUEUE4 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE5 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_head2 3600
echo "QUEUE5 DONE $(date)" >> tools/logs/r3_queue.log

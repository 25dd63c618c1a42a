#!/bin/bash
# Round-3 wave 3: waits for wave 2 (QUEUE2 DONE), then measures the
# fused path-tracer megakernel on the real chip.
cd /root/repo
until grep -q "QUEUE2 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE3 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_ptfused 2700
echo "QUEUE3 DONE $(date)" >> tools/logs/r3_queue.log

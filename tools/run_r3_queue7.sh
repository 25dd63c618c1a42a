#!/bin/bash
# Round-3 wave 7: fused PT megakernel measurement (compiles after the
# i1-select fix) + 10M device build (phase-A split to fit HBM).
cd /root/repo
until grep -q "QUEUE6 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE7 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_ptfused 2700
run exp_r3_devbuild5 2400
echo "QUEUE7 DONE $(date)" >> tools/logs/r3_queue.log

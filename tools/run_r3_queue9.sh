#!/bin/bash
# Round-3 wave 9: 10M device build (phase-B per-component gathers +
# chunked leaf assembly + donation), then the full tracked matrix
# refresh (fused config B, octant AO, BVH16 recipes).
cd /root/repo
until grep -q "QUEUE8 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE9 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_devbuild5 2400
echo "=== bench_matrix start $(date)" >> tools/logs/r3_queue.log
timeout 3600 python bench_matrix.py \
  > tools/logs/matrix_r3b.out 2> tools/logs/matrix_r3b.log
echo "=== bench_matrix rc=$? end $(date)" >> tools/logs/r3_queue.log
echo "QUEUE9 DONE $(date)" >> tools/logs/r3_queue.log

#!/bin/bash
# Round-3 wave 11: final tracked-matrix refresh — fused config B with
# traced spp (the wave-9 run recompiled inside the timed call), octant
# incoherent row.
cd /root/repo
until grep -q "QUEUE10 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE11 start $(date)" >> tools/logs/r3_queue.log
echo "=== bench_matrix start $(date)" >> tools/logs/r3_queue.log
timeout 3600 python bench_matrix.py \
  > tools/logs/matrix_r3c.out 2> tools/logs/matrix_r3c.log
echo "=== bench_matrix rc=$? end $(date)" >> tools/logs/r3_queue.log
echo "QUEUE11 DONE $(date)" >> tools/logs/r3_queue.log

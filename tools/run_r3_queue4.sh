#!/bin/bash
# Round-3 wave 4: re-run the config-A AO knob sweep (crashed in wave 1
# on the traced-octant_major bug, fixed in models/objrender.py).
cd /root/repo
until grep -q "QUEUE3 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE4 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_ao 2400
echo "QUEUE4 DONE $(date)" >> tools/logs/r3_queue.log

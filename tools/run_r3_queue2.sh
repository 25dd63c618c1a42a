#!/bin/bash
# Round-3 wave 2 (consolidated): waits for wave 1 (QUEUE DONE), then
# runs the verification script + the queued experiments sequentially.
cd /root/repo
until grep -q "QUEUE DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 45; done
echo "QUEUE2 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run verify_e2e 1200
run exp_r3_ptfused 2700
run exp_r3_ptdecomp 2400
run exp_r3_ao 2400
run exp_r3_head2 3600
echo "QUEUE2 DONE $(date)" >> tools/logs/r3_queue.log

#!/bin/bash
# Round-3 wave 10: 10M device build warm timing (cold completed in wave
# 9 at 163.7 s; the warm loop OOMed holding the previous tables) + final
# end-to-end verify.
cd /root/repo
until grep -q "QUEUE9 DONE" tools/logs/r3_queue.log 2>/dev/null; do sleep 60; done
echo "QUEUE10 start $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_devbuild5 2400
run verify_e2e 1200
echo "QUEUE10 DONE $(date)" >> tools/logs/r3_queue.log

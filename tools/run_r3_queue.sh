#!/bin/bash
# Round-3 TPU experiment queue: waits for the axon tunnel to answer a
# trivial op, then runs the queued experiments sequentially (one TPU
# client at a time; each gets its own log pair under tools/logs/).
cd /root/repo
probe() {
  timeout 45 python -c "import jax; jax.devices()" >/dev/null 2>&1
}
until probe; do sleep 90; done
date > /tmp/tpu_recovered
echo "TPU up at $(date)" >> tools/logs/r3_queue.log

run() {
  name=$1
  tmo=${2:-1800}
  echo "=== $name start $(date)" >> tools/logs/r3_queue.log
  timeout "$tmo" python tools/$name.py \
    > tools/logs/$name.out 2> tools/logs/$name.log
  echo "=== $name rc=$? end $(date)" >> tools/logs/r3_queue.log
}

run exp_r3_head 3600
run exp_r3_ptprof
run exp_r3_configB
run exp_r3_inco2
run exp_r3_ao
run exp_r3_devbuild5
# headline sanity with the shipping defaults (what the driver will run)
echo "=== bench start $(date)" >> tools/logs/r3_queue.log
timeout 1800 python bench.py \
  > tools/logs/bench_r3.out 2> tools/logs/bench_r3.log
echo "=== bench rc=$? end $(date)" >> tools/logs/r3_queue.log
echo "QUEUE DONE $(date)" >> tools/logs/r3_queue.log

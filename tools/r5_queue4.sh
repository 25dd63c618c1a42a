#!/bin/sh
# r5 queue 4: wait for the verify run, then the three open TPU
# measurements, sequentially (single chip + single throttled vCPU).
cd /root/repo || exit 1
L=tools/logs
while kill -0 "$(cat /tmp/verify_r5c.pid)" 2>/dev/null; do sleep 20; done

echo "=== tenm_device $(date)" >> $L/r5_queue4.log
timeout 2400 python tools/matrix_tenm_device.py \
  > $L/matrix_r5_tenm6.log 2>&1
echo "=== tenm_device rc=$? $(date)" >> $L/r5_queue4.log

echo "=== incoknobs $(date)" >> $L/r5_queue4.log
timeout 7200 python tools/exp_r5_incoknobs.py \
  > $L/exp_r5_incoknobs.log 2>&1
echo "=== incoknobs rc=$? $(date)" >> $L/r5_queue4.log

echo "=== devgap $(date)" >> $L/r5_queue4.log
timeout 3600 python tools/exp_r5_devgap.py \
  > $L/exp_r5_devgap.log 2>&1
echo "=== devgap rc=$? $(date)" >> $L/r5_queue4.log
echo "=== queue done $(date)" >> $L/r5_queue4.log

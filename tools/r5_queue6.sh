#!/bin/sh
# r5 queue 6: midscale fault bisect, instrumented tenm attempt (full
# traceback to tools/logs/tenm_attempt_trace.log), config-B bounce
# decomposition. Serial TPU use; 150s worker-recovery sleeps after
# fault-capable steps.
cd /root/repo || exit 1
L=tools/logs

echo "=== midscale probe $(date)" >> $L/r5_queue6.log
timeout 3000 python tools/exp_r5_midscale_probe.py \
  > $L/exp_r5_midscale_probe.log 2>&1
rc=$?
echo "=== midscale probe rc=$rc $(date)" >> $L/r5_queue6.log
if [ "$rc" != "0" ]; then sleep 150; fi

echo "=== tenm instrumented $(date)" >> $L/r5_queue6.log
NANORT_TENM_ATTEMPTS=1 NANORT_TENM_MAX_WAIT_S=0 \
  timeout 2400 python tools/matrix_tenm_device.py \
  > $L/tenm_instrumented.out 2> $L/tenm_instrumented.err
echo "=== tenm rc=$? $(date)" >> $L/r5_queue6.log
sleep 30

echo "=== ptb decomp $(date)" >> $L/r5_queue6.log
timeout 4800 python tools/exp_r5_ptb_decomp.py \
  > $L/exp_r5_ptb_decomp.log 2>&1
echo "=== ptb decomp rc=$? $(date)" >> $L/r5_queue6.log
echo "=== queue6 done $(date)" >> $L/r5_queue6.log

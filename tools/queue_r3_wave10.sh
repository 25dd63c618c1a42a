#!/bin/bash
# Round-3 wave 10: wait for the bench_matrix run to release the chip,
# then run the watertight lq_cap sweep and the config-A decomposition.
cd /root/repo
echo "WAVE10 waiting for matrix pid $(cat /tmp/matrix.pid 2>/dev/null)"
while kill -0 "$(cat /tmp/matrix.pid 2>/dev/null)" 2>/dev/null; do
  sleep 20
done
echo "WAVE10 start $(date)"
echo "=== exp_r3_head3 start $(date)"
timeout 1800 python tools/exp_r3_head3.py \
  > tools/logs/exp_r3_head3.out 2> tools/logs/exp_r3_head3.log
echo "=== exp_r3_head3 rc=$? end $(date)"
echo "=== exp_r3_ao2 start $(date)"
timeout 1800 python tools/exp_r3_ao2.py \
  > tools/logs/exp_r3_ao2.out 2> tools/logs/exp_r3_ao2.log
echo "=== exp_r3_ao2 rc=$? end $(date)"
echo "WAVE10 DONE $(date)"

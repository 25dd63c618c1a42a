#!/bin/sh
# r5 queue 5: recover from the pt_midscale TPU-worker fault — tracked
# rows first (incoherent, tenm), then the fault-suspect midscale row
# ISOLATED, then the optional spp probes.
cd /root/repo || exit 1
L=tools/logs

echo "=== inco+tenm subset $(date)" >> $L/r5_queue5.log
NANORT_MATRIX_MERGE=1 \
NANORT_MATRIX_SKIP=headline,headline_unspec,headline_devtree,config_a,config_b,pt_midscale \
  timeout 5400 python bench_matrix.py > $L/matrix_r5_subset2.log 2>&1
echo "=== inco+tenm rc=$? $(date)" >> $L/r5_queue5.log

echo "=== pt_midscale isolated $(date)" >> $L/r5_queue5.log
NANORT_MATRIX_MERGE=1 \
NANORT_MATRIX_SKIP=headline,headline_unspec,headline_devtree,config_a,config_b,incoherent,tenm \
  timeout 3600 python bench_matrix.py > $L/matrix_r5_midscale.log 2>&1
rc=$?
echo "=== pt_midscale rc=$rc $(date)" >> $L/r5_queue5.log
if [ "$rc" != "0" ]; then sleep 150; fi  # worker fault recovery window

python tools/sync_baseline.py >> $L/r5_queue5.log 2>&1

echo "=== spplanes2 retry $(date)" >> $L/r5_queue5.log
timeout 3600 python tools/exp_r5_spplanes2.py > $L/exp_r5_spplanes2b.log 2>&1
echo "=== spplanes2 rc=$? $(date)" >> $L/r5_queue5.log
echo "=== queue5 done $(date)" >> $L/r5_queue5.log

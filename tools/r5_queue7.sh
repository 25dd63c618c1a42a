#!/bin/sh
# r5 queue 7: (1) pt_midscale row via the new >20K-tri megabatch route,
# (2) headline + unspec + devtree in ONE session so the three tracked
# numbers share tunnel conditions (the r5 subset measured unspec/devtree
# in a slow session vs the r4 headline), (3) one more instrumented tenm
# attempt. Syncs BASELINE after each merge.
cd /root/repo || exit 1
L=tools/logs

echo "=== midscale row $(date)" >> $L/r5_queue7.log
NANORT_MATRIX_MERGE=1 \
NANORT_MATRIX_SKIP=headline,headline_unspec,headline_devtree,config_a,config_b,incoherent,tenm \
  timeout 3600 python bench_matrix.py > $L/matrix_r5_midscale2.log 2>&1
rc=$?
echo "=== midscale row rc=$rc $(date)" >> $L/r5_queue7.log
if [ "$rc" != "0" ]; then sleep 150; fi

echo "=== headline triple $(date)" >> $L/r5_queue7.log
NANORT_MATRIX_MERGE=1 \
NANORT_MATRIX_SKIP=config_a,config_b,pt_midscale,incoherent,tenm \
  timeout 5400 python bench_matrix.py > $L/matrix_r5_headline3.log 2>&1
rc=$?
echo "=== headline triple rc=$rc $(date)" >> $L/r5_queue7.log
if [ "$rc" != "0" ]; then sleep 150; fi

python tools/sync_baseline.py >> $L/r5_queue7.log 2>&1

echo "=== tenm retry $(date)" >> $L/r5_queue7.log
NANORT_TENM_ATTEMPTS=2 NANORT_TENM_MAX_WAIT_S=600 \
  timeout 3600 python tools/matrix_tenm_device.py \
  > $L/tenm_retry2.out 2> $L/tenm_retry2.err
echo "=== tenm retry rc=$? $(date)" >> $L/r5_queue7.log
echo "=== queue7 done $(date)" >> $L/r5_queue7.log

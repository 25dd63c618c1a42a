#!/bin/sh
# r5 queue 4c: post-compaction instrumented inco decomposition (stage
# A/B vs the 12:44 pre-compaction run, same T=512/K=8 protocol), then
# the endgame subset matrix re-run — headline_unspec (new tracked row),
# config_b (spp-lane auto default), pt_midscale (first tracked run),
# incoherent (T=1024 default), tenm (process-isolated device tool) —
# then baseline sync.
cd /root/repo || exit 1
L=tools/logs
while kill -0 "$(cat /tmp/r5q4.pid)" 2>/dev/null; do sleep 30; done

echo "=== inco2 $(date)" >> $L/r5_queue4.log
timeout 2400 python tools/exp_r5_inco.py > $L/exp_r5_inco2.log 2>&1
cp tools/logs/exp_r5_inco.json tools/logs/exp_r5_inco2.json 2>/dev/null
echo "=== inco2 rc=$? $(date)" >> $L/r5_queue4.log

echo "=== matrix subset $(date)" >> $L/r5_queue4.log
NANORT_MATRIX_MERGE=1 NANORT_MATRIX_SKIP=headline,config_a \
  timeout 7200 python bench_matrix.py > $L/matrix_r5_subset.log 2>&1
echo "=== matrix subset rc=$? $(date)" >> $L/r5_queue4.log

python tools/sync_baseline.py >> $L/r5_queue4.log 2>&1
echo "=== queue4c done $(date)" >> $L/r5_queue4.log

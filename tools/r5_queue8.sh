#!/bin/sh
# r5 queue 8: the axon TPU went UNAVAILABLE ~23:20 (backend init fails;
# a tiny matmul probe hangs). Wait it out with a liveness gate, then run
# the remaining tracked rows serially:
#   1. headline + unspec + devtree in ONE session (same-tunnel numbers)
#   2. pt_midscale via the NEW spp-chunked fused route (+ ungated
#      sah_build refresh — the 0.717 value was polluted by concurrent
#      pytest)
#   3. tenm devicebuild retry (instrumented)
#   4. sync BASELINE
cd /root/repo || exit 1
L=tools/logs
echo "=== queue8 start $(date)" >> $L/r5_queue8.log

n=0
while [ $n -lt 60 ]; do
  if timeout 180 python -c "import jax, jax.numpy as jnp; x = jnp.ones((8, 128)); print(float((x @ x.T).sum()))" > /dev/null 2>&1; then
    echo "=== tpu alive $(date)" >> $L/r5_queue8.log
    break
  fi
  echo "# tpu down, waiting ($n) $(date)" >> $L/r5_queue8.log
  sleep 120
  n=$((n+1))
done

echo "=== headline triple $(date)" >> $L/r5_queue8.log
NANORT_MATRIX_MERGE=1 \
NANORT_MATRIX_SKIP=config_a,config_b,pt_midscale,incoherent,tenm \
  timeout 5400 python bench_matrix.py > $L/matrix_r5_headline4.log 2>&1
rc=$?
echo "=== headline triple rc=$rc $(date)" >> $L/r5_queue8.log
if [ "$rc" != "0" ]; then sleep 150; fi

echo "=== midscale chunked $(date)" >> $L/r5_queue8.log
NANORT_MATRIX_MERGE=1 \
NANORT_MATRIX_SKIP=headline,headline_unspec,headline_devtree,config_a,config_b,incoherent,tenm \
  timeout 3600 python bench_matrix.py > $L/matrix_r5_midscale3.log 2>&1
rc=$?
echo "=== midscale chunked rc=$rc $(date)" >> $L/r5_queue8.log
if [ "$rc" != "0" ]; then sleep 150; fi

python tools/sync_baseline.py >> $L/r5_queue8.log 2>&1

echo "=== tenm retry $(date)" >> $L/r5_queue8.log
NANORT_TENM_ATTEMPTS=2 NANORT_TENM_MAX_WAIT_S=300 \
  timeout 3600 python tools/matrix_tenm_device.py \
  > $L/tenm_retry3.out 2> $L/tenm_retry3.err
echo "=== tenm retry rc=$? $(date)" >> $L/r5_queue8.log
echo "=== queue8 done $(date)" >> $L/r5_queue8.log

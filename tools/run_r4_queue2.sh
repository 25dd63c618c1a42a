#!/bin/bash
# round-4 TPU queue, wave 2: refit measurement, fixed gather bench,
# devbuild retry with chunked queries + per-phase memory stats
cd /root/repo
python tools/exp_r4_refit.py > tools/logs/exp_r4_refit.out 2>&1
python tools/experiments/inco_gather_bench.py \
    > tools/logs/inco_gather_bench.out 2>&1
NANORT_DEVBUILD_DEBUG=1 python tools/exp_r4_devbuild.py \
    > tools/logs/exp_r4_devbuild.out 2>&1

#!/bin/bash
# round-4 TPU experiment queue (one job at a time on the single chip)
cd /root/repo
python tools/experiments/inco_gather_bench.py \
    > tools/logs/inco_gather_bench.out 2>&1
python tools/exp_r4_devbuild.py \
    > tools/logs/exp_r4_devbuild.out 2>&1

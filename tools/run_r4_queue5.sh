#!/bin/bash
# round-4 TPU queue, wave 5: SAH-top slowdown isolation, config-B
# azimuth-wedge stratification, packet-interleave sync microbench
cd /root/repo
# 10M devbuild FIRST: the tunnel worker appears to accumulate memory
# across client processes (10M cold built fine as wave 2/3's early job,
# OOMed after wave 4's many 1M/2M builds)
python tools/exp_r4_devbuild.py > tools/logs/exp_r4_devbuild4.out 2>&1
python tools/exp_r4_devsah2.py > tools/logs/exp_r4_devsah2.out 2>&1
python tools/exp_r4_ptb2.py > tools/logs/exp_r4_ptb2.out 2>&1
python tools/experiments/profile_interleave.py \
    > tools/logs/profile_interleave.out 2>&1

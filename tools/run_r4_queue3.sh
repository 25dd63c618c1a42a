#!/bin/bash
# round-4 TPU queue, wave 3: refit (wave-ring DMA fix), AO stratification
# sweep, devbuild warm-rebuild retry (gc + barrier between builds)
cd /root/repo
R4_REFIT_ONLY=1 python tools/exp_r4_refit.py \
    > tools/logs/exp_r4_refit2.out 2>&1
python tools/exp_r4_aostrat.py > tools/logs/exp_r4_aostrat.out 2>&1
NANORT_DEVBUILD_DEBUG=1 python tools/exp_r4_devbuild.py \
    > tools/logs/exp_r4_devbuild2.out 2>&1

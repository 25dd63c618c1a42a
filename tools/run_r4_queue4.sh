#!/bin/bash
# round-4 TPU queue, wave 4: shipped-AO end-to-end, SAH-top trace perf,
# devbuild rebuild retry (nothing live between builds) + 2M control
cd /root/repo
python tools/exp_r4_aoship.py > tools/logs/exp_r4_aoship.out 2>&1
python tools/exp_r4_devsah.py > tools/logs/exp_r4_devsah.out 2>&1
R4_TRIS=2000000 python tools/exp_r4_devbuild.py \
    > tools/logs/exp_r4_devbuild_2m.out 2>&1
python tools/exp_r4_devbuild.py > tools/logs/exp_r4_devbuild3.out 2>&1

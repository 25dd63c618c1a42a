#!/bin/sh
# r5 queue 4b: runs after queue4 — config-B deep spp-lane probes.
cd /root/repo || exit 1
L=tools/logs
while kill -0 "$(cat /tmp/r5q4.pid)" 2>/dev/null; do sleep 30; done
echo "=== spplanes2 $(date)" >> $L/r5_queue4.log
timeout 3600 python tools/exp_r5_spplanes2.py > $L/exp_r5_spplanes2.log 2>&1
echo "=== spplanes2 rc=$? $(date)" >> $L/r5_queue4.log

#!/bin/sh
# Regenerate BENCH_MATRIX.json on the real TPU (the tracked benchmark
# matrix BASELINE.md quotes). This is the exact runner used for the
# round logs under tools/logs/matrix_r*.log (ADVICE r3 #1: commit the
# runner alongside its logs).
#
# Usage: sh tools/run_matrix.sh r4   (tag names the log file)
tag="${1:-run}"
cd "$(dirname "$0")/.." || exit 1
nohup python bench_matrix.py > "tools/logs/matrix_${tag}.log" 2>&1 &
echo "$!" > /tmp/matrix.pid
echo "matrix running (pid $(cat /tmp/matrix.pid)) -> tools/logs/matrix_${tag}.log"

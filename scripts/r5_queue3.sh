#!/bin/bash
# Round-5 queue, segment 3 — run AFTER r5_queue2.sh:
#   J. matrix stage 12: DR4SR+ third seeds (toys/yelp/beauty) so every
#      DR4SR+ row is n>=3 (VERDICT r4 weak-#4: yelp meta sits in seed noise)
#
#   nohup bash scripts/r5_queue3.sh > log/r5_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[q3 $(date +%H:%M:%S)] J: matrix stage 12 (DR4SR+ third seeds)"
$PY scripts/r3_matrix.py --stages 12 >> log/r5_matrix.log 2>&1
echo "[q3 $(date +%H:%M:%S)] stage 12 done rc=$?"

$PY scripts/summarize_r3.py >> log/r5_matrix.log 2>&1
echo "[q3 $(date +%H:%M:%S)] Q3_DONE"

#!/bin/bash
# Round-5 evidence queue (VERDICT r4 missing-#1/#2):
#   A. matrix stage 10: GNN rows on sport/beauty (base + winner arm, seeds 2023/7)
#   B. matrix stage 11: GNN on the r4 val-selected swept arms (toys/yelp)
#   C. yelp sweep arms: ewm1p0 (deferred in r4 for wall budget) + seed-7
#      replicate of the r4 val winner or2_ml3
#   D. matrix stage 5: sport MetaModel extra seeds {42,2024} + toys meta s17
#
#   nohup bash scripts/r5_queue1.sh > log/r5_queue1.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[q1 $(date +%H:%M:%S)] A: matrix stage 10 (GNN sport/beauty)"
$PY scripts/r3_matrix.py --stages 10 >> log/r5_matrix.log 2>&1
echo "[q1 $(date +%H:%M:%S)] stage 10 done rc=$?"
sleep 75

echo "[q1 $(date +%H:%M:%S)] B: matrix stage 11 (GNN on swept arms)"
$PY scripts/r3_matrix.py --stages 11 >> log/r5_matrix.log 2>&1
echo "[q1 $(date +%H:%M:%S)] stage 11 done rc=$?"
sleep 75

echo "[q1 $(date +%H:%M:%S)] C: yelp sweep arms (ewm1p0 + winner s7)"
$PY scripts/regen_sweep.py --dataset yelp \
  --out results_sweep_yelp_r4.json --patience 10 \
  --extra_set train.steps_per_dispatch=16 \
  --trials_json '[
    {"ew":-1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3},
    {"ew":1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3,"seed":7}
  ]'
sleep 75

echo "[q1 $(date +%H:%M:%S)] D: matrix stage 5 (sport meta extra seeds)"
$PY scripts/r3_matrix.py --stages 5 >> log/r5_matrix.log 2>&1
echo "[q1 $(date +%H:%M:%S)] stage 5 done rc=$?"

$PY scripts/summarize_r3.py >> log/r5_matrix.log 2>&1
echo "[q1 $(date +%H:%M:%S)] Q1_DONE"

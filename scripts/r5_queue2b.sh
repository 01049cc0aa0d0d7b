#!/bin/bash
# Round-5 queue, segment 2b:
#   I2. warm-cache rerun of the fused-meta job (503s included the scan
#       program's first compile; this isolates steady-state wall)
#   K.  stress decomposition (catalog-size / dropout / rng / fused-dispatch
#       ablations + exact-topk A/B) — explains the 90ms stress step
#   then segment 3 (DR4SR+ third seeds)
#
#   nohup bash scripts/r5_queue2b.sh > log/r5_queue2b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[q2b $(date +%H:%M:%S)] I2: fused-meta warm-cache rerun"
$PY scripts/run_suite.py --out results_fused_meta_warm.json --timeout 5400 --force \
  --jobs "MetaModel:amazon-toys:_regen:model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5,train.seed=2023,train.steps_per_dispatch=16"
sleep 75

echo "[q2b $(date +%H:%M:%S)] K: stress decomposition"
bash scripts/tpu_run.sh log/r5_stress_decompose.log 900 3000 \
  $PY scripts/stress_decompose.py --out results_stress_decompose.json
echo "[q2b $(date +%H:%M:%S)] decompose rc=$?"
sleep 75

echo "[q2b $(date +%H:%M:%S)] J: queue segment 3 (DR4SR+ third seeds)"
bash scripts/r5_queue3.sh
echo "[q2b $(date +%H:%M:%S)] Q2B_DONE"

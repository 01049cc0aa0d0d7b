#!/bin/bash
# Round-5 queue, segment 5 (capstone arms) — run AFTER r5_queue4.sh:
#   N. toys beam-arm seed-7 replicate (is the beam win seed-stable?)
#   O. DR4SR+ stacked on the beam-decoded toys file (does the best data
#      mixture + bilevel reweighting compose?) — fused dispatch (spd16,
#      bit-parity proven) for wall budget
#
#   nohup bash scripts/r5_queue5.sh > log/r5_queue5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[q5 $(date +%H:%M:%S)] N: toys beam arm seed-7 replicate"
$PY scripts/regen_sweep.py --dataset amazon-toys \
  --embedding /root/reference/dataset/amazon-toys/toy/pre-trained_embedding.ckpt \
  --out results_sweep_toys_r4.json --patience 10 \
  --extra_set train.steps_per_dispatch=16 \
  --trials_json '[{"ew":1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3,"beam":4,"seed":7}]'
sleep 75

echo "[q5 $(date +%H:%M:%S)] O: DR4SR+ on the beam-decoded toys file"
$PY scripts/run_suite.py --out results_beam_meta.json --timeout 5400 --chunk 2 \
  --jobs \
  "MetaModel:amazon-toys:_sw_ew1p0_g0p0_both_a5b2K5_or2_ml3_bw4:model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5,train.seed=2023,train.steps_per_dispatch=16" \
  "MetaModel:amazon-toys:_sw_ew1p0_g0p0_both_a5b2K5_or2_ml3_bw4:model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5,train.seed=7,train.steps_per_dispatch=16"
echo "[q5 $(date +%H:%M:%S)] Q5_DONE"

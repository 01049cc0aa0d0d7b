#!/bin/bash
# Round-5 queue, segment 6 (beam-story completion):
#   P. sport beam arm (4th dataset: winner mixture + beam_width=4)
#   Q. toys beam arm seed-42 (SASRec, third seed) + DR4SR+-on-beam seed 42
#   R. GNN on the beam-decoded toys file (does the backbone that liked the
#      swept arm also like the beam mixture?)
#
#   nohup bash scripts/r5_queue6.sh > log/r5_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

latest_ckpt() { ls -t "saved/SASRec/$1"/*.ckpt 2>/dev/null | head -1; }

echo "[q6 $(date +%H:%M:%S)] P: sport beam arm"
$PY scripts/regen_sweep.py --dataset amazon-sport \
  --embedding "$(latest_ckpt amazon-sport)" \
  --out results_sweep_sport_r3.json --patience 10 \
  --extra_set train.steps_per_dispatch=16 \
  --trials_json '[{"ew":-1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3,"beam":4}]'
sleep 75

echo "[q6 $(date +%H:%M:%S)] Q: toys beam arm seed 42 + meta-on-beam seed 42"
$PY scripts/regen_sweep.py --dataset amazon-toys \
  --embedding /root/reference/dataset/amazon-toys/toy/pre-trained_embedding.ckpt \
  --out results_sweep_toys_r4.json --patience 10 \
  --extra_set train.steps_per_dispatch=16 \
  --trials_json '[{"ew":1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3,"beam":4,"seed":42}]'
sleep 75
$PY scripts/run_suite.py --out results_beam_meta.json --timeout 5400 \
  --jobs "MetaModel:amazon-toys:_sw_ew1p0_g0p0_both_a5b2K5_or2_ml3_bw4:model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5,train.seed=42,train.steps_per_dispatch=16"
sleep 75

echo "[q6 $(date +%H:%M:%S)] R: GNN on the beam-decoded toys file"
$PY scripts/run_suite.py --out results_r3_matrix.json --timeout 2700 --chunk 2 \
  --jobs \
  "GNN:amazon-toys:_sw_ew1p0_g0p0_both_a5b2K5_or2_ml3_bw4:train.seed=2023" \
  "GNN:amazon-toys:_sw_ew1p0_g0p0_both_a5b2K5_or2_ml3_bw4:train.seed=7"
echo "[q6 $(date +%H:%M:%S)] Q6_DONE"

#!/bin/bash
# Round-5 queue, segment 4 (final chip work):
#   L. bench re-capture (grouped-topk revert restores exact-eval)
#   M. beam-decode arms on yelp + beauty (beam_width=4 over each dataset's
#      winner mixture) — does the toys beam win generalize?
#
#   nohup bash scripts/r5_queue4.sh > log/r5_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[q4 $(date +%H:%M:%S)] L: bench re-capture"
bash scripts/tpu_run.sh log/r5_bench2.log 900 3000 $PY bench.py --stress
tail -1 log/r5_bench2.log > BENCH_R5_EARLY.json 2>/dev/null
echo "[q4 $(date +%H:%M:%S)] bench rc=$?"
sleep 75

echo "[q4 $(date +%H:%M:%S)] M: yelp beam arm"
$PY scripts/regen_sweep.py --dataset yelp \
  --out results_sweep_yelp_r4.json --patience 10 \
  --extra_set train.steps_per_dispatch=16 \
  --trials_json '[{"ew":1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3,"beam":4}]'
sleep 75

echo "[q4 $(date +%H:%M:%S)] M: beauty beam arm"
$PY scripts/regen_sweep.py --dataset amazon-beauty \
  --embedding /root/reference/dataset/amazon-beauty/beauty/pre-trained_embedding.ckpt \
  --out results_sweep_beauty_r3.json --patience 10 \
  --extra_set train.steps_per_dispatch=16 \
  --trials_json '[{"ew":-1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3,"beam":4}]'
echo "[q4 $(date +%H:%M:%S)] Q4_DONE"

#!/bin/bash
# Round-4 queue, segment 2 (VERDICT r3 next-#1/#2):
#   E. rebuild the sport/beauty val-selected winner regen files
#      (_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3) via the 3 stage CLIs with
#      sweep-compatible artifact names
#   F. matrix stage 7: per-backbone rows on sport + beauty (seed-paired)
#   G. toys/yelp regeneration-arm sweeps (mixture knobs or2/ml3/patterns on
#      the cached ew1.0 regenerator + the sport/beauty-winning ew-1.0 arm)
#   H. stretch: matrix stage 5 (sport MetaModel extra seeds)
#
#   nohup bash scripts/r4_queue2.sh > log/r4_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

latest_ckpt() { ls -t "saved/SASRec/$1"/*.ckpt 2>/dev/null | head -1; }

# winner pipeline: ew -1.0 regenerator, or2+ml3 mixture (the val-selected
# arm from the round-2 sport/beauty sweeps)
winner_pipeline() {  # <root> <embedding>
  local root=$1 emb=$2 tag out
  tag=$(basename "$root")
  out="train_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3"
  if [ -f "$root/$out.npz" ]; then return 0; fi
  if [ ! -f "$root/patterns_a5b2.npz" ] || [ ! -f "$root/pairs_a5b2.pkl" ]; then
    bash scripts/tpu_run.sh "log/q2_s1_$tag.log" 600 1800 \
      $PY scripts/build_pretraining_dataset.py --root_path "$root" \
      --alpha 5 --beta 2 --n_jobs 4 \
      --patterns_out patterns_a5b2 --pairs_out pairs_a5b2.pkl || return 1
    sleep 75
  fi
  if [ ! -f "$root/regenerator_a5b2K5ewm1p0.msgpack" ]; then
    bash scripts/tpu_run.sh "log/q2_s2_$tag.log" 900 3600 \
      $PY scripts/pretrain_regenerator.py --root_path "$root" --K 5 \
      --epochs 40 --pairs_name pairs_a5b2.pkl \
      --output_name regenerator_a5b2K5ewm1p0.msgpack \
      --entropy_weight -1.0 ${emb:+--embedding "$emb"} || return 1
    sleep 75
  fi
  bash scripts/tpu_run.sh "log/q2_s3_$tag.log" 900 2400 \
    $PY scripts/hybrid_inference.py --root_path "$root" --K 5 \
    --batch_size 2048 --ckpt_name regenerator_a5b2K5ewm1p0.msgpack \
    --patterns_name patterns_a5b2 --gamma 0.0 \
    --original_repeat 2 --min_regen_len 3 \
    --out_name "$out" \
    --regen_cache "$root/regen_a5b2K5ewm1p0_g0p0_L25.pkl" || return 1
  sleep 75
}

echo "[q2 $(date +%H:%M:%S)] E: sport/beauty winner regen files"
winner_pipeline dataset/amazon-sport/sport "$(latest_ckpt amazon-sport)" || exit 1
winner_pipeline dataset/amazon-beauty/beauty \
  /root/reference/dataset/amazon-beauty/beauty/pre-trained_embedding.ckpt || exit 1

echo "[q2 $(date +%H:%M:%S)] F: matrix stage 7 (backbones on sport/beauty)"
$PY scripts/r3_matrix.py --stages 7 >> log/r4_matrix.log 2>&1
echo "[q2 $(date +%H:%M:%S)] stage 7 done rc=$?"

# mixture-knob arms reuse the cached ew1.0 regenerator + decode cache from
# segment 1; the ewm1p0 arm (sport/beauty winner family) trains one extra
# regenerator per dataset and runs LAST so a time-out costs the least
TRIALS='[
 {"ew":1.0,"gamma":0.0,"variant":"both","orep":2},
 {"ew":1.0,"gamma":0.0,"variant":"both","minlen":3},
 {"ew":1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3},
 {"variant":"patterns"},
 {"ew":-1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3}
]'

echo "[q2 $(date +%H:%M:%S)] G: toys regen-arm sweep"
$PY scripts/regen_sweep.py --dataset amazon-toys \
  --embedding /root/reference/dataset/amazon-toys/toy/pre-trained_embedding.ckpt \
  --out results_sweep_toys_r4.json --trials_json "$TRIALS" --patience 10
sleep 75
echo "[q2 $(date +%H:%M:%S)] G: yelp regen-arm sweep"
$PY scripts/regen_sweep.py --dataset yelp \
  --embedding "$(latest_ckpt yelp)" \
  --out results_sweep_yelp_r4.json --trials_json "$TRIALS" --patience 10
sleep 75

echo "[q2 $(date +%H:%M:%S)] H: matrix stage 5 (meta extra seeds, stretch)"
$PY scripts/r3_matrix.py --stages 5 >> log/r4_matrix.log 2>&1

$PY scripts/summarize_r3.py >> log/r4_matrix.log 2>&1
echo "[q2 $(date +%H:%M:%S)] Q2_DONE"

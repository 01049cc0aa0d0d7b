#!/bin/bash
# Round-3 bootstrap after a machine reset wiped dataset/ and saved/:
# rebuild everything the evidence matrix needs, then run the matrix.
#
#   A. preprocess the 4 datasets from the reference's bundled seq2pat files
#      (deterministic leave-last-out protocol — same rows as rounds 1-2)
#   B. matrix stage-1 BASE arms (also produces the SASRec checkpoints that
#      seed the sport/yelp regenerator embeddings, as in rounds 1-2)
#   C. regen pipelines: toys/yelp standard `_regen` (defaults a5b2 K5 ew1.0
#      g0.0), sport/beauty val-selected winner `_sw_ewm1p0_g0p0_both_a5b2K5_
#      or2_ml3` (ew -1.0, orep 2, minlen 3) via the resumable sweep runner
#   D. the rest of the matrix (stages 1-5; stage-1 base arms cached)
#   E. summarize into RESULTS_R3.md
#
#   nohup bash scripts/r3_bootstrap.sh > log/r3_bootstrap.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[bootstrap $(date +%H:%M:%S)] A: preprocess"
for pair in amazon-toys:toy amazon-beauty:beauty amazon-sport:sport yelp:yelp; do
  ds=${pair%%:*}; dom=${pair##*:}
  if [ ! -f "dataset/$ds/$dom/meta.npz" ]; then
    $PY scripts/preprocess.py \
      --from-seq2pat "/root/reference/dataset/$ds/$dom/seq2pat_data.pth" \
      --out "dataset/$ds/$dom" || exit 1
  fi
done

echo "[bootstrap $(date +%H:%M:%S)] B: base arms (8 jobs)"
$PY scripts/run_suite.py --out results_r3_matrix.json --epochs 200 \
  --timeout 2700 --chunk 4 --jobs \
  SASRec:amazon-toys::train.seed=2023 SASRec:amazon-toys::train.seed=7 \
  SASRec:yelp::train.seed=2023 SASRec:yelp::train.seed=7 \
  SASRec:amazon-sport::train.seed=2023 SASRec:amazon-sport::train.seed=7 \
  SASRec:amazon-beauty::train.seed=2023 SASRec:amazon-beauty::train.seed=7
sleep 75

latest_ckpt() { ls -t "saved/SASRec/$1"/*.ckpt 2>/dev/null | head -1; }

std_pipeline() {  # <root> <embedding>
  local root=$1 emb=$2 tag
  tag=$(basename "$root")
  if [ ! -f "$root/train_regen.npz" ]; then
    bash scripts/tpu_run.sh "log/boot_s1_$tag.log" 600 1800 \
      $PY scripts/build_pretraining_dataset.py --root_path "$root" \
      --alpha 5 --beta 2 --n_jobs 4 || return 1
    sleep 75
    bash scripts/tpu_run.sh "log/boot_s2_$tag.log" 900 3600 \
      $PY scripts/pretrain_regenerator.py --root_path "$root" --K 5 \
      --epochs 40 ${emb:+--embedding "$emb"} || return 1
    sleep 75
    bash scripts/tpu_run.sh "log/boot_s3_$tag.log" 900 2400 \
      $PY scripts/hybrid_inference.py --root_path "$root" --K 5 \
      --batch_size 2048 || return 1
    sleep 75
  fi
}

WINNER='[{"ew":-1.0,"gamma":0.0,"variant":"both","minlen":3,"orep":2}]'

echo "[bootstrap $(date +%H:%M:%S)] C: regen pipelines"
std_pipeline dataset/amazon-toys/toy \
  /root/reference/dataset/amazon-toys/toy/pre-trained_embedding.ckpt
std_pipeline dataset/yelp/yelp "$(latest_ckpt yelp)"

if [ ! -f dataset/amazon-sport/sport/train_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3.npz ]; then
  $PY scripts/regen_sweep.py --dataset amazon-sport \
    --embedding "$(latest_ckpt amazon-sport)" \
    --out results_sweep_sport_r3.json --trials_json "$WINNER" --patience 10
  sleep 75
fi
if [ ! -f dataset/amazon-beauty/beauty/train_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3.npz ]; then
  $PY scripts/regen_sweep.py --dataset amazon-beauty \
    --embedding /root/reference/dataset/amazon-beauty/beauty/pre-trained_embedding.ckpt \
    --out results_sweep_beauty_r3.json --trials_json "$WINNER" --patience 10
  sleep 75
fi

echo "[bootstrap $(date +%H:%M:%S)] D: evidence matrix"
$PY scripts/r3_matrix.py --stages 1,2,3,4,5,6 >> log/r3_matrix.log 2>&1
echo "[bootstrap $(date +%H:%M:%S)] matrix done rc=$?"

echo "[bootstrap $(date +%H:%M:%S)] E: summarize"
$PY scripts/summarize_r3.py >> log/r3_matrix.log 2>&1
echo "[bootstrap $(date +%H:%M:%S)] ALL DONE"

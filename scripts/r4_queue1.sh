#!/bin/bash
# Round-4 queue, segment 1 (VERDICT r3 next-#1): rebuild the wiped dataset/
# + saved/ state (same recipe as r3_bootstrap.sh), then land the highest-
# priority missing matrix rows — GNN (stage 6) and the 3rd-seed replicates
# for the two contested backbone cells (stage 8).
#
# Pipeline artifacts use the regen_sweep naming convention
# (patterns_a5b2 / pairs_a5b2.pkl / regenerator_a5b2K5ew1p0.msgpack /
# regen_<tag>_g0p0_L25.pkl) so segment 2's toys/yelp mixture sweeps reuse
# the mined patterns, the trained regenerator AND the decode cache instead
# of rebuilding them.
#
#   nohup bash scripts/r4_queue1.sh > log/r4_queue1.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[q1 $(date +%H:%M:%S)] A: preprocess"
for pair in amazon-toys:toy amazon-beauty:beauty amazon-sport:sport yelp:yelp; do
  ds=${pair%%:*}; dom=${pair##*:}
  if [ ! -f "dataset/$ds/$dom/meta.npz" ]; then
    $PY scripts/preprocess.py \
      --from-seq2pat "/root/reference/dataset/$ds/$dom/seq2pat_data.pth" \
      --out "dataset/$ds/$dom" || exit 1
  fi
done

echo "[q1 $(date +%H:%M:%S)] B: mint SASRec ckpts for sport/yelp regenerator embeddings"
$PY scripts/run_suite.py --out results_r4_ckpt.json --epochs 200 \
  --timeout 2700 --jobs SASRec:amazon-sport: SASRec:yelp:
sleep 75

latest_ckpt() { ls -t "saved/SASRec/$1"/*.ckpt 2>/dev/null | head -1; }

# standard `_regen` pipeline with sweep-compatible artifact names
std_pipeline() {  # <root> <embedding>
  local root=$1 emb=$2 tag
  tag=$(basename "$root")
  if [ -f "$root/train_regen.npz" ]; then return 0; fi
  if [ ! -f "$root/patterns_a5b2.npz" ] || [ ! -f "$root/pairs_a5b2.pkl" ]; then
    bash scripts/tpu_run.sh "log/q1_s1_$tag.log" 600 1800 \
      $PY scripts/build_pretraining_dataset.py --root_path "$root" \
      --alpha 5 --beta 2 --n_jobs 4 \
      --patterns_out patterns_a5b2 --pairs_out pairs_a5b2.pkl || return 1
    sleep 75
  fi
  if [ ! -f "$root/regenerator_a5b2K5ew1p0.msgpack" ]; then
    bash scripts/tpu_run.sh "log/q1_s2_$tag.log" 900 3600 \
      $PY scripts/pretrain_regenerator.py --root_path "$root" --K 5 \
      --epochs 40 --pairs_name pairs_a5b2.pkl \
      --output_name regenerator_a5b2K5ew1p0.msgpack \
      ${emb:+--embedding "$emb"} || return 1
    sleep 75
  fi
  bash scripts/tpu_run.sh "log/q1_s3_$tag.log" 900 2400 \
    $PY scripts/hybrid_inference.py --root_path "$root" --K 5 \
    --batch_size 2048 --ckpt_name regenerator_a5b2K5ew1p0.msgpack \
    --patterns_name patterns_a5b2 \
    --regen_cache "$root/regen_a5b2K5ew1p0_g0p0_L25.pkl" || return 1
  sleep 75
}

echo "[q1 $(date +%H:%M:%S)] C: toys/yelp standard _regen pipelines"
std_pipeline dataset/amazon-toys/toy \
  /root/reference/dataset/amazon-toys/toy/pre-trained_embedding.ckpt || exit 1
std_pipeline dataset/yelp/yelp "$(latest_ckpt yelp)" || exit 1

echo "[q1 $(date +%H:%M:%S)] D: matrix stages 6 (GNN) + 8 (3rd-seed replicates)"
$PY scripts/r3_matrix.py --stages 6,8 >> log/r4_matrix.log 2>&1
echo "[q1 $(date +%H:%M:%S)] matrix 6,8 done rc=$?"

$PY scripts/summarize_r3.py >> log/r4_matrix.log 2>&1
echo "[q1 $(date +%H:%M:%S)] Q1_DONE"

#!/bin/bash
# Full DR4SR regeneration pipeline for every dataset: mine -> pretrain -> decode.
# Embedding seeds: bundled torch ckpt where the reference ships one (toy,
# beauty), else the latest framework SASRec checkpoint for that dataset.
set -x

run_pipeline() {
  local root=$1 emb=$2
  timeout 600  python scripts/build_pretraining_dataset.py --root_path "$root" --alpha 5 --beta 2 --n_jobs 8 || return 1
  timeout 1800 python scripts/pretrain_regenerator.py --root_path "$root" --K 5 --epochs 40 ${emb:+--embedding "$emb"} || return 1
  timeout 1800 python scripts/hybrid_inference.py --root_path "$root" --K 5 --batch_size 2048 || return 1
}

latest_ckpt() { ls -t "saved/SASRec/$1"/*.ckpt 2>/dev/null | head -1; }

run_pipeline dataset/amazon-beauty/beauty /root/reference/dataset/amazon-beauty/beauty/pre-trained_embedding.ckpt
run_pipeline dataset/amazon-sport/sport  "$(latest_ckpt amazon-sport)"
run_pipeline dataset/yelp/yelp           "$(latest_ckpt yelp)"
echo ALL_PIPELINES_DONE

#!/bin/bash
# Round-2 phase-1 regen sweeps for beauty + sport, run from a repo snapshot so
# concurrent development in /root/repo cannot change the code under a running
# subprocess. TPU jobs are strictly sequential (axon serializes clients).
set -x
SNAP=/tmp/sweep_r2_snapshot
rm -rf "$SNAP"
mkdir -p "$SNAP"
# code + configs + datasets; skip saved/ (142MB) — embedding paths are absolute
(cd /root/repo && tar cf - --exclude=./saved --exclude=./log --exclude=./.git \
    --exclude='__pycache__' .) | tar xf - -C "$SNAP"
cd "$SNAP" || exit 1

python scripts/regen_sweep.py --dataset amazon-beauty \
    --embedding /root/reference/dataset/amazon-beauty/beauty/pre-trained_embedding.ckpt \
    --out /root/repo/results_sweep_beauty.json --phase phase1 --patience 10
sleep 30
python scripts/regen_sweep.py --dataset amazon-sport \
    --embedding "$(ls -t /root/repo/saved/SASRec/amazon-sport/*.ckpt | head -1)" \
    --out /root/repo/results_sweep_sport.json --phase phase1 --patience 10
echo ALL_SWEEPS_DONE

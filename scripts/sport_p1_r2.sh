#!/bin/bash
# Sport phase-1 regen sweep (resumed under the trimmed 4-trial preset:
# ew{-1,+1} x gamma{0} both + regen-only + patterns-only). Runs in the
# /tmp/sweep_r2_snapshot code snapshot; stage products cached there.
cd /tmp/sweep_r2_snapshot || exit 1
python scripts/regen_sweep.py --dataset amazon-sport \
  --embedding "$(ls -t /root/repo/saved/SASRec/amazon-sport/*.ckpt | head -1)" \
  --out /root/repo/results_sweep_sport.json --phase phase1 --patience 10
echo SPORT_P1_DONE

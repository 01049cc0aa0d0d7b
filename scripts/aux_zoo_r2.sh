#!/bin/bash
# Aux CL model zoo rows on real data (VERDICT r1 #7 done-criterion):
# one result row each for the graph/intent-CL models on toys regen data.
cd /root/repo || exit 1
python scripts/run_suite.py --out results_aux_zoo.json --timeout 1500 --jobs \
  SGL:amazon-toys:_regen:train.early_stop_patience=10 \
  SimGCL:amazon-toys:_regen:train.early_stop_patience=10 \
  NCL:amazon-toys:_regen:train.early_stop_patience=10 \
  ICLRec:amazon-toys:_regen:train.early_stop_patience=10
echo AUX_ZOO_DONE

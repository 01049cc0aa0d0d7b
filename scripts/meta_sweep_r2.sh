#!/bin/bash
# DR4SR+ meta-hyperparameter sweep (VERDICT r1 #2): make MetaModel(SASRec)
# beat plain-regen SASRec on toys (then confirm on yelp). Runs AFTER the
# regen sweeps (TPU jobs must stay sequential). Selection on val_best.
set -x
cd /root/repo || exit 1
S=model.sub_model=SASRec
J=(
  "MetaModel:amazon-toys:_regen:$S"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean,train.meta_optimizer=adam"
  "MetaModel:amazon-toys:_regen:$S,train.interval=10,train.warmup_epoch=5"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean,train.interval=10,train.warmup_epoch=5"
  "MetaModel:amazon-toys:_regen:$S,train.meta_learning_rate=0.01"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean,model.tau_min=0.5"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean,train.hpo_learning_rate=0.01"
)
python scripts/run_suite.py --out results_meta_sweep.json --timeout 1800 --jobs "${J[@]}"

# aux-CL model zoo rows on real data (VERDICT r1 #7 done-criterion)
python scripts/run_suite.py --out results_aux_zoo.json --timeout 1800 --jobs \
  SGL:amazon-toys:_regen \
  SimGCL:amazon-toys:_regen \
  NCL:amazon-toys:_regen \
  ICLRec:amazon-toys:_regen
echo META_SWEEP_DONE

#!/bin/bash
# DR4SR+ meta-hyperparameter sweep (VERDICT r1 #2): make MetaModel(SASRec)
# beat plain-regen SASRec on toys. Runs AFTER the regen sweeps (TPU jobs must
# stay sequential). Selection on val_best. Six trials: the reference defaults,
# the inner-objective scale fix (sum -> mean at the warmup->weighted
# transition), and the round-1 schedule tweaks that helped, crossed with it.
set -x
cd /root/repo || exit 1
S=model.sub_model=SASRec
J=(
  "MetaModel:amazon-toys:_regen:$S"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean,train.meta_optimizer=adam"
  "MetaModel:amazon-toys:_regen:$S,train.inner_loss_scale=mean,train.interval=10,train.warmup_epoch=5"
)
python scripts/run_suite.py --out results_meta_sweep.json --timeout 1800 --jobs "${J[@]}"
echo META_SWEEP_DONE

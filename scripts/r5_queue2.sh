#!/bin/bash
# Round-5 queue, segment 2 — run AFTER r5_queue1.sh finishes:
#   E. on-chip kernel regression suite (tests_tpu) — re-validates the
#      round-5 bf16-operand flash kernels on hardware
#   F. stress-shape profile + per-op roofline (VERDICT r4 next-#4)
#   G. beam-decode swept arm on toys (VERDICT r4 next-#8): the r4 winner
#      mixture decoded with beam_width=4 instead of greedy
#   H. early bench capture (incl. stress) for the round narrative
#
#   nohup bash scripts/r5_queue2.sh > log/r5_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p log
PY=python

echo "[q2 $(date +%H:%M:%S)] E: on-chip kernel tests"
bash scripts/tpu_tests.sh 1800 > log/r5_tpu_tests.log 2>&1
echo "[q2 $(date +%H:%M:%S)] tests_tpu rc=$? (log/r5_tpu_tests.log)"
sleep 75

echo "[q2 $(date +%H:%M:%S)] F: stress profile"
bash scripts/tpu_run.sh log/r5_stress_profile.log 900 2400 \
  $PY scripts/stress_profile.py --out results_stress_profile.json
echo "[q2 $(date +%H:%M:%S)] stress profile rc=$?"
sleep 75

echo "[q2 $(date +%H:%M:%S)] G: toys beam-decode arm"
$PY scripts/regen_sweep.py --dataset amazon-toys \
  --embedding /root/reference/dataset/amazon-toys/toy/pre-trained_embedding.ckpt \
  --out results_sweep_toys_r4.json --patience 10 \
  --extra_set train.steps_per_dispatch=16 \
  --trials_json '[{"ew":1.0,"gamma":0.0,"variant":"both","orep":2,"minlen":3,"beam":4}]'
sleep 75

echo "[q2 $(date +%H:%M:%S)] I: MetaTrainer fused-dispatch wall-clock"
# same job as the r4 matrix cell (563s per-step, toys seed 2023) but with
# the round-5 fused bilevel dispatch — bit-parity means the metrics must
# reproduce the cached cell while wall_s drops (VERDICT r4 next-#3 done
# criterion). Records into its own file so the matrix protocol stays pure.
$PY scripts/run_suite.py --out results_fused_meta.json --timeout 5400 \
  --jobs "MetaModel:amazon-toys:_regen:model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5,train.seed=2023,train.steps_per_dispatch=16"
sleep 75

echo "[q2 $(date +%H:%M:%S)] H: early bench capture"
bash scripts/tpu_run.sh log/r5_bench.log 900 3000 \
  $PY bench.py --stress
tail -1 log/r5_bench.log > BENCH_R5_EARLY.json 2>/dev/null
echo "[q2 $(date +%H:%M:%S)] Q2_DONE"

#!/bin/bash
# Round-3 TPU watcher: probe the axon backend with a subprocess health check
# (a hung client cannot be recovered in-process); the moment it comes up,
# run the round-3 work queue in priority order. Survives the shell (nohup).
#   nohup bash scripts/r3_autolaunch.sh > log/r3_autolaunch.log 2>&1 &
cd "$(dirname "$0")/.."
PROBE='import jax, jax.numpy as jnp; print(jnp.dot(jnp.ones((8,8)), jnp.ones((8,8))).sum())'

echo "[autolaunch $(date +%H:%M:%S)] watching for TPU backend"
until timeout 420 python -c "$PROBE" >/dev/null 2>&1; do
  echo "[autolaunch $(date +%H:%M:%S)] backend still down; retry in 180s"
  sleep 180
done
echo "[autolaunch $(date +%H:%M:%S)] BACKEND UP — starting round-3 queue"
sleep 20   # axon quirk: back-to-back client starts wedge

# 1. capture a full bench artifact early (the driver's end-of-round capture
#    failed in round 2; get one good record while the chip is fresh)
timeout 2400 python bench.py --stress > BENCH_R3_EARLY.json 2> log/bench_r3_early.err
echo "[autolaunch $(date +%H:%M:%S)] early bench done rc=$?"
sleep 20

# 2. the evidence matrix, stages in priority order (resumable)
python scripts/r3_matrix.py --stages 1,2,3,4,5 >> log/r3_matrix.log 2>&1
echo "[autolaunch $(date +%H:%M:%S)] matrix done rc=$?"

# 3. summarize whatever completed
python scripts/summarize_r3.py >> log/r3_matrix.log 2>&1
echo "[autolaunch $(date +%H:%M:%S)] ALL DONE"

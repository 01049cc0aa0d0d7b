"""Benchmark: SASRec training throughput (sequences/sec/chip).

Baseline: the reference trains SASRec on amazon-toys at ~13.4 s/epoch over
~19.4k sequences on its GPU (BASELINE.md "Train runtime") ≈ 1449 seqs/s.

Uses the real amazon-toys sequences (rebuilt from the reference's bundled
``seq2pat_data.pth`` with the same leave-last-out protocol) when available,
else a same-scale synthetic workload. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_SEQS_PER_SEC = 19412 / 13.4  # ≈1449, poster toys runtime

TOYS_SEQ2PAT = "/root/reference/dataset/amazon-toys/toy/seq2pat_data.pth"


def load_workload(max_seq_len: int = 50):
    from dr4sr_tpu.data.preprocess import resplit_sequences

    if os.path.exists(TOYS_SEQ2PAT):
        import torch

        seqs = torch.load(TOYS_SEQ2PAT, weights_only=False)
        name = "amazon-toys"
    else:
        from dr4sr_tpu.data.synthetic import markov_sequences

        seqs = markov_sequences(num_users=19412, num_items=11925, min_len=3,
                                max_len=10, seed=0)
        name = "synthetic-toys-scale"
    train, val, test, n_users, n_items = resplit_sequences(seqs, max_seq_len)
    return name, train, n_users, n_items


def main():
    import jax

    from dr4sr_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    from dr4sr_tpu.data.loader import BatchIterator
    from dr4sr_tpu.data.synthetic import synthetic_config
    from dr4sr_tpu.models.base import RecModel
    from dr4sr_tpu.models.registry import get_model_class
    from dr4sr_tpu.train.trainer import TrainState, make_optimizer

    name, train_rows, n_users, n_items = load_workload()
    batch_size = 256
    cfg = synthetic_config(max_seq_len=50)
    cfg["train"]["batch_size"] = batch_size

    rec = RecModel(cfg, get_model_class("SASRec").build(cfg, n_items), n_items, n_users)
    loader = BatchIterator(train_rows, batch_size, shuffle=True, seed=0)

    rng = jax.random.PRNGKey(0)
    first = loader.sample_batch(batch_size)
    variables = rec.init(rng, jax.device_put(first))
    tx = make_optimizer(cfg["train"])
    state = TrainState.create(apply_fn=rec.module.apply, params=variables["params"], tx=tx)

    @jax.jit
    def train_step(state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: rec.training_loss({"params": p}, batch, rng)
        )(state.params)
        return state.apply_gradients(grads=grads), loss

    # warmup (compile)
    batches = []
    it = iter(loader)
    for _ in range(8):
        batches.append(next(it))
    for i in range(3):
        rng, r = jax.random.split(rng)
        state, loss = train_step(state, jax.device_put(batches[i % len(batches)]), r)
    jax.block_until_ready(loss)

    # timed: full passes through prefetched host batches (includes h2d)
    n_steps = 60
    t0 = time.perf_counter()
    for i in range(n_steps):
        rng, r = jax.random.split(rng)
        state, loss = train_step(state, jax.device_put(batches[i % len(batches)]), r)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    seqs_per_sec = n_steps * batch_size / dt
    out = {
        "metric": f"train_seqs_per_sec_sasrec_{name}",
        "value": round(seqs_per_sec, 1),
        "unit": "seqs/s",
        "vs_baseline": round(seqs_per_sec / REFERENCE_SEQS_PER_SEC, 3),
        "extras": {
            "num_items": int(n_items),
            "num_train_rows": len(train_rows),
            "batch_size": batch_size,
            "step_ms": round(1000 * dt / n_steps, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

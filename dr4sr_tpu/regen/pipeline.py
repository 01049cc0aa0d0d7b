"""The three-stage dataset-regeneration pipeline, as library functions.

Stage 1 (reference ``1.Build_pretraining_dataset.py``): mine patterns from the
  seq2pat sequences, write ``patterns`` rows (pattern-as-training-row +
  original train) and (sequence, pattern) pairs.
Stage 2 (``2.Pretrain_regenerator.py``): pre-train the diversity-promoted
  seq2seq regenerator on the pairs.
Stage 3 (``3.Hybrid_inference.py``): batched hybrid decoding → train_regen.

Each stage is callable in-process (the CLIs in ``scripts/`` are thin
wrappers), so procs 2–3 can be fused without the reference's file round-trip.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dr4sr_tpu.data.dataset import RowData
from dr4sr_tpu.regen.decode import decode_dataset, regenerated_rows
from dr4sr_tpu.regen.generator import Generator, frame_pairs, generator_loss
from dr4sr_tpu.regen.miner import match_pairs, mine_patterns
from dr4sr_tpu.utils.logger import get_logger


# --------------------------------------------------------------------- stage 1
def pattern_rows(patterns: Sequence[Sequence[int]], max_seq_len: int = 50) -> List[list]:
    """Patterns as training rows (user_id=0 marks pattern rows; reference
    ``1.Build_pretraining_dataset.py:44-65``): dedup (input, target) pairs of
    (pattern[:-1], pattern[1:])."""
    def fit(seq):
        seq = list(seq)
        return seq[-max_seq_len:] if len(seq) > max_seq_len else seq + [0] * (max_seq_len - len(seq))

    train_set = set()
    for p in patterns:
        train_set.add(tuple(fit(p[:-1]) + fit(p[1:])))
    rows = []
    for packed in sorted(train_set):
        hist = list(packed[:max_seq_len])
        target = list(packed[max_seq_len:])
        seq_len = sum(1 for a in hist if a != 0)
        rows.append([
            0,
            hist,
            target,
            seq_len,
            [1] * seq_len + [0] * (max_seq_len - seq_len),
            [0] * max_seq_len,
        ])
    return rows


def train_sequences_from_rows(rows: RowData) -> List[List[int]]:
    """history + final target (reference ``seq_list_ori``,
    ``1.Build_pretraining_dataset.py:34``)."""
    out = []
    for i in range(len(rows)):
        n = int(rows.seqlen[i])
        if n == 0:
            continue
        seq = rows.in_item_id[i][:n].tolist()
        seq.append(int(rows.item_id[i][n - 1]))
        out.append(seq)
    return out


def build_pretraining_dataset(
    seq2pat_sequences: List[List[int]],
    train_rows: RowData,
    alpha: int = 5,
    beta: int = 2,
    max_matches: int = 10,
    n_jobs: int = 0,
    seed: int = 2024,
) -> Tuple[List[list], List[Tuple[List[int], List[int]]]]:
    """Returns (pattern training rows, (sequence, pattern) pairs)."""
    logger = get_logger()
    t0 = time.time()
    patterns, freqs = mine_patterns(seq2pat_sequences, max_span=alpha,
                                    min_frequency=beta, n_jobs=n_jobs)
    logger.info(f"mined {len(patterns)} patterns in {time.time()-t0:.1f}s")

    rows = pattern_rows(patterns, train_rows.max_seq_len)

    seq_list = train_sequences_from_rows(train_rows)
    t0 = time.time()
    matches = match_pairs(seq_list, patterns, max_matches=max_matches,
                          seed=seed, n_jobs=n_jobs)
    pairs = [
        (seq, patterns[p]) for seq, idxs in zip(seq_list, matches) for p in idxs
    ]
    logger.info(f"built {len(pairs)} sequence-pattern pairs in {time.time()-t0:.1f}s")
    return rows, pairs


# --------------------------------------------------------------------- stage 2
def pretrain_regenerator(
    pairs: Sequence[Tuple[List[int], List[int]]],
    num_items: int,
    k: int = 5,
    epochs: int = 40,
    batch_size: int = 256,
    learning_rate: float = 1e-3,
    seed: int = 2024,
    pretrained_embedding: Optional[np.ndarray] = None,
    entropy_weight: float = 1.0,
):
    """Returns (generator, variables). Adam(β2=0.98) + cosine decay over the
    full step budget (the reference steps CosineAnnealingLR(T_max=epochs)
    every *batch* — a periodic-LR quirk we replace with a standard cosine)."""
    logger = get_logger()
    data = frame_pairs(pairs, num_items)
    n = len(data["src"])
    gen = Generator(num_items=num_items, k=k)

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    variables = gen.init(
        {"params": init_rng, "dropout": init_rng, "gumbel": init_rng},
        jnp.asarray(data["src"][:2]),
        jnp.asarray(data["tgt"][:2, :-1]),
        jnp.asarray(data["tgt_len"][:2]),
        jnp.asarray(1.0),
    )
    if pretrained_embedding is not None:
        # seed catalog rows from a pre-trained SASRec item table
        # (2.Pretrain_regenerator.py:162-178); SOS/EOS rows stay random
        emb = np.array(variables["params"]["item_embedding"]["embedding"])
        rows = min(pretrained_embedding.shape[0], num_items)
        emb[:rows] = pretrained_embedding[:rows]
        params = dict(variables["params"])
        params["item_embedding"] = {"embedding": jnp.asarray(emb)}
        variables = {"params": params}

    steps_per_epoch = max(1, (n + batch_size - 1) // batch_size)
    tx = optax.adam(
        optax.cosine_decay_schedule(learning_rate, epochs * steps_per_epoch),
        b1=0.9, b2=0.98, eps=1e-9,
    )
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, src, tgt, tgt_len, tau, rng):
        r_drop, r_gumbel = jax.random.split(rng)

        def loss_fn(p):
            logits, cond = gen.apply(
                {"params": p}, src, tgt[:, :-1], tgt_len, tau, training=True,
                rngs={"dropout": r_drop, "gumbel": r_gumbel},
            )
            return generator_loss(logits, tgt[:, 1:], cond, entropy_weight)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    params = variables["params"]
    tau = 1.0
    host_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = host_rng.permutation(n)
        epoch_loss, count = 0.0, 0
        t0 = time.time()
        for b in range(steps_per_epoch):
            idx = order[b * batch_size : (b + 1) * batch_size]
            if len(idx) < batch_size:  # pad to static shape
                idx = np.concatenate([idx, idx[: batch_size - len(idx)]])
            rng, r = jax.random.split(rng)
            params, opt_state, loss, aux = step(
                params, opt_state,
                jnp.asarray(data["src"][idx]),
                jnp.asarray(data["tgt"][idx]),
                jnp.asarray(data["tgt_len"][idx]),
                jnp.asarray(tau, jnp.float32),
                r,
            )
            # gumbel τ annealing ×0.995 per step, floor 0.1 (reference :129)
            tau = max(tau * 0.995, 0.1)
            epoch_loss += float(aux["ce"])
            count += 1
        logger.info(
            f"regen epoch {epoch+1}/{epochs}: ce={epoch_loss/count:.3f} "
            f"tau={tau:.3f} ({time.time()-t0:.1f}s)"
        )
    return gen, {"params": params}


# --------------------------------------------------------------------- stage 3
def hybrid_inference(
    generator: Generator,
    variables,
    train_rows: RowData,
    k_conditions: int = 5,
    batch_size: int = 1024,
    max_len: int = 25,
    gamma: float = 0.0,
    seed: int = 0,
    beam_width: int = 1,
) -> Tuple[List[list], Dict[str, float]]:
    """Batched decode of the whole training set under every condition.
    Returns (regenerated rows, stats). ``beam_width>1`` switches the greedy
    decode to batched beam search (regen/decode.py)."""
    logger = get_logger()
    sequences = train_sequences_from_rows(train_rows)
    t0 = time.time()
    decoded = decode_dataset(
        generator, variables, sequences, k_conditions,
        batch_size=batch_size, max_len=max_len, gamma=gamma, seed=seed,
        beam_width=beam_width,
    )
    dt = time.time() - t0
    rows = regenerated_rows(decoded, train_rows.max_seq_len)
    stats = {
        "sequences_decoded": len(sequences) * k_conditions,
        "unique_regenerated": len(rows),
        "seconds": dt,
        "seqs_per_sec": len(sequences) * k_conditions / max(dt, 1e-9),
    }
    logger.info(f"hybrid inference: {stats}")
    return rows, stats


def assemble_train_regen(
    original_rows: RowData,
    pattern_rows_list: List[list],
    regen_rows_list: List[list],
    max_seq_len: int = 50,
) -> RowData:
    """train_regen = original ∪ patterns ∪ regenerated
    (``3.Hybrid_inference.py:265-293``)."""
    from dr4sr_tpu.data.dataset import rows_from_lists

    extra = rows_from_lists(pattern_rows_list + regen_rows_list, True, max_seq_len)
    return RowData.concat([original_rows, extra])

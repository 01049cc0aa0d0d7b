"""Ranking losses with the reference's padding semantics.

The reference marks padded positions by writing ``-inf`` into the positive
scores and testing ``isinf`` inside the loss (``model/basemodel.py:208``,
``model/loss_func.py:14``). ``-inf`` arithmetic is hazardous under XLA's
aggressive fusion (0·inf → NaN in gradients), so these functions take an
explicit boolean ``mask`` (True = real position) and reproduce the same
numerics:

* BCE (``model/loss_func.py:5-38``): ``-Σ logσ(pos)/M + Σ mean_neg softplus(neg)/M``
  with ``M`` = number of unmasked positions; ``reduce=False`` returns the
  per-position contribution divided by ``M`` (used by the bilevel reweighter).
* BPR (``model/loss_func.py:40-49``): ``-Σ mean_neg logσ(pos-neg)/M``.
* InfoNCE (``module/data_augmentation.py:305-404``): ``batch_both`` mode with
  2B-1 in-batch negatives, optional instance-label de-noising.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e30


def _log_sigmoid(x: jax.Array) -> jax.Array:
    return -jax.nn.softplus(-x)


def binary_cross_entropy_loss(
    pos_score: jax.Array,  # [B] or [B, L]
    neg_score: jax.Array,  # [B, neg] or [B, L, neg]
    mask: jax.Array,  # bool, same shape as pos_score; True = real
    reduce: bool = True,
) -> jax.Array:
    # loss math always in f32 (scores may arrive bf16 under mixed precision)
    pos_score = pos_score.astype(jnp.float32)
    neg_score = neg_score.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask_f), 1.0)

    pos_loss = _log_sigmoid(pos_score) * mask_f
    neg_loss = jnp.mean(jax.nn.softplus(neg_score), axis=-1)

    if pos_score.ndim == neg_score.ndim - 1:
        # per-position negatives share the positive's mask
        neg_loss = neg_loss * mask_f
        if reduce:
            return (-jnp.sum(pos_loss) + jnp.sum(neg_loss)) / denom
        return (-pos_loss + neg_loss) / denom
    # batch-level negatives: reference takes a plain mean over them
    neg_term = jnp.mean(neg_loss)
    if reduce:
        return -jnp.sum(pos_loss) / denom + neg_term
    return -pos_loss / denom + neg_term / pos_loss.size


def bpr_loss(
    pos_score: jax.Array,
    neg_score: jax.Array,
    mask: jax.Array,
    reduce: bool = True,
) -> jax.Array:
    pos_score = pos_score.astype(jnp.float32)
    neg_score = neg_score.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask_f), 1.0)
    diff = pos_score[..., None] - neg_score
    loss = jnp.mean(_log_sigmoid(diff), axis=-1) * mask_f
    if reduce:
        return -jnp.sum(loss) / denom
    return -loss / denom


def alignment(x: jax.Array, y: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
    """Mean squared distance of L2-normalized pairs (reference
    ``SASRec.alignment``, ``model/sasrec.py:100-102``)."""
    nx = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    ny = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    d2 = jnp.sum((nx - ny) ** 2, axis=-1)
    if valid is not None:
        return jnp.sum(jnp.where(valid, d2, 0.0)) / jnp.maximum(valid.sum(), 1)
    return jnp.mean(d2)


def uniformity(x: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
    """log-mean-exp(-2·pairwise-distance²) over normalized reps (reference
    ``SASRec.uniformity``). Uses the full pairwise matrix minus the diagonal
    (pdist equivalent)."""
    nx = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    d2 = jnp.sum((nx[:, None] - nx[None, :]) ** 2, axis=-1)  # [N, N]
    n = x.shape[0]
    off = ~jnp.eye(n, dtype=bool)
    if valid is not None:
        off = off & valid[:, None] & valid[None, :]
    w = off.astype(jnp.float32)
    return jnp.log(
        jnp.sum(jnp.exp(-2.0 * d2) * w) / jnp.maximum(jnp.sum(w), 1.0)
    )


def info_nce_loss(
    rep_i: jax.Array,  # [B, D]
    rep_j: jax.Array,  # [B, D]
    temperature: float = 1.0,
    sim_method: str = "inner_product",
    instance_labels: Optional[jax.Array] = None,  # [B]
    valid: Optional[jax.Array] = None,  # [B] bool; False rows contribute 0
    reduce: bool = True,
    neg_type: str = "batch_both",
) -> jax.Array:
    """In-batch InfoNCE. ``batch_both``: logits = [sim_ij | sim_ii] (2B-1
    negatives) with self (and same-label pairs) masked; ``batch_single``:
    logits = sim_ij only (B-1 negatives). Label = own column in sim_ij."""
    b = rep_i.shape[0]
    if sim_method == "cosine":
        rep_i = rep_i / jnp.maximum(jnp.linalg.norm(rep_i, axis=-1, keepdims=True), 1e-12)
        rep_j = rep_j / jnp.maximum(jnp.linalg.norm(rep_j, axis=-1, keepdims=True), 1e-12)
    sim_ii = rep_i @ rep_i.T / temperature  # [B, B]
    sim_ij = rep_i @ rep_j.T / temperature  # [B, B]

    eye = jnp.eye(b, dtype=bool)
    if instance_labels is not None:
        same = instance_labels[:, None] == instance_labels[None, :]
        sim_ii = jnp.where(same, _NEG, sim_ii)
        sim_ij = jnp.where(same & ~eye, _NEG, sim_ij)
    else:
        sim_ii = jnp.where(eye, _NEG, sim_ii)

    if valid is not None:
        # exclude padded rows from acting as negatives (columns)
        col_pad = ~valid[None, :]
        sim_ii = jnp.where(col_pad, _NEG, sim_ii)
        sim_ij = jnp.where(col_pad & ~eye, _NEG, sim_ij)

    if neg_type == "batch_single":
        logits = sim_ij
    else:
        logits = jnp.concatenate([sim_ij, sim_ii], axis=-1)  # [B, 2B]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    per_row = -log_probs[jnp.arange(b), jnp.arange(b)]
    if valid is not None:
        per_row = jnp.where(valid, per_row, 0.0)
        count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    else:
        count = float(b)
    if reduce:
        return jnp.sum(per_row) / count
    return per_row / count

"""Shared model machinery: scoring, losses, negative sampling, top-k.

The reference folds all of this into ``BaseModel`` (``model/basemodel.py``),
which is simultaneously an nn.Module and the trainer. Here the pieces are
pure functions over (params, batch, rng) so they compose under ``jax.jit`` /
``jax.grad`` / the bilevel hypergradient, and the epoch loop lives in
``dr4sr_tpu.train.trainer``.

Conventions:

* every architecture (flax module) exposes an ``item_embedding`` submodule
  named exactly that, so the scoring table is
  ``variables['params']['item_embedding']['embedding']``;
* ``__call__(batch, training, need_pooling=True)`` returns the query —
  [B, L, D] when training with 'origin' pooling, else [B, D];
* the dot-product scoring broadcast matches the reference
  (``model/basemodel.py:204-210``): query broadcasts from the left against
  per-position positives [B, L] and negatives [B, L, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dr4sr_tpu.modules.losses import binary_cross_entropy_loss, bpr_loss
from dr4sr_tpu.ops.topk import masked_topk_scores
from dr4sr_tpu.parallel.ep import ep_gather

Batch = Dict[str, jax.Array]

normal_init = nn.initializers.normal(stddev=0.02)


def embedding_init(key, shape, dtype=jnp.float32):
    """normal(0.02) with the PAD row zeroed (reference
    ``normal_initialization``, ``utils/utils.py:70-81``)."""
    w = jax.random.normal(key, shape, dtype) * 0.02
    return w.at[0].set(0.0)


def item_table(variables) -> jax.Array:
    return variables["params"]["item_embedding"]["embedding"]


def dot_score(query: jax.Array, emb: jax.Array) -> jax.Array:
    """Sum-product with left-broadcast of the query over extra emb axes."""
    d = query.shape[-1]
    extra = emb.ndim - query.ndim
    q = query.reshape(query.shape[:-1] + (1,) * extra + (d,))
    return jnp.sum(q * emb, axis=-1)


def sample_negatives(
    rng: jax.Array, batch: Batch, num_items: int, max_seq_len: int
) -> jax.Array:
    """Uniform negatives over [1, num_items) (reference ``_neg_sampling``,
    ``model/basemodel.py:50-61``): [B, L, 1] for per-position targets,
    [B, 1] for single targets."""
    item_id = batch["item_id"]
    if item_id.ndim == 2:
        shape = (item_id.shape[0], max_seq_len, 1)
    else:
        shape = (item_id.shape[0], 1)
    return jax.random.randint(rng, shape, 1, num_items)


def pos_neg_scores(
    query: jax.Array, table: jax.Array, batch: Batch, neg_id: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (pos_score, neg_score, mask). ``mask`` True = real position
    (reference writes -inf at pads instead; see modules.losses)."""
    pos_emb = ep_gather(table, batch["item_id"])
    neg_emb = ep_gather(table, neg_id)
    pos_score = dot_score(query, pos_emb)
    neg_score = dot_score(query, neg_emb)
    mask = batch["item_id"] != 0
    if "valid" in batch:
        valid = batch["valid"]
        mask = mask & valid.reshape(valid.shape + (1,) * (mask.ndim - 1))
    return pos_score, neg_score, mask


LOSS_FNS: Dict[str, Callable] = {
    "bce": binary_cross_entropy_loss,
    "bpr": bpr_loss,
}


@dataclasses.dataclass
class RecModel:
    """Bundles an architecture module with its config + pure step functions."""

    config: Dict[str, Any]
    module: nn.Module
    num_items: int
    num_users: int

    @property
    def max_seq_len(self) -> int:
        return int(self.config["data"]["max_seq_len"])

    @property
    def loss_fn(self) -> Callable:
        return LOSS_FNS[self.config["model"].get("loss_fn", "bce")]

    # -- init --------------------------------------------------------------
    def init(self, rng: jax.Array, sample_batch: Batch):
        return self.module.init(
            {"params": rng, "dropout": rng}, sample_batch, training=False
        )

    # -- training ----------------------------------------------------------
    def training_loss(
        self,
        params,
        batch: Batch,
        rng: jax.Array,
        reduce: bool = True,
        return_query: bool = False,
        extra_variables: Optional[dict] = None,
    ):
        """Forward + BCE/BPR loss (reference ``training_step``,
        ``model/basemodel.py:204-214``)."""
        rng_neg, rng_drop = jax.random.split(rng)
        variables = dict(params)
        if extra_variables:
            variables.update(extra_variables)
        query = self.module.apply(
            variables, batch, training=True, rngs={"dropout": rng_drop}
        )
        table = item_table(variables)
        neg_id = sample_negatives(rng_neg, batch, self.num_items, self.max_seq_len)
        pos, neg, mask = pos_neg_scores(query, table, batch, neg_id)
        loss = self.loss_fn(pos, neg, mask, reduce=reduce)
        if return_query:
            return loss, query
        return loss

    def alignment_uniformity_loss(
        self, params, batch: Batch, rng: jax.Array
    ) -> jax.Array:
        """Representation-quality objective (reference ``SASRec.training_step``
        with ``align=True``): alignment(query, pos_emb) + uniformity(query)
        + uniformity(pos_emb) over valid positions."""
        from dr4sr_tpu.modules.losses import alignment, uniformity

        query = self.module.apply(
            params, batch, training=True, rngs={"dropout": rng}
        )
        table = item_table(params)
        pos_emb = ep_gather(table, batch["item_id"])
        d = query.shape[-1]
        extra = pos_emb.ndim - query.ndim
        q = jnp.broadcast_to(
            query.reshape(query.shape[:-1] + (1,) * extra + (d,)), pos_emb.shape
        )
        valid = (batch["item_id"] != 0).reshape(-1)
        qf, pf = q.reshape(-1, d), pos_emb.reshape(-1, d)
        return (
            alignment(qf, pf, valid)
            + uniformity(qf, valid)
            + uniformity(pf, valid)
        )

    # -- eval --------------------------------------------------------------
    def encode_eval(self, params, batch: Batch) -> jax.Array:
        return self.module.apply(params, batch, training=False)

    def topk(
        self,
        params,
        batch: Batch,
        k: int,
        item_keep_mask: Optional[jax.Array] = None,
        method: str = "exact",
    ) -> Tuple[jax.Array, jax.Array]:
        """Full-catalog masked top-k (reference ``BaseModel.topk``)."""
        query = self.encode_eval(params, batch)
        table = item_table(params)[: self.num_items]
        return masked_topk_scores(
            query, table, min(k, self.num_items), item_keep_mask=item_keep_mask,
            user_hist=batch.get("user_hist"), method=method,
        )

"""Full-catalog scoring + masked top-k — the eval hot path.

Equivalent of the reference ``BaseModel.topk`` (``model/basemodel.py:354-365``):
``query @ item_table.T`` over the whole catalog, mask items outside the eval
domain and items already seen by the user, then take top-k.

Two entry points:

* :func:`masked_topk_scores` — single-device jit; boolean masks instead of
  ``-inf`` arithmetic (XLA-safe; identical ordering semantics).
* :func:`sharded_masked_topk` — the SPMD version for a row-sharded item table:
  each model-parallel shard scores its slice of the catalog and takes a local
  top-k, the k·S candidates are all-gathered over the ``model`` axis and
  reduced with a final top-k. Communication is k·S items per query instead of
  the full [B, N] score row.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e30


def _topk(scores: jax.Array, k: int, method: str) -> Tuple[jax.Array, jax.Array]:
    """Exact ``lax.top_k`` or TPU-accelerated ``lax.approx_max_k``.

    ``approx`` maps onto the TPU's partial-reduce MIPS unit (PanNN-style,
    recall_target=0.95 per reduced row) — worth it when the catalog is
    large (the 1M-item stress shape); at research-scale N≈12-20k the exact
    sort is already cheap. On non-TPU backends ``approx_max_k`` lowers to
    an exact top-k, so CPU tests check the contract, not the speedup.

    A two-phase grouped exact top-k (per-group top-k → top-k of group
    winners) was tried in round 5 and REVERTED: on v5e it measured 2-5x
    SLOWER than the native ``lax.top_k`` at [128, 1M] (43 ms vs 88-205 ms
    depending on group size; ``results_stress_decompose.json``
    eval_topk_ab) — XLA's TopK already partial-sorts, and the extra
    reshape/pad/gather passes cost more than they save.
    """
    if method == "approx":
        return jax.lax.approx_max_k(scores, k, recall_target=0.95)
    return jax.lax.top_k(scores, k)


def _apply_masks(
    scores: jax.Array,
    item_keep_mask: Optional[jax.Array],
    user_hist: Optional[jax.Array],
    item_offset: int = 0,
    num_local: Optional[int] = None,
) -> jax.Array:
    """Mask scores [B, Nl] (a slice [offset, offset+Nl) of the catalog)."""
    b, nl = scores.shape
    if item_keep_mask is not None:
        scores = jnp.where(item_keep_mask[None, :], scores, NEG)
    if user_hist is not None:
        # scatter NEG at seen items that fall into this shard's slice
        local = user_hist - item_offset
        in_range = (local >= 0) & (local < nl)
        local = jnp.where(in_range, local, 0)
        hit = jnp.zeros((b, nl), jnp.bool_)
        hit = hit.at[jnp.arange(b)[:, None], local].max(in_range)
        scores = jnp.where(hit, NEG, scores)
    return scores


@functools.partial(jax.jit, static_argnames=("k", "method"))
def masked_topk_scores(
    query: jax.Array,  # [B, D]
    item_emb: jax.Array,  # [N, D]
    k: int,
    item_keep_mask: Optional[jax.Array] = None,  # [N] True = eligible
    user_hist: Optional[jax.Array] = None,  # [B, Lh] seen item ids (0 = pad)
    method: str = "exact",  # "exact" | "approx" (config eval.topk_method)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scores [B, k], topk_items [B, k])."""
    scores = jnp.dot(query, item_emb.T, preferred_element_type=jnp.float32)
    scores = _apply_masks(scores, item_keep_mask, user_hist)
    return _topk(scores, k, method)


def sharded_masked_topk(
    query: jax.Array,  # [B, D] (replicated over the model axis)
    item_emb_local: jax.Array,  # [N/S, D] this shard's rows
    k: int,
    axis_name: str,
    item_keep_mask_local: Optional[jax.Array] = None,  # [N/S]
    user_hist: Optional[jax.Array] = None,  # [B, Lh] global ids
    method: str = "exact",
) -> Tuple[jax.Array, jax.Array]:
    """Shard-local score+top-k, then global merge over ``axis_name``.

    Call inside ``shard_map`` with ``item_emb_local`` row-sharded on
    ``axis_name``. Item ids returned are global.
    """
    nl = item_emb_local.shape[0]
    shard = jax.lax.axis_index(axis_name)
    offset = shard * nl
    scores = jnp.dot(query, item_emb_local.T, preferred_element_type=jnp.float32)
    scores = _apply_masks(scores, item_keep_mask_local, user_hist, item_offset=offset)
    local_scores, local_idx = _topk(scores, min(k, nl), method)
    local_ids = local_idx + offset
    # gather k candidates from every shard: [B, S*k]
    all_scores = jax.lax.all_gather(local_scores, axis_name, axis=1, tiled=True)
    all_ids = jax.lax.all_gather(local_ids, axis_name, axis=1, tiled=True)
    top_scores, sel = jax.lax.top_k(all_scores, k)
    top_ids = jnp.take_along_axis(all_ids, sel, axis=1)
    return top_scores, top_ids

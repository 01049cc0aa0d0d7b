"""Ranking metrics.

Same contract as the reference (``evaluation/__init__.py``): metric functions
consume ``pred`` — a boolean [B, topk] hit matrix where column j says "the
j-th ranked item is a true target" — plus ``target`` ([B] or [B, T] positive
ratings) and a cutoff. Here every metric returns the **per-sample** [B]
vector; aggregation (batch-size weighting, domain sums) happens in the
trainer with the batch ``valid`` mask, which reproduces the reference's
``Σ metric·bs / Σ bs`` exactly.

All functions are jnp and jit-safe (static cutoff).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Union

import jax.numpy as jnp


def _target_count(target: jnp.ndarray) -> jnp.ndarray:
    if target.ndim == 1:
        target = target[:, None]
    return jnp.sum(target > 0, axis=-1)


def recall(pred: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    count = jnp.maximum(_target_count(target), 1)
    return jnp.sum(pred[:, :k], axis=-1).astype(jnp.float32) / count


def precision(pred: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.sum(pred[:, :k], axis=-1).astype(jnp.float32) / k


def f1(pred: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    count = _target_count(target)
    return 2.0 * jnp.sum(pred[:, :k], axis=-1).astype(jnp.float32) / (count + k)


def _dcg(pred: jnp.ndarray, k: int) -> jnp.ndarray:
    k = min(k, pred.shape[1])
    denom = jnp.log2(jnp.arange(k, dtype=jnp.float32) + 2.0)[None, :]
    return jnp.sum(pred[:, :k].astype(jnp.float32) / denom, axis=-1)


def ndcg(pred: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    if target.ndim == 1:
        target = target[:, None]
    pred_dcg = _dcg(pred, k)
    rel = jnp.sort((target > 0).astype(jnp.float32), axis=-1)[:, ::-1]
    ideal = _dcg(rel, k)
    all_irrelevant = jnp.all(target <= 1e-9, axis=-1)
    out = jnp.where(all_irrelevant, 0.0, pred_dcg / jnp.maximum(ideal, 1e-12))
    return out


def mrr(pred: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    hits_k = pred[:, :k]
    ranks = jnp.arange(1, hits_k.shape[1] + 1, dtype=jnp.float32)[None, :]
    first = jnp.min(jnp.where(hits_k, ranks, jnp.inf), axis=-1)
    return jnp.where(jnp.isinf(first), 0.0, 1.0 / first)


def hit(pred: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.any(pred[:, :k], axis=-1).astype(jnp.float32)


def map_(pred: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    count = _target_count(target)
    p = pred[:, :k].astype(jnp.float32)
    cum = jnp.cumsum(p, axis=-1) / jnp.arange(1, k + 1, dtype=jnp.float32)[None, :]
    return jnp.sum(cum * p, axis=-1) / jnp.minimum(count, k)


# ---------------------------------------------------------------------------
# prediction metrics (reference ``evaluation/__init__.py:174-232``)
# ---------------------------------------------------------------------------


def logloss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample binary cross-entropy with logits."""
    t = target.astype(jnp.float32)
    return jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def accuracy(pred: jnp.ndarray, target: jnp.ndarray, thres: float = 0.5) -> jnp.ndarray:
    return ((pred >= thres) == (target > 0.5)).astype(jnp.float32)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return (pred - target) ** 2


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def auc(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Global AUC via rank statistic (Mann-Whitney U); returns a scalar."""
    order = jnp.argsort(pred)
    ranks = jnp.argsort(order).astype(jnp.float32) + 1.0
    pos = target > 0.5
    n_pos = jnp.sum(pos)
    n_neg = pred.shape[0] - n_pos
    sum_pos_ranks = jnp.sum(jnp.where(pos, ranks, 0.0))
    u = sum_pos_ranks - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


MetricFn = Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray]

metric_dict: Dict[str, Callable] = {
    "ndcg": ndcg,
    "recall": recall,
    "precision": precision,
    "f1": f1,
    "mrr": mrr,
    "hit": hit,
    "map": map_,
    "logloss": logloss,
    "accuracy": accuracy,
    "mse": mse,
    "mae": mae,
    "auc": auc,
}

_TOPK_METRICS = {"ndcg", "recall", "precision", "f1", "mrr", "hit", "map"}
_PRED_METRICS = {"logloss", "accuracy", "mse", "mae", "auc"}


def get_pred_metrics(metrics: Union[str, Sequence[str]]) -> List[str]:
    if isinstance(metrics, str):
        metrics = [metrics]
    return [m for m in metrics if m in _PRED_METRICS]


def get_rank_metrics(metrics: Union[str, Sequence[str]]) -> List[str]:
    if isinstance(metrics, str):
        metrics = [metrics]
    return [m for m in metrics if m in _TOPK_METRICS]


def get_eval_metrics(
    metric_names: Union[str, Sequence[str]],
    cutoffs: Union[int, Sequence[int]],
    validation: bool = False,
) -> List[str]:
    """Expand names × cutoffs into 'name@cutoff' keys
    (reference ``get_eval_metrics``; validation keeps only the first cutoff)."""
    if isinstance(metric_names, str):
        metric_names = [metric_names]
    if not isinstance(cutoffs, (list, tuple)):
        cutoffs = [cutoffs]
    if validation:
        cutoffs = list(cutoffs)[:1]
    return [f"{m}@{c}" for c in cutoffs for m in metric_names if m in _TOPK_METRICS]


def compute_rank_metrics(
    pred: jnp.ndarray,  # [B, topk] bool
    target: jnp.ndarray,  # [B] positive ratings (label column)
    metric_names: Sequence[str],
    cutoffs: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    """Per-sample values for every name@cutoff pair."""
    out = {}
    for c in cutoffs:
        for m in metric_names:
            if m in _TOPK_METRICS:  # pred metrics don't take a cutoff
                out[f"{m}@{c}"] = metric_dict[m](pred, target, int(c))
    return out

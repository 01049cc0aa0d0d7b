"""Metric functions vs hand-computed cases (reference ``evaluation/__init__.py``)."""

import jax.numpy as jnp
import numpy as np

from dr4sr_tpu.evaluation import (
    compute_rank_metrics,
    get_eval_metrics,
    hit,
    map_,
    mrr,
    ndcg,
    precision,
    recall,
)


def _pred(rows):
    return jnp.asarray(np.array(rows, dtype=bool))


def test_recall_single_target():
    pred = _pred([[0, 1, 0, 0], [0, 0, 0, 0]])
    target = jnp.asarray([1.0, 1.0])
    out = np.asarray(recall(pred, target, 4))
    np.testing.assert_allclose(out, [1.0, 0.0])
    out2 = np.asarray(recall(pred, target, 1))
    np.testing.assert_allclose(out2, [0.0, 0.0])


def test_ndcg_positions():
    # hit at rank 1 -> ndcg 1; hit at rank 3 -> 1/log2(4)
    pred = _pred([[1, 0, 0, 0], [0, 0, 1, 0]])
    target = jnp.asarray([1.0, 1.0])
    out = np.asarray(ndcg(pred, target, 4))
    np.testing.assert_allclose(out, [1.0, 1.0 / np.log2(4.0)], rtol=1e-6)


def test_ndcg_all_irrelevant_is_zero():
    pred = _pred([[1, 0]])
    target = jnp.asarray([0.0])
    assert float(ndcg(pred, target, 2)[0]) == 0.0


def test_mrr_and_hit():
    pred = _pred([[0, 1, 1, 0], [0, 0, 0, 0]])
    target = jnp.asarray([1.0, 1.0])
    np.testing.assert_allclose(np.asarray(mrr(pred, target, 4)), [0.5, 0.0])
    np.testing.assert_allclose(np.asarray(hit(pred, target, 4)), [1.0, 0.0])


def test_precision_map():
    pred = _pred([[1, 1, 0, 0]])
    target = jnp.asarray([[1.0, 1.0]])  # two positives
    np.testing.assert_allclose(np.asarray(precision(pred, target, 4)), [0.5])
    # AP = (1/1 + 2/2)/2 = 1
    np.testing.assert_allclose(np.asarray(map_(pred, target, 4)), [1.0])


def test_get_eval_metrics_expansion():
    keys = get_eval_metrics(["ndcg", "recall"], [20, 10])
    assert keys == ["ndcg@20", "recall@20", "ndcg@10", "recall@10"]
    keys_val = get_eval_metrics(["ndcg", "recall"], [20, 10], validation=True)
    assert keys_val == ["ndcg@20", "recall@20"]


def test_compute_rank_metrics_shapes():
    pred = _pred(np.eye(5, 10))
    target = jnp.ones(5)
    out = compute_rank_metrics(pred, target, ["ndcg", "recall"], [5, 10])
    assert set(out) == {"ndcg@5", "recall@5", "ndcg@10", "recall@10"}
    assert out["ndcg@5"].shape == (5,)

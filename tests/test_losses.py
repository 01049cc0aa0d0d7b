"""Loss parity vs a numpy re-implementation of the reference's -inf semantics
(``model/loss_func.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from dr4sr_tpu.modules.losses import (
    binary_cross_entropy_loss,
    bpr_loss,
    info_nce_loss,
)


def np_logsigmoid(x):
    return -np.logaddexp(0.0, -x)


def np_softplus(x):
    return np.logaddexp(0.0, x)


def reference_bce(pos, neg, mask):
    """Numpy port of the -inf convention: pos[~mask] = -inf, isinf() masking."""
    pos = np.where(mask, pos, -np.inf)
    padding = np.isinf(pos)
    m = (~padding).sum()
    pos_loss = np.where(padding, 0.0, np_logsigmoid(pos)).sum() / m
    neg_loss = (np_softplus(neg) / neg.shape[-1]).sum(-1)
    if pos.ndim == neg.ndim - 1:
        neg_loss = np.where(padding, 0.0, neg_loss).sum() / m
    else:
        neg_loss = neg_loss.mean()
    return -pos_loss + neg_loss


def test_bce_per_position(rng):
    B, L = 8, 10
    pos = rng.normal(size=(B, L)).astype(np.float32)
    neg = rng.normal(size=(B, L, 1)).astype(np.float32)
    mask = rng.random((B, L)) > 0.4
    mask[:, 0] = True
    ours = binary_cross_entropy_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask))
    ref = reference_bce(pos, neg, mask)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_bce_single_target(rng):
    B = 16
    pos = rng.normal(size=(B,)).astype(np.float32)
    neg = rng.normal(size=(B, 1)).astype(np.float32)
    mask = np.ones(B, bool)
    ours = binary_cross_entropy_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask))
    ref = reference_bce(pos, neg, mask)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_bce_reduce_false_sums_to_reduced(rng):
    B, L = 4, 6
    pos = rng.normal(size=(B, L)).astype(np.float32)
    neg = rng.normal(size=(B, L, 2)).astype(np.float32)
    mask = rng.random((B, L)) > 0.3
    mask[0, 0] = True
    red = binary_cross_entropy_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask))
    per = binary_cross_entropy_loss(
        jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask), reduce=False
    )
    np.testing.assert_allclose(float(jnp.sum(per)), float(red), rtol=1e-5)


def test_bce_gradient_finite(rng):
    B, L = 4, 6
    pos = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, L)) > 0.5)
    g = jax.grad(lambda p: binary_cross_entropy_loss(p, neg, mask))(pos)
    assert np.isfinite(np.asarray(g)).all()
    # masked positions receive zero gradient
    assert np.allclose(np.asarray(g)[~np.asarray(mask)], 0.0)


def test_bpr(rng):
    B, L = 5, 7
    pos = rng.normal(size=(B, L)).astype(np.float32)
    neg = rng.normal(size=(B, L, 3)).astype(np.float32)
    mask = rng.random((B, L)) > 0.4
    mask[:, 0] = True
    ours = bpr_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask))
    # numpy reference (model/loss_func.py:40-49): softmax of ones = 1/n weights
    diff = np_logsigmoid(pos[..., None] - neg).mean(-1)
    ref = -np.where(mask, diff, 0.0).sum() / mask.sum()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_info_nce_matches_cross_entropy(rng):
    B, D = 6, 8
    xi = rng.normal(size=(B, D)).astype(np.float32)
    xj = rng.normal(size=(B, D)).astype(np.float32)
    ours = info_nce_loss(jnp.asarray(xi), jnp.asarray(xj), temperature=0.7)
    # numpy reference: logits [sim_ij | sim_ii(diag=-inf)], CE with label=i
    sim_ii = xi @ xi.T / 0.7
    sim_ij = xi @ xj.T / 0.7
    np.fill_diagonal(sim_ii, -np.inf)
    logits = np.concatenate([sim_ij, sim_ii], -1)
    logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
    ce = (logz - logits[np.arange(B), np.arange(B)]).mean()
    np.testing.assert_allclose(float(ours), ce, rtol=1e-3)


def test_info_nce_valid_mask(rng):
    B, D = 8, 4
    xi = rng.normal(size=(B, D)).astype(np.float32)
    xj = rng.normal(size=(B, D)).astype(np.float32)
    valid = np.ones(B, bool)
    valid[-3:] = False
    masked = info_nce_loss(jnp.asarray(xi), jnp.asarray(xj), valid=jnp.asarray(valid))
    sub = info_nce_loss(jnp.asarray(xi[:5]), jnp.asarray(xj[:5]))
    np.testing.assert_allclose(float(masked), float(sub), rtol=1e-5)


def test_info_nce_batch_single(rng):
    B, D = 5, 6
    xi = rng.normal(size=(B, D)).astype(np.float32)
    xj = rng.normal(size=(B, D)).astype(np.float32)
    ours = info_nce_loss(jnp.asarray(xi), jnp.asarray(xj), temperature=0.9,
                         neg_type="batch_single")
    sim = (xi @ xj.T / 0.9).astype(np.float64)
    logz = np.log(np.exp(sim - sim.max(-1, keepdims=True)).sum(-1)) + sim.max(-1)
    ce = (logz - sim[np.arange(B), np.arange(B)]).mean()
    np.testing.assert_allclose(float(ours), ce, rtol=1e-3)


def test_alignment_and_uniformity(rng):
    from dr4sr_tpu.modules.losses import alignment, uniformity

    x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    # identical reps -> alignment 0, uniformity 0 (= log exp(0))
    np.testing.assert_allclose(float(alignment(x, x)), 0.0, atol=1e-6)
    same = jnp.ones((4, 3))
    np.testing.assert_allclose(float(uniformity(same)), 0.0, atol=1e-5)
    # orthogonal pairs: normalized distance² = 2 -> alignment 2
    a = jnp.asarray([[1.0, 0.0], [0.0, 3.0]])
    b = jnp.asarray([[0.0, 2.0], [5.0, 0.0]])
    np.testing.assert_allclose(float(alignment(a, b)), 2.0, rtol=1e-6)


def test_random_augmentation_length_conditioned(rng):
    from dr4sr_tpu.modules.augmentation import random_augmentation

    B, L = 6, 12
    seqlen = np.array([2, 3, 10, 11, 2, 12], np.int32)
    seq = np.zeros((B, L), np.int32)
    for i in range(B):
        seq[i, : seqlen[i]] = rng.integers(1, 50, size=seqlen[i])
    out, out_len = random_augmentation(
        jax.random.PRNGKey(0), jnp.asarray(seq), jnp.asarray(seqlen),
        augment_threshold=5, short_kinds=("item_mask",),
        long_kinds=("item_crop",), gamma=0.5, tao=0.5, mask_id=99,
    )
    out, out_len = np.asarray(out), np.asarray(out_len)
    for i in range(B):
        if seqlen[i] > 5:  # long rows were cropped
            assert out_len[i] == max(1, int(0.5 * seqlen[i]))
        else:  # short rows were masked (length unchanged)
            assert out_len[i] == seqlen[i]


def test_pred_metrics():
    from dr4sr_tpu.evaluation import accuracy, auc, logloss, mae, mse

    pred = jnp.asarray([2.0, -1.0, 0.5, -2.0])
    target = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    assert float(accuracy(jax.nn.sigmoid(pred), target).mean()) == 1.0
    np.testing.assert_allclose(float(auc(pred, target)), 1.0)
    ll = logloss(pred, target)
    expect = -np.log(1 / (1 + np.exp(-np.asarray(pred)))) * np.asarray(target) \
        - np.log(1 - 1 / (1 + np.exp(-np.asarray(pred)))) * (1 - np.asarray(target))
    np.testing.assert_allclose(np.asarray(ll), expect, rtol=1e-5)
    np.testing.assert_allclose(float(mse(pred, target).mean()),
                               float(((np.asarray(pred) - np.asarray(target))**2).mean()))
    assert float(mae(pred, target).mean()) > 0

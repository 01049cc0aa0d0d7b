"""Graph / intent contrastive-augmentation models + JAX k-means.

TPU equivalents of the reference's RecStudio-derived auxiliary models
(``module/data_augmentation.py:227-303, 407-575, 621-745``): SGL edge/node
dropout CL, NCL structure+prototype CL, SimGCL noise CL, ICLRec
instance+intent CL, and the faiss k-means they lean on.

Design notes:
* Graphs are COO edge lists ``(row, col, weight)`` with **fixed shape**:
  dropout zeroes weights instead of removing edges (same expectation as
  Bernoulli edge removal up to the 1/keep rescale, jit-stable shapes).
* faiss.Kmeans → :func:`kmeans` (jit'd Lloyd iterations with segment-sum
  centroid updates; empty clusters keep their previous centroid).
* SimGCL's ``torch.unique`` batch dedup is replaced by label-based de-noising
  inside the InfoNCE (duplicate ids are excluded as negatives of each other),
  which is the fixed-shape formulation of the same intent.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30


# ---------------------------------------------------------------------------
# k-means (faiss replacement)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(rng: jax.Array, x: jax.Array, k: int, iters: int = 20) -> Tuple[jax.Array, jax.Array]:
    """Lloyd's algorithm. x: [N, D]. Returns (centroids [k, D], assign [N])."""
    n = x.shape[0]
    init_idx = jax.random.choice(rng, n, shape=(k,), replace=False)
    centroids = x[init_idx]

    def body(_, centroids):
        d2 = (
            jnp.sum(x**2, -1, keepdims=True)
            - 2 * x @ centroids.T
            + jnp.sum(centroids**2, -1)[None, :]
        )
        assign = jnp.argmin(d2, axis=-1)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones(n), assign, num_segments=k)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, centroids)

    centroids = jax.lax.fori_loop(0, iters, body, centroids)
    d2 = (
        jnp.sum(x**2, -1, keepdims=True)
        - 2 * x @ centroids.T
        + jnp.sum(centroids**2, -1)[None, :]
    )
    return centroids, jnp.argmin(d2, axis=-1)


# ---------------------------------------------------------------------------
# graph perturbations (fixed-shape edge lists)
# ---------------------------------------------------------------------------


class Graph(NamedTuple):
    row: jax.Array  # [E]
    col: jax.Array  # [E]
    weight: jax.Array  # [E]
    num_nodes: int


def edge_dropout(rng: jax.Array, g: Graph, dropout_ratio: float) -> Graph:
    """Zero a random ``dropout_ratio`` of edge weights, rescaled by 1/keep
    (reference ``EdgeDropout``)."""
    keep = 1.0 - dropout_ratio
    mask = jax.random.bernoulli(rng, keep, g.weight.shape)
    return g._replace(weight=jnp.where(mask, g.weight / keep, 0.0))


def node_dropout(rng: jax.Array, g: Graph, dropout_ratio: float) -> Graph:
    """Zero all edges incident to a random node subset (reference
    ``NodeDropout``)."""
    keep = 1.0 - dropout_ratio
    node_mask = jax.random.bernoulli(rng, keep, (g.num_nodes,))
    alive = node_mask[g.row] & node_mask[g.col]
    return g._replace(weight=jnp.where(alive, g.weight / keep, 0.0))


def propagate_mean(
    g: Graph, embeddings: jax.Array, num_layers: int,
    noise_rng: Optional[jax.Array] = None, noise_eps: float = 0.0,
) -> jax.Array:
    """LightGCN-style propagation; returns the mean over layers 0..L.
    ``noise_rng`` adds SimGCL's per-layer signed uniform noise."""
    acc = embeddings
    emb = embeddings
    for layer in range(num_layers):
        msgs = emb[g.col] * g.weight[:, None]
        emb = jax.ops.segment_sum(msgs, g.row, num_segments=g.num_nodes)
        if noise_rng is not None and noise_eps > 0.0:
            # SimGCL: Δ = sign(e) ⊙ (row-L2-normalized noise) · ε
            noise_rng, r = jax.random.split(noise_rng)
            noise = jax.random.uniform(r, emb.shape)
            noise = noise / jnp.maximum(
                jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-12
            )
            emb = emb + jnp.sign(emb) * noise * noise_eps
        acc = acc + emb
    return acc / (num_layers + 1)


def propagate_layers(g: Graph, embeddings: jax.Array, num_layers: int) -> list:
    """All intermediate layer embeddings [0..L] (NCL needs layer 2k)."""
    out = [embeddings]
    emb = embeddings
    for _ in range(num_layers):
        msgs = emb[g.col] * g.weight[:, None]
        emb = jax.ops.segment_sum(msgs, g.row, num_segments=g.num_nodes)
        out.append(emb)
    return out


# ---------------------------------------------------------------------------
# InfoNCE 'all' mode (cosine, catalog negatives)
# ---------------------------------------------------------------------------


def info_nce_all(
    rep_i: jax.Array, rep_j: jax.Array, all_reps: jax.Array,
    temperature: float = 1.0,
) -> jax.Array:
    """``neg_type='all'``: logsumexp over the whole catalog minus the positive
    similarity (reference ``InfoNCELoss`` ``:382-402``), cosine similarity."""
    norm = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    rep_i, rep_j, all_reps = norm(rep_i), norm(rep_j), norm(all_reps)
    sim_ij = rep_i @ all_reps.T / temperature  # [B, N]
    sim_ii = jnp.sum(rep_i * rep_j, -1) / temperature  # [B]
    return jnp.mean(jax.scipy.special.logsumexp(sim_ij, axis=-1) - sim_ii)


# ---------------------------------------------------------------------------
# augmentation models (functional)
# ---------------------------------------------------------------------------


def sgl_cl_loss(
    rng: jax.Array,
    g: Graph,
    embeddings: jax.Array,  # [num_users+num_items, D] concatenated tables
    num_users: int,
    user_ids: jax.Array,
    item_ids: jax.Array,
    num_layers: int = 2,
    aug_type: str = "ED",
    ssl_ratio: float = 0.1,
    temperature: float = 0.2,
) -> jax.Array:
    """SGL: two dropout-perturbed graph views, cosine InfoNCE with catalog
    negatives (reference ``SGLAugmentation``)."""
    r1, r2 = jax.random.split(rng)
    drop = edge_dropout if aug_type in ("ED", "RW") else node_dropout
    view1 = propagate_mean(drop(r1, g, ssl_ratio), embeddings, num_layers)
    view2 = propagate_mean(drop(r2, g, ssl_ratio), embeddings, num_layers)
    u1, i1 = view1[:num_users], view1[num_users:]
    u2, i2 = view2[:num_users], view2[num_users:]
    user_loss = info_nce_all(u1[user_ids], u2[user_ids], u2[1:], temperature)
    item_loss = info_nce_all(i1[item_ids], i2[item_ids], i2[1:], temperature)
    return user_loss + item_loss


class KMeansState(NamedTuple):
    centroids: jax.Array  # [k, D]
    assign: jax.Array  # [N]


def fit_prototypes(rng: jax.Array, embeddings: jax.Array, k: int,
                   iters: int = 20) -> KMeansState:
    """E-step over an embedding table, skipping the PAD row (reference
    ``run_kmeans`` trains on ``x[1:]`` but assigns all rows)."""
    cents, _ = kmeans(rng, embeddings[1:], k, iters)
    d2 = (
        jnp.sum(embeddings**2, -1, keepdims=True)
        - 2 * embeddings @ cents.T
        + jnp.sum(cents**2, -1)[None, :]
    )
    return KMeansState(cents, jnp.argmin(d2, axis=-1))


def ncl_cl_losses(
    layer_embeddings: list,  # from propagate_layers
    num_users: int,
    user_ids: jax.Array,
    item_ids: jax.Array,
    user_proto: KMeansState,
    item_proto: KMeansState,
    hyper_layers: int = 1,
    alpha: float = 1.0,
    temperature: float = 0.2,
) -> Dict[str, jax.Array]:
    """NCL: structure CL (layer 2k vs layer 0) + semantic CL (prototype)
    (reference ``NCLAugmentation``)."""
    center = layer_embeddings[0]
    context = layer_embeddings[hyper_layers * 2]
    uc, ic = center[:num_users], center[num_users:]
    ux, ix = context[:num_users], context[num_users:]
    structure = (
        info_nce_all(ux[user_ids], uc[user_ids], uc[1:], temperature)
        + alpha * info_nce_all(ix[item_ids], ic[item_ids], ic[1:], temperature)
    )
    semantic = (
        info_nce_all(uc[user_ids], user_proto.centroids[user_proto.assign[user_ids]],
                     user_proto.centroids, temperature)
        + alpha * info_nce_all(ic[item_ids], item_proto.centroids[item_proto.assign[item_ids]],
                               item_proto.centroids, temperature)
    )
    return {"structure_cl_loss": structure, "semantic_cl_loss": semantic}


def simgcl_cl_loss(
    rng: jax.Array,
    g: Graph,
    embeddings: jax.Array,
    num_users: int,
    user_ids: jax.Array,
    item_ids: jax.Array,
    num_layers: int = 2,
    noise_eps: float = 0.1,
    temperature: float = 0.2,
) -> jax.Array:
    """SimGCL: two noise-perturbed propagations, catalog-negative InfoNCE;
    duplicate batch ids are de-duplicated via label masking (see module doc)."""
    r1, r2 = jax.random.split(rng)
    view1 = propagate_mean(g, embeddings, num_layers, noise_rng=r1, noise_eps=noise_eps)
    view2 = propagate_mean(g, embeddings, num_layers, noise_rng=r2, noise_eps=noise_eps)
    u1, i1 = view1[:num_users], view1[num_users:]
    u2, i2 = view2[:num_users], view2[num_users:]
    user_loss = info_nce_all(u1[user_ids], u2[user_ids], u2[1:], temperature)
    item_loss = info_nce_all(i1[item_ids], i2[item_ids], i2[1:], temperature)
    return user_loss + item_loss


def iclrec_cl_losses(
    rng: jax.Array,
    encode_fn: Callable,  # (seq, seqlen, rng) -> [B, L, D] (need_pooling=False)
    seq: jax.Array,
    seqlen: jax.Array,
    seq_out_pooled: jax.Array,  # [B, D] main-forward mean-pooled reps
    intent_state: KMeansState,  # k-means over pooled train reps
    num_items: int,
    aug_kind: str = "item_random",
    temperature: float = 1.0,
    valid: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """ICLRec: instance CL between two augmented views + intent CL against
    the assigned k-means centroid with same-intent de-noising (reference
    ``ICLRecAugmentation``)."""
    from dr4sr_tpu.modules.augmentation import augment
    from dr4sr_tpu.modules.layers import seq_pooling
    from dr4sr_tpu.modules.losses import info_nce_loss

    r_i, r_j, r_ei, r_ej = jax.random.split(rng, 4)
    seq_i, len_i = augment(r_i, seq, seqlen, aug_kind, mask_id=num_items)
    seq_j, len_j = augment(r_j, seq, seqlen, aug_kind, mask_id=num_items)
    out_i = seq_pooling(encode_fn(seq_i, len_i, r_ei), len_i, "mean")
    out_j = seq_pooling(encode_fn(seq_j, len_j, r_ej), len_j, "mean")

    instance = 0.5 * (
        info_nce_loss(out_i, out_j, temperature, valid=valid)
        + info_nce_loss(out_j, out_i, temperature, valid=valid)
    )

    d2 = (
        jnp.sum(seq_out_pooled**2, -1, keepdims=True)
        - 2 * seq_out_pooled @ intent_state.centroids.T
        + jnp.sum(intent_state.centroids**2, -1)[None, :]
    )
    intent_ids = jnp.argmin(d2, axis=-1)
    seq2intents = intent_state.centroids[intent_ids]
    intent = 0.5 * (
        info_nce_loss(out_i, seq2intents, temperature,
                      instance_labels=intent_ids, valid=valid)
        + info_nce_loss(out_j, seq2intents, temperature,
                        instance_labels=intent_ids, valid=valid)
    )
    return {"instance_cl_loss": instance, "intent_cl_loss": intent}


# ---------------------------------------------------------------------------
# online item similarity + similarity-driven sequence augmentations
# ---------------------------------------------------------------------------


def online_top1_similar(
    item_embeddings: jax.Array,  # [num_items, D] incl. PAD row
    item_ids: jax.Array,  # [...] (assumed != 0)
) -> jax.Array:
    """Most-similar other item by inner product (reference
    ``OnlineItemSimilarity``; the min-max normalization does not change the
    argmax so it is dropped)."""
    table = item_embeddings[1:]  # drop PAD
    vec = table[item_ids - 1]
    sim = vec @ table.T
    flat_ids = (item_ids - 1).reshape(-1)
    sim_flat = sim.reshape(-1, sim.shape[-1])
    sim_flat = sim_flat.at[jnp.arange(sim_flat.shape[0]), flat_ids].set(_NEG)
    top1 = jnp.argmax(sim_flat, axis=-1).reshape(item_ids.shape)
    return top1 + 1


def item_substitute(
    rng: jax.Array,
    seq: jax.Array,
    seqlen: jax.Array,
    item_embeddings: jax.Array,
    substitute_rate: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Replace ``max(1, rate·len)`` random positions with their top-1 similar
    item (reference ``Item_Substitute``, vectorized)."""
    b, l = seq.shape
    sub_len = jnp.maximum(1, (substitute_rate * seqlen).astype(jnp.int32))
    u = jax.random.uniform(rng, (b, l))
    pos = jnp.arange(l)[None, :]
    u = jnp.where(pos < seqlen[:, None], u, jnp.inf)
    rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
    chosen = rank < sub_len[:, None]
    safe = jnp.where(seq == 0, 1, seq)
    similar = online_top1_similar(item_embeddings, safe)
    return jnp.where(chosen & (seq != 0), similar, seq), seqlen


def item_insert(
    rng: jax.Array,
    seq: jax.Array,
    seqlen: jax.Array,
    item_embeddings: jax.Array,
    insert_rate: float = 0.4,
) -> Tuple[jax.Array, jax.Array]:
    """Insert the top-1 similar item before ``max(1, rate·len)`` random
    positions (reference ``Item_Insert``); fixed output width: the expanded
    sequence is truncated to L from the left like the reference's pipeline."""
    b, l = seq.shape
    ins_len = jnp.maximum(1, (insert_rate * seqlen).astype(jnp.int32))
    u = jax.random.uniform(rng, (b, l))
    pos = jnp.arange(l)[None, :]
    u = jnp.where(pos < seqlen[:, None], u, jnp.inf)
    rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
    chosen = (rank < ins_len[:, None]) & (seq != 0)
    safe = jnp.where(seq == 0, 1, seq)
    similar = online_top1_similar(item_embeddings, safe)
    # interleave: output position of element j is j + (#chosen before j) (+1 if
    # its own inserted partner precedes it)
    before = jnp.cumsum(chosen, axis=1) - chosen.astype(jnp.int32)
    out_pos_item = pos + before + chosen.astype(jnp.int32)
    out_pos_ins = pos + before
    width = l + l  # worst case before truncation
    out = jnp.zeros((b, width), seq.dtype)
    rows = jnp.arange(b)[:, None].repeat(l, 1)
    out = out.at[rows, out_pos_ins].add(jnp.where(chosen, similar, 0))
    out = out.at[rows, out_pos_item].add(jnp.where(pos < seqlen[:, None], seq, 0))
    total = seqlen + ins_len
    new_len = jnp.minimum(total, l)
    keep = jnp.arange(width)[None, :] < total[:, None]
    out = jnp.where(keep, out, 0)
    # keep the most recent L tokens (truncate from the left, like the
    # reference pipeline's truncate_or_pad)
    offset = jnp.maximum(total - l, 0)
    src = offset[:, None] + jnp.arange(l)[None, :]
    out = jnp.take_along_axis(out, jnp.clip(src, 0, width - 1), axis=1)
    return out, new_len

"""GNN — item-transition-graph propagation feeding a SASRec-style encoder.

Reference ``model/gnn.py``: build a weighted item-transition graph from the
val ('old') or train ('new') sequences with a sliding window (weight 1/dist),
symmetrize + self-loops, normalize ``D@A + A@D``; propagate the item table
``gnn_layer`` times through the sparse adjacency and average all layers with
layer 0; the propagated table replaces the raw lookup inside a causal
transformer encoder. Scoring/training still uses the **raw** table
(``model/basemodel.py:206``).

TPU design: the graph is built host-side (numpy/scipy) once; on device the
sparse matmul becomes an edge-list gather + ``segment_sum`` — XLA lowers this
to sort-based scatter which beats materializing an [N, N] dense adjacency
(N up to ~20k -> 1.6 GB dense).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import numpy as np

from dr4sr_tpu.models.base import embedding_init
from dr4sr_tpu.models.registry import register_model
from dr4sr_tpu.models.sasrec import SASRecEncoder
from dr4sr_tpu.modules.layers import seq_pooling


def build_transition_graph(
    seqs: np.ndarray,  # [N, L] post-padded
    seqlens: np.ndarray,  # [N]
    num_items: int,
    window: int = 2,
    drop_last: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Edge list (row, col, weight) of the normalized adjacency.

    ``drop_last`` reproduces the 'old' graph's ``item_list_len -= 1`` (the
    val rows include the train target as their last item).
    """
    import scipy.sparse as sp

    rows, cols, data = [], [], []
    for i in range(len(seqs)):
        n = int(seqlens[i]) - (1 if drop_last else 0)
        items = seqs[i][:n]
        for j in range(n - 1):
            t = min(window, n - j - 1)
            rows.extend([items[j]] * t)
            cols.extend(items[j + 1 : j + 1 + t])
            data.append(1.0 / np.arange(1, 1 + t))
    if not data:
        idx = np.arange(num_items)
        return idx, idx, np.ones(num_items, np.float32)
    data = np.concatenate(data)
    mat = sp.csc_matrix((data, (rows, cols)), shape=(num_items, num_items))
    mat = mat + mat.T + sp.eye(num_items)
    degree = np.asarray((mat > 0).sum(1)).ravel()
    with np.errstate(divide="ignore"):
        inv = np.nan_to_num(1.0 / degree, posinf=0.0)
    d = sp.diags(inv)
    norm = (d @ mat + mat @ d).tocoo()
    return (
        norm.row.astype(np.int32),
        norm.col.astype(np.int32),
        norm.data.astype(np.float32),
    )


def propagate(
    table: jax.Array,  # [N, D]
    edge_row: jax.Array,
    edge_col: jax.Array,
    edge_w: jax.Array,
    num_layers: int,
) -> jax.Array:
    """Mean of 0..num_layers powers of the normalized adjacency."""
    n = table.shape[0]
    acc = table
    emb = table
    for _ in range(num_layers):
        msgs = emb[edge_col] * edge_w[:, None]
        emb = jax.ops.segment_sum(msgs, edge_row, num_segments=n)
        acc = acc + emb
    return acc / (num_layers + 1)


class GNNEncoder(nn.Module):
    num_items: int
    embed_dim: int
    max_seq_len: int
    num_heads: int
    hidden_size: int
    num_layers: int
    gnn_layers: int
    dropout: float
    num_edges: int
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    def setup(self):
        from dr4sr_tpu.parallel.ep import padded_rows

        self.item_embedding = nn.Embed(
            padded_rows(self.num_items), self.embed_dim,
            embedding_init=embedding_init,
        )
        self.backbone = SASRecEncoder(
            num_items=1,  # placeholder table, unused (seq_emb injected)
            embed_dim=self.embed_dim,
            max_seq_len=self.max_seq_len,
            num_heads=self.num_heads,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            dropout=self.dropout,
            activation=self.activation,
            layer_norm_eps=self.layer_norm_eps,
        )

    def __call__(
        self,
        batch: Dict[str, jax.Array],
        training: bool = False,
        need_pooling: bool = True,
    ) -> jax.Array:
        # graph edges ride in the batch (host-built constants)
        table = propagate(
            self.item_embedding.embedding,
            batch["edge_row"],
            batch["edge_col"],
            batch["edge_weight"],
            self.gnn_layers,
        )
        seq = batch["in_item_id"]
        seq_embs = table[seq]
        inner = dict(batch)
        inner["seq_emb"] = seq_embs
        inner["key_padding_mask"] = seq == 0
        out = self.backbone(inner, training=training, need_pooling=False)
        # key-padding must still reflect the real sequence (seq_emb path skips it)
        if not need_pooling:
            return out
        pooling = "origin" if training else "last"
        return seq_pooling(out, batch["seqlen"], pooling)


@register_model("GNN")
class GNN:
    needs_graph = True

    @staticmethod
    def build(config: Dict[str, Any], num_items: int, num_edges: int = 0, **kwargs):
        m = config["model"]
        return GNNEncoder(
            num_items=num_items,
            embed_dim=int(m["embed_dim"]),
            max_seq_len=int(config["data"]["max_seq_len"]),
            num_heads=int(m["head_num"]),
            hidden_size=int(m["hidden_size"]),
            num_layers=int(m["layer_num"]),
            gnn_layers=int(m.get("gnn_layer", 2)),
            dropout=float(m["dropout_rate"]),
            num_edges=num_edges,
        )

"""Runnable graph-contrastive auxiliary models: SGL, NCL, SimGCL.

The reference carries these as RecStudio remnants that no model ever
instantiates (``module/data_augmentation.py:407-575`` — they expect a
user-item bipartite graph the repo never builds, and faiss for NCL's
prototypes). Here they are **live ``-m`` models**: a SASRec sequential
backbone plus the corresponding graph-CL objective adapted to the
item-transition graph this framework already constructs for GNN
(``model/gnn.py:102-171``). Users do not appear in the sequential backbone's
parameter space, so the user-side CL terms of the originals are dropped —
the item-side terms (the ones acting on parameters that exist) are kept
with the reference temperatures/weights.

Each model contributes through the generic trainer hooks:

* ``aux_loss(module, variables, batch, rng, model_cfg, num_items)`` — added
  to the main loss inside the jitted train step;
* ``refresh_state(trainer, nepoch)`` — per-epoch host-driven state (NCL's
  k-means prototype E-step, faiss → ``modules.graph_augmentation.kmeans``),
  merged into ``trainer.batch_extras``.

Like the reference's batch=full loaders, the CL terms do not mask the rare
padded tail rows of the final batch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dr4sr_tpu.models.registry import register_model
from dr4sr_tpu.models.sasrec import SASRec
from dr4sr_tpu.modules.graph_augmentation import (
    Graph,
    edge_dropout,
    fit_prototypes,
    info_nce_all,
    propagate_layers,
    propagate_mean,
)


def _batch_graph(batch, num_items: int) -> Graph:
    return Graph(batch["edge_row"], batch["edge_col"], batch["edge_weight"],
                 num_items)


def _last_target_items(batch) -> jax.Array:
    """[B] final supervised item per row (per-position targets [B, L])."""
    item_id = batch["item_id"]
    if item_id.ndim == 1:
        return item_id
    idx = jnp.clip(batch["seqlen"] - 1, 0, item_id.shape[1] - 1)
    return jnp.take_along_axis(item_id, idx[:, None], axis=1)[:, 0]


def _two_view_item_cl(variables, batch, model_cfg, num_items, make_views):
    """Shared SGL/SimGCL objective: build two propagated views of the item
    table, then cosine InfoNCE on the batch's supervised items with catalog
    negatives. ``make_views(graph, table) -> (v1, v2)`` is the only part the
    two models differ in."""
    table = variables["params"]["item_embedding"]["embedding"][:num_items]
    g = _batch_graph(batch, num_items)
    v1, v2 = make_views(g, table)
    items = _last_target_items(batch)
    t = float(model_cfg.get("ssl_temperature", 0.2))
    w = float(model_cfg.get("ssl_weight", 0.1))
    return w * info_nce_all(v1[items], v2[items], v2[1:], t)


@register_model("SGL")
class SGL(SASRec):
    """SASRec + SGL item CL: two edge/node-dropout views of the transition
    graph, cosine InfoNCE with catalog negatives (reference
    ``SGLAugmentation``, ``module/data_augmentation.py:407-455``)."""

    needs_graph = True

    @staticmethod
    def build(config: Dict[str, Any], num_items: int, **kwargs):
        kwargs.pop("num_edges", None)
        return SASRec.build(config, num_items, **kwargs)

    @staticmethod
    def aux_loss(module, variables, batch, rng, model_cfg, num_items):
        r1, r2 = jax.random.split(rng)
        ratio = float(model_cfg.get("ssl_ratio", 0.1))
        layers = int(model_cfg.get("gnn_layer", 2))

        def views(g, table):
            return (propagate_mean(edge_dropout(r1, g, ratio), table, layers),
                    propagate_mean(edge_dropout(r2, g, ratio), table, layers))

        return _two_view_item_cl(variables, batch, model_cfg, num_items, views)


@register_model("SimGCL")
class SimGCL(SASRec):
    """SASRec + SimGCL item CL: two noise-perturbed propagations (reference
    ``SimGCLAugmentation``, ``module/data_augmentation.py:528-575``)."""

    needs_graph = True

    @staticmethod
    def build(config: Dict[str, Any], num_items: int, **kwargs):
        kwargs.pop("num_edges", None)
        return SASRec.build(config, num_items, **kwargs)

    @staticmethod
    def aux_loss(module, variables, batch, rng, model_cfg, num_items):
        r1, r2 = jax.random.split(rng)
        eps = float(model_cfg.get("noise_eps", 0.1))
        layers = int(model_cfg.get("gnn_layer", 2))

        def views(g, table):
            return (propagate_mean(g, table, layers, noise_rng=r1, noise_eps=eps),
                    propagate_mean(g, table, layers, noise_rng=r2, noise_eps=eps))

        return _two_view_item_cl(variables, batch, model_cfg, num_items, views)


@register_model("NCL")
class NCL(SASRec):
    """SASRec + NCL item CL: structure term (layer-2k vs layer-0 propagation)
    + semantic term against k-means prototypes refreshed every epoch
    (reference ``NCLAugmentation``, ``module/data_augmentation.py:457-526``;
    faiss k-means → jit'd Lloyd)."""

    needs_graph = True

    @staticmethod
    def build(config: Dict[str, Any], num_items: int, **kwargs):
        kwargs.pop("num_edges", None)
        return SASRec.build(config, num_items, **kwargs)

    @staticmethod
    def refresh_state(trainer, nepoch: int) -> Dict[str, jax.Array]:
        m = trainer.config["model"]
        k = int(m.get("num_clusters", 64))
        table = trainer.state.params["item_embedding"]["embedding"][
            : trainer.num_items
        ]
        proto = fit_prototypes(jax.random.PRNGKey(nepoch), table, k)
        return {"proto_centroids": proto.centroids, "proto_assign": proto.assign}

    @staticmethod
    def aux_loss(module, variables, batch, rng, model_cfg, num_items):
        table = variables["params"]["item_embedding"]["embedding"][:num_items]
        g = _batch_graph(batch, num_items)
        hyper = int(model_cfg.get("hyper_layers", 1))
        layers = propagate_layers(g, table, 2 * hyper)
        center, context = layers[0], layers[2 * hyper]
        items = _last_target_items(batch)
        t = float(model_cfg.get("ssl_temperature", 0.2))
        structure = info_nce_all(context[items], center[items], center[1:], t)
        cents = batch["proto_centroids"]
        assign = batch["proto_assign"]
        semantic = info_nce_all(center[items], cents[assign[items]], cents, t)
        w_s = float(model_cfg.get("ssl_weight", 0.1))
        w_p = float(model_cfg.get("proto_weight", 0.1))
        return w_s * structure + w_p * semantic

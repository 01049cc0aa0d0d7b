"""Training-side embedding-parallel (EP) gathers.

With the item table row-sharded over the ``model`` mesh axis
(``MeshPlan(shard_embedding=True)``), a naive ``table[ids]`` inside ``jit``
lets XLA pick the partitioning strategy for the gather — which for a small
catalog is typically a **full-table all-gather** per train step. SURVEY §2.2
names the communication-efficient alternative the north-star: gather locally
on each shard and combine the (much smaller) per-id embeddings over ICI.

:func:`ep_gather` is that path, as an explicit ``shard_map``:

* each shard holds ``N/S`` contiguous table rows;
* ids are looked up locally where owned (``0`` elsewhere) and ``psum`` over
  the ``model`` axis combines them — communication is ``B·L·D`` floats
  (the gathered embeddings) instead of ``N·D`` (the table);
* the transpose (backward) is the local scatter-add of the incoming
  cotangents, so gradients stay row-sharded with no table-sized collective
  either.

The active plan is process-global (one model × one mesh per process, like
the trainer): the trainer calls :func:`set_plan` before tracing its steps.
Everything degrades to plain ``table[ids]`` when no plan is set, so
single-device and pure-DP paths are untouched.

Reference had no distributed code at all (SURVEY §2.2); this replaces
nothing and exists because the TPU design row-shards the catalog.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dr4sr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_PLAN: Optional[Mesh] = None


def set_plan(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with None) the EP mesh used by :func:`ep_gather`.
    Must be set before the train/eval steps are traced."""
    global _PLAN
    _PLAN = mesh


def get_plan() -> Optional[Mesh]:
    return _PLAN


@contextlib.contextmanager
def ep_plan(mesh: Optional[Mesh]):
    prev = _PLAN
    set_plan(mesh)
    try:
        yield
    finally:
        set_plan(prev)


def pad_rows(n: int, mesh: Optional[Mesh]) -> int:
    """Table rows padded up so every model-axis shard is equal-sized."""
    if mesh is None:
        return n
    s = mesh.shape.get(MODEL_AXIS, 1)
    return ((n + s - 1) // s) * s


def padded_rows(n: int) -> int:
    """Item-table rows under the ACTIVE plan. Models call this in ``setup``
    when declaring the embedding, so the parameter is born shard-aligned
    (flax validates declared shapes on every apply, so post-init padding is
    not an option). Identity when no EP plan is installed."""
    return pad_rows(n, _PLAN)


def ep_gather(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[ids]`` that stays communication-efficient when the table is
    row-sharded: per-shard local lookup + psum of the gathered embeddings.

    ``table``: [N, D] (N divisible by the model-axis size — the trainer pads
    the parameter at init). ``ids``: any integer shape, batch-major (leading
    axis rides the ``data`` mesh axis).
    """
    mesh = _PLAN
    if mesh is None or mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return table[ids]

    def local(t_local: jax.Array, ids_local: jax.Array) -> jax.Array:
        shard = jax.lax.axis_index(MODEL_AXIS)
        n_local = t_local.shape[0]
        loc = ids_local - shard * n_local
        owned = (loc >= 0) & (loc < n_local)
        emb = t_local[jnp.clip(loc, 0, n_local - 1)]
        emb = jnp.where(owned[..., None], emb, 0.0)
        return jax.lax.psum(emb, MODEL_AXIS)

    ids_rest = (None,) * (ids.ndim - 1)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, *ids_rest)),
        out_specs=P(DATA_AXIS, *ids_rest, None),
        check_vma=False,
    )(table, ids)


def embed_lookup(embed_module, ids: jax.Array) -> jax.Array:
    """EP-aware replacement for ``nn.Embed.__call__`` on the item table."""
    return ep_gather(embed_module.embedding, ids)

"""Device mesh + sharding plan.

The reference is single-GPU (``set_device``, ``utils/utils.py:22-26``); here
parallelism is mesh-native from the start:

* axis ``data``  — batch (DP); gradients are averaged implicitly because the
  loss mean contracts over the sharded batch axis under jit.
* axis ``model`` — catalog rows: the item-embedding table and the full-catalog
  logits ``[B, N_items]`` shard over items (the recsys "EP"/TP axis); top-k
  merges per-shard candidates over ICI (see ``ops.topk.sharded_masked_topk``).

Multi-host: call :func:`init_distributed` first; ``jax.devices()`` then spans
the slice and the same mesh code works unchanged (collectives ride ICI within
a slice, DCN across slices — XLA picks per mesh-axis placement order).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(**kwargs) -> None:
    """Multi-host initialization (idempotent)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized / single-process


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} mesh != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


@dataclasses.dataclass
class MeshPlan:
    """Sharding plan bound to a mesh (or None = single device)."""

    mesh: Optional[Mesh] = None
    shard_embedding: bool = False  # row-shard the item table over MODEL_AXIS

    @property
    def data_size(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape[DATA_AXIS]

    def batch_sharding(self, ndim: int) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    def stacked_batch_sharding(self, ndim: int) -> Optional[NamedSharding]:
        """Sharding for a [steps, batch, ...] stack of batches (the
        device-resident multi-step dispatch path): the scan axis is
        replicated, the batch axis shards over ``data``."""
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))

    def replicated(self) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P())

    def param_sharding(self, path: str, ndim: int) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        if self.shard_embedding and path.endswith("item_embedding/embedding"):
            return NamedSharding(self.mesh, P(MODEL_AXIS, *([None] * (ndim - 1))))
        return self.replicated()


def put_global(value: Any, sharding: NamedSharding) -> jax.Array:
    """Place a host array under a sharding that may span processes.

    Single-process (the common case): plain ``device_put``. Multi-process
    (after :func:`init_distributed`): every host holds the FULL array (our
    loaders are deterministic per-host), so each process donates the slices
    it can address via ``make_array_from_callback`` — ``device_put`` onto
    non-addressable devices would fail.
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    arr = np.asarray(value)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def shard_params(params: Any, plan: MeshPlan) -> Any:
    """Place params per the plan: everything replicated except (optionally)
    the item-embedding table, row-sharded over the ``model`` axis."""
    if plan.mesh is None:
        return params
    from jax.tree_util import tree_map_with_path

    def place(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        sh = plan.param_sharding(path_str, np.ndim(leaf))
        return put_global(leaf, sh)

    return tree_map_with_path(place, params)


def shard_batch(batch: Dict[str, np.ndarray], plan: MeshPlan) -> Dict[str, jax.Array]:
    """Host batch -> device arrays, batch axis sharded over ``data``."""
    if plan.mesh is None:
        return jax.device_put(batch)
    out = {}
    for k, v in batch.items():
        out[k] = put_global(v, plan.batch_sharding(np.ndim(v)))
    return out


def replicate(tree: Any, plan: MeshPlan) -> Any:
    if plan.mesh is None:
        return tree
    sh = plan.replicated()
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), tree)


def pad_batch_to_multiple(batch: Dict[str, np.ndarray], multiple: int) -> Dict[str, np.ndarray]:
    """Pad the leading axis so it divides the data-axis size (valid=False pads)."""
    b = len(batch["user_id"])
    rem = (-b) % multiple
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        pad_width = [(0, rem)] + [(0, 0)] * (np.ndim(v) - 1)
        out[k] = np.pad(v, pad_width)
    out["valid"] = np.concatenate([batch["valid"], np.zeros(rem, bool)])
    return out

"""Checkpointing.

Logical contents mirror the reference's ``EarlyStopping`` checkpoints
(``utils/callbacks.py:70-85``): ``{config, model, epoch, parameters, metric}``
— serialized with flax msgpack (+ a JSON sidecar for the metadata) instead of
``torch.save``. Works on sharded params: arrays are fetched to host first
(fully-replicated or addressable), which is sufficient at DR4SR scale; the
format is a single file, trivially rsync-able for multi-host restarts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(
    path: str,
    params: Any,
    config: Dict[str, Any],
    model_name: str,
    epoch: int,
    metric: Dict[str, float],
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_params))
    meta = {
        "config": config,
        "model": model_name,
        "epoch": int(epoch),
        "metric": {k: float(v) for k, v in metric.items()},
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1, default=str)


def load_checkpoint(path: str, target_params: Any) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        params = serialization.from_bytes(jax.device_get(target_params), f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return params, meta


def load_torch_embedding(path: str) -> Optional[np.ndarray]:
    """Read the item-embedding table from a reference torch ``.ckpt``
    (``parameters['item_embedding.weight']``, cf.
    ``2.Pretrain_regenerator.py:169-178``) **or** from one of our msgpack
    checkpoints (``params['item_embedding']['embedding']``)."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head.startswith(b"PK") or head.startswith(b"\x80"):  # torch zip/pickle
        import torch

        saved = torch.load(path, map_location="cpu", weights_only=False)
        params = saved.get("parameters", saved)
        for key in ("item_embedding.weight", "item_embedding"):
            if key in params:
                return np.asarray(params[key].detach().cpu().numpy(), np.float32)
        return None
    # flax msgpack: deserialize without a target template
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        tree = msgpack_restore(f.read())

    def find(node):
        if isinstance(node, dict):
            if "item_embedding" in node:
                emb = node["item_embedding"]
                if isinstance(emb, dict) and "embedding" in emb:
                    return np.asarray(emb["embedding"], np.float32)
            for v in node.values():
                out = find(v)
                if out is not None:
                    return out
        return None

    return find(tree)

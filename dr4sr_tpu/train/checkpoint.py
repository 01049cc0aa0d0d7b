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
    """Read ``parameters['item_embedding.weight']`` from a reference ``.ckpt``
    (used to seed the regenerator, ``2.Pretrain_regenerator.py:169-178``)."""
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    params = saved.get("parameters", saved)
    for key in ("item_embedding.weight", "item_embedding"):
        if key in params:
            return np.asarray(params[key].detach().cpu().numpy(), np.float32)
    return None

"""Serving: batched top-k recommendation over a trained checkpoint.

The reference has no serving story (training-repo only); production use of a
sequential recommender is "given recent item histories, return top-k unseen
items". This module packages that as one jitted program per (batch, k) shape:
encode histories → full-catalog scores → mask PAD/seen → top-k.

    rec = Recommender.from_checkpoint("saved/SASRec/amazon-toys/<ts>.ckpt")
    items, scores = rec.recommend([[12, 880, 43], [7, 7, 301]], k=10)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dr4sr_tpu.models.base import RecModel, item_table
from dr4sr_tpu.models.registry import get_model_class
from dr4sr_tpu.ops.topk import masked_topk_scores


class Recommender:
    def __init__(
        self,
        rec: RecModel,
        params,
        item_keep_mask: Optional[np.ndarray] = None,
        batch_size: int = 256,
    ) -> None:
        self.rec = rec
        self.params = jax.device_put(params)
        self.max_seq_len = rec.max_seq_len
        self.batch_size = batch_size
        keep = (
            np.ones(rec.num_items, bool)
            if item_keep_mask is None
            else np.array(item_keep_mask, bool)  # copy: never mutate caller's mask
        )
        keep[0] = False
        self.keep_mask = jnp.asarray(keep)
        self._step = None

    @classmethod
    def from_checkpoint(cls, path: str, root: Optional[str] = None,
                        **kwargs) -> "Recommender":
        """Rebuild the model from a framework checkpoint (+ its embedded
        config) and load the best params."""
        import json

        from dr4sr_tpu.data.dataset import _load_meta
        from dr4sr_tpu.train.checkpoint import load_checkpoint

        with open(path + ".json") as f:
            meta = json.load(f)
        config = meta["config"]
        from dr4sr_tpu.data.dataset import DATASET_ROOT

        ds_meta = _load_meta(root or DATASET_ROOT, config["data"]["dataset"],
                             config["data"]["domain_name_list"])
        model_cls = get_model_class(config["model"]["model"])
        module = model_cls.build(config, ds_meta["num_items"])
        rec = RecModel(config, module, ds_meta["num_items"], ds_meta["num_users"])
        # init a skeleton to get the param structure, then load
        sample = {
            "in_item_id": np.zeros((1, rec.max_seq_len), np.int32),
            "seqlen": np.ones(1, np.int32),
            "item_id": np.zeros(1, np.int32),
        }
        variables = rec.init(jax.random.PRNGKey(0), sample)
        params, _ = load_checkpoint(path, variables["params"])
        return cls(rec, params, **kwargs)

    def _compiled_step(self, k: int):
        if self._step is None or self._step[0] != k:

            @jax.jit
            def step(params, batch, keep):
                query = self.rec.encode_eval({"params": params}, batch)
                table = item_table({"params": params})[: self.rec.num_items]
                return masked_topk_scores(
                    query, table, min(k, self.rec.num_items),
                    item_keep_mask=keep, user_hist=batch["user_hist"],
                )

            self._step = (k, step)
        return self._step[1]

    def recommend(
        self, histories: Sequence[Sequence[int]], k: int = 10,
        exclude_seen: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (items [N, k], scores [N, k]) for each history."""
        step = self._compiled_step(k)
        n = len(histories)
        L = self.max_seq_len
        out_items = np.zeros((n, k), np.int64)
        out_scores = np.zeros((n, k), np.float32)
        for start in range(0, n, self.batch_size):
            chunk = histories[start : start + self.batch_size]
            b = self.batch_size
            seq = np.zeros((b, L), np.int32)
            seqlen = np.ones(b, np.int32)
            for i, h in enumerate(chunk):
                h = list(h)[-L:]
                seq[i, : len(h)] = h
                seqlen[i] = max(len(h), 1)
            batch = {
                "in_item_id": seq,
                "seqlen": seqlen,
                "user_hist": seq if exclude_seen else np.zeros((b, 1), np.int32),
            }
            scores, items = step(self.params, jax.device_put(batch), self.keep_mask)
            m = len(chunk)
            out_items[start : start + m] = np.asarray(items)[:m]
            out_scores[start : start + m] = np.asarray(scores)[:m]
        return out_items, out_scores

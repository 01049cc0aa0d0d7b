"""Fixed-shape host-side batch iteration.

XLA compiles one program per input shape, so every batch this iterator yields
has identical shapes: the final partial batch is padded up to ``batch_size``
and flagged via a ``valid`` mask (the reference simply yields a ragged last
batch — fine for eager PyTorch, a recompile per epoch under jit).

Batches are dicts of numpy arrays with the reference's key schema
(``data/dataset.py:149-164``): ``user_id, in_item_id, item_id, seqlen, label,
domain_id, index (, user_hist)`` plus our ``valid``.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from dr4sr_tpu.data.dataset import RowData

Batch = Dict[str, np.ndarray]


class BatchIterator:
    def __init__(
        self,
        rows: RowData,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        pad_to_full: bool = True,
        drop_last: bool = False,
    ) -> None:
        self.rows = rows
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.pad_to_full = pad_to_full
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.rows)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.rows)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        self._epoch += 1
        bs = self.batch_size
        num_batches = len(self)
        for b in range(num_batches):
            idx = order[b * bs : (b + 1) * bs]
            valid_count = len(idx)
            if self.pad_to_full and valid_count < bs:
                pad = np.zeros(bs - valid_count, dtype=idx.dtype)
                idx = np.concatenate([idx, pad])
            yield self._make_batch(idx, valid_count)

    def _make_batch(self, idx: np.ndarray, valid_count: int) -> Batch:
        rows = self.rows
        batch: Batch = {
            "user_id": rows.user_id[idx],
            "in_item_id": rows.in_item_id[idx],
            "item_id": rows.item_id[idx],
            "seqlen": rows.seqlen[idx],
            "label": rows.label[idx],
            "domain_id": rows.domain_id[idx],
            "index": idx.astype(np.int32),
            "valid": (np.arange(len(idx)) < valid_count),
        }
        if rows.user_hist is not None:
            batch["user_hist"] = rows.user_hist[idx]
        return batch

    def sample_batch(self, batch_size: Optional[int] = None) -> Batch:
        """One random batch (used by the bilevel outer loop's val proxy)."""
        bs = batch_size or self.batch_size
        n = len(self.rows)
        idx = self._rng.integers(0, n, size=min(bs, n))
        valid_count = len(idx)
        if self.pad_to_full and valid_count < bs:
            idx = np.concatenate([idx, np.zeros(bs - valid_count, dtype=idx.dtype)])
        return self._make_batch(idx, valid_count)

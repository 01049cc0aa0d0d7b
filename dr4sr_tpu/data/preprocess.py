"""Dataset preprocessing (script equivalent of the reference notebooks).

Implements the exact split protocol of ``dataset/preprocess_amazon.ipynb``
(cells 9-24) / ``preprocess_yelp.ipynb``:

* iterative 5-core filtering on users and items;
* factorize ids with PAD=0 (ids start at 1);
* sort by (user, timestamp); per user sequence (last ``max_seq_len`` kept):
  - test  = predict last item from ``seq[:-1]``;
  - val   = predict second-last from ``seq[:-2]``;
  - train = history ``seq[:-3]`` with per-position next-item targets
    ``seq[-len-2:-2]`` and label ``[1]*len`` (post-padded to ``max_seq_len``);
* emit ``seq2pat_data`` = per-user raw item list minus the val/test items
  (``to_list`` in cell 19) for the pattern-mining stage.

Also provides :func:`resplit_sequences` which applies the same leave-last-out
protocol directly to raw per-user sequences — used to build a benchmark split
from the bundled ``seq2pat_data.pth`` files (the reference repo ships only
those, not train/val/test).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from dr4sr_tpu.data.dataset import RowData

PAD = 0


def core_filter(df, user_threshold: int = 5, item_threshold: int = 5):
    """Iterative k-core filtering (notebook cell 9)."""
    while True:
        n = len(df)
        df = df[df["user_id"].map(df["user_id"].value_counts()) >= user_threshold]
        df = df[df["item_id"].map(df["item_id"].value_counts()) >= item_threshold]
        if len(df) == n:
            break
    return df


def factorize_ids(df):
    """Dense ids with PAD=0 (notebook cell 12). Returns df, num_users, num_items."""
    import pandas as pd

    user_codes, user_tokens = pd.factorize(df["user_id"])
    item_codes, item_tokens = pd.factorize(df["item_id"])
    df = df.copy()
    df["user_id"] = user_codes + 1
    df["item_id"] = item_codes + 1
    return df, len(user_tokens) + 1, len(item_tokens) + 1


def _truncate_or_pad(seq: Sequence[int], max_seq_len: int) -> Tuple[List[int], int]:
    seq = list(seq)
    if len(seq) > max_seq_len:
        return seq[-max_seq_len:], max_seq_len
    return seq + [PAD] * (max_seq_len - len(seq)), len(seq)


def build_splits(
    user_seqs: Dict[int, List[int]], max_seq_len: int, domain_idx: int = 0
) -> Tuple[RowData, RowData, RowData]:
    """Leave-last-out splits from per-user item sequences (notebook cell 20).

    Users whose train history would be empty are dropped from train (the
    reference's 5-core filter guarantees len>=5 so this only matters for
    resplit data).
    """
    train, val, test = [], [], []
    for user_id, seq in user_seqs.items():
        seq = list(seq)[-max_seq_len:]
        if len(seq) < 3:
            continue
        # test: history=seq[:-1], target=seq[-1]
        hist, n = _truncate_or_pad(seq[:-1], max_seq_len)
        test.append((user_id, hist, seq[-1], n))
        # val: history=seq[:-2], target=seq[-2]
        hist, n = _truncate_or_pad(seq[:-2], max_seq_len)
        val.append((user_id, hist, seq[-2], n))
        # train: history=seq[:-3], per-position targets seq[-n-2:-2]
        hist, n = _truncate_or_pad(seq[:-3], max_seq_len)
        if n == 0:
            continue
        target, _ = _truncate_or_pad(seq[-n - 2 : -2], max_seq_len)
        train.append((user_id, hist, target, n))

    def pack_eval(rows):
        m = len(rows)
        L = max_seq_len
        out = RowData(
            user_id=np.zeros(m, np.int32),
            in_item_id=np.zeros((m, L), np.int32),
            item_id=np.zeros(m, np.int32),
            seqlen=np.zeros(m, np.int32),
            label=np.ones(m, np.float32),
            domain_id=np.full(m, domain_idx, np.int32),
        )
        for i, (u, h, t, n) in enumerate(rows):
            out.user_id[i] = u
            out.in_item_id[i] = h
            out.item_id[i] = t
            out.seqlen[i] = n
        out.user_hist = out.in_item_id.copy()
        return out

    m = len(train)
    L = max_seq_len
    tr = RowData(
        user_id=np.zeros(m, np.int32),
        in_item_id=np.zeros((m, L), np.int32),
        item_id=np.zeros((m, L), np.int32),
        seqlen=np.zeros(m, np.int32),
        label=np.zeros((m, L), np.float32),
        domain_id=np.full(m, domain_idx, np.int32),
    )
    for i, (u, h, t, n) in enumerate(train):
        tr.user_id[i] = u
        tr.in_item_id[i] = h
        tr.item_id[i] = t
        tr.seqlen[i] = n
        tr.label[i, :n] = 1.0
    return tr, pack_eval(val), pack_eval(test)


def seq2pat_sequences(user_seqs: Dict[int, List[int]]) -> List[List[int]]:
    """Pattern-mining input: per-user sequence minus val/test (cell 19)."""
    return [list(seq)[:-2] for seq in user_seqs.values() if len(seq) > 2]


def save_domain(
    out_dir: str,
    train: RowData,
    val: RowData,
    test: RowData,
    num_users: int,
    num_items: int,
    train_suffix: str = "",
) -> None:
    """Write the native on-disk layout for one domain directory."""
    os.makedirs(out_dir, exist_ok=True)
    train.save_npz(os.path.join(out_dir, f"train{train_suffix}.npz"))
    val.save_npz(os.path.join(out_dir, "val.npz"))
    test.save_npz(os.path.join(out_dir, "test.npz"))
    domain_items = np.unique(
        np.concatenate([train.in_item_id.ravel(), train.item_id.ravel(),
                        val.item_id.ravel(), test.item_id.ravel()])
    )
    domain_items = domain_items[domain_items != PAD]
    domain_users = np.unique(np.concatenate([train.user_id, val.user_id, test.user_id]))
    domain_users = domain_users[domain_users != PAD]
    np.savez(
        os.path.join(out_dir, "meta.npz"),
        num_users=num_users,
        num_items=num_items,
        domain_items=domain_items,
        domain_users=domain_users,
    )


def resplit_sequences(
    sequences: List[List[int]], max_seq_len: int = 50, domain_idx: int = 0
) -> Tuple[RowData, RowData, RowData, int, int]:
    """Apply the leave-last-out protocol to raw sequences (1-indexed users).

    Returns (train, val, test, num_users, num_items).
    """
    user_seqs = {i + 1: s for i, s in enumerate(sequences) if len(s) >= 3}
    num_users = len(sequences) + 1
    num_items = int(max(max(s) for s in sequences if s)) + 1
    tr, va, te = build_splits(user_seqs, max_seq_len, domain_idx)
    return tr, va, te, num_users, num_items

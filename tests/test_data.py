"""Data pipeline: split protocol, loaders, fixed shapes, pre-padding."""

import numpy as np

from dr4sr_tpu.data.dataset import SeqDataset, prepare_datasets
from dr4sr_tpu.data.preprocess import build_splits
from dr4sr_tpu.models.fmlp import pre_pad_batch


def test_build_splits_protocol():
    # one user with sequence 1..7 -> test target 7, val target 6,
    # train history 1..4 with targets 2..5
    user_seqs = {1: [1, 2, 3, 4, 5, 6, 7]}
    train, val, test = build_splits(user_seqs, max_seq_len=10)
    assert test.item_id[0] == 7
    assert list(test.in_item_id[0][:6]) == [1, 2, 3, 4, 5, 6]
    assert test.seqlen[0] == 6
    assert val.item_id[0] == 6
    assert val.seqlen[0] == 5
    assert train.seqlen[0] == 4
    assert list(train.in_item_id[0][:4]) == [1, 2, 3, 4]
    assert list(train.item_id[0][:4]) == [2, 3, 4, 5]
    assert list(train.label[0]) == [1, 1, 1, 1, 0, 0, 0, 0, 0, 0]


def test_build_splits_truncation():
    seq = list(range(1, 60))  # longer than max_seq_len: window = items 10..59
    train, val, test = build_splits({1: seq}, max_seq_len=50)
    assert test.seqlen[0] == 49  # 50-item window minus the test target
    assert test.item_id[0] == 59
    assert train.seqlen[0] == 47
    assert train.item_id[0][train.seqlen[0] - 1] == train.in_item_id[0][train.seqlen[0] - 1] + 1


def test_dataset_and_loader(synthetic_root, synthetic_config):
    datasets = prepare_datasets(synthetic_config, root=synthetic_root)
    train, val, test = datasets
    assert train.num_items == 120
    assert len(train) > 0 and len(val) > 0 and len(test) > 0

    loader = train.get_loader(batch_size=32, seed=0)
    batches = list(loader)
    # every batch has identical static shapes
    for b in batches:
        assert b["in_item_id"].shape == (32, 50)
        assert b["item_id"].shape == (32, 50)
        assert b["valid"].shape == (32,)
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert total_valid == len(train)

    eval_loader = val.get_loader(batch_size=64)
    b = next(iter(eval_loader))
    assert b["item_id"].ndim == 1
    assert "user_hist" in b


def test_domain_item_mask(synthetic_root, synthetic_config):
    train, _, _ = prepare_datasets(synthetic_config, root=synthetic_root)
    mask = train.domain_item_mask("syn")
    assert mask.shape == (train.num_items,)
    assert not mask[0]  # PAD never eligible
    assert mask.sum() > 0


def test_pre_pad_batch():
    batch = {
        "in_item_id": np.array([[1, 2, 3, 0, 0], [4, 0, 0, 0, 0]], np.int32),
        "item_id": np.array([[2, 3, 9, 0, 0], [5, 0, 0, 0, 0]], np.int32),
        "label": np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], np.float32),
        "seqlen": np.array([3, 1], np.int32),
    }
    out = pre_pad_batch(batch)
    assert list(out["in_item_id"][0]) == [0, 0, 1, 2, 3]
    assert list(out["item_id"][0]) == [0, 0, 2, 3, 9]
    assert list(out["in_item_id"][1]) == [0, 0, 0, 0, 4]
    assert list(out["label"][1]) == [0, 0, 0, 0, 1]


def test_rows_from_lists_vectorized_parity():
    """Flat-scatter packing must match the naive per-row loop (train + eval)."""
    import random

    from dr4sr_tpu.data.dataset import rows_from_lists

    rng = random.Random(0)
    L = 7

    def naive(rows, is_train):
        import numpy as np

        n = len(rows)
        def fit(seq):
            seq = list(seq)[:L]
            return seq + [0] * (L - len(seq))
        out = {
            "user_id": np.array([r[0] for r in rows], np.int32),
            "in_item": np.array([fit(r[1]) for r in rows], np.int32),
            "seqlen": np.array([min(int(r[3]), L) for r in rows], np.int32),
            "domain": np.array(
                [r[5][0] if isinstance(r[5], list) else int(r[5]) for r in rows],
                np.int32,
            ),
        }
        if is_train:
            out["item"] = np.array([fit(r[2]) for r in rows], np.int32)
            out["label"] = np.array([fit(r[4]) for r in rows], np.float32)
        else:
            out["item"] = np.array([int(r[2]) for r in rows], np.int32)
            out["label"] = np.array([float(r[4]) for r in rows], np.float32)
        return out

    train_rows = []
    for _ in range(50):
        ln = rng.randint(1, 12)  # some rows exceed L -> truncation path
        seq = [rng.randint(1, 99) for _ in range(ln)]
        train_rows.append(
            [rng.randint(1, 5), seq, [s + 1 for s in seq], ln,
             [1.0] * ln, [0] * ln]
        )
    got = rows_from_lists(train_rows, True, L)
    want = naive(train_rows, True)
    np.testing.assert_array_equal(got.user_id, want["user_id"])
    np.testing.assert_array_equal(got.in_item_id, want["in_item"])
    np.testing.assert_array_equal(got.item_id, want["item"])
    np.testing.assert_array_equal(got.seqlen, want["seqlen"])
    np.testing.assert_array_equal(got.label, want["label"])
    np.testing.assert_array_equal(got.domain_id, want["domain"])

    eval_rows = []
    for _ in range(30):
        ln = rng.randint(1, 12)
        seq = [rng.randint(1, 99) for _ in range(ln)]
        eval_rows.append([rng.randint(1, 5), seq, rng.randint(1, 99), ln,
                          1.0, [2] * ln])
    got = rows_from_lists(eval_rows, False, L)
    want = naive(eval_rows, False)
    np.testing.assert_array_equal(got.in_item_id, want["in_item"])
    np.testing.assert_array_equal(got.item_id, want["item"])
    np.testing.assert_array_equal(got.label, want["label"])
    np.testing.assert_array_equal(got.user_hist, want["in_item"])
    np.testing.assert_array_equal(got.domain_id, want["domain"])

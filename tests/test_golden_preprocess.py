"""Golden-file test: raw CSV → exact train/val/test rows through the
notebook-equivalent preprocessing (5-core filter, factorize, leave-last-out)."""

import io

import numpy as np
import pandas as pd
import pytest

from dr4sr_tpu.data.preprocess import (
    build_splits,
    core_filter,
    factorize_ids,
    seq2pat_sequences,
)

# 3 users × items; u3 and item i9 get filtered by the 2-core rule
RAW_CSV = """u1,i1,5,100
u1,i2,4,200
u1,i3,5,300
u1,i4,3,400
u1,i5,5,500
u2,i1,4,150
u2,i2,5,250
u2,i3,3,350
u2,i5,4,450
u2,i4,5,550
u3,i9,5,999
"""


@pytest.fixture
def raw_df():
    df = pd.read_csv(io.StringIO(RAW_CSV), header=None)
    df.columns = ["user_id", "item_id", "rating", "timestamp"]
    return df


def test_core_filter_drops_rare(raw_df):
    out = core_filter(raw_df, user_threshold=2, item_threshold=2)
    assert "u3" not in set(out["user_id"])
    assert "i9" not in set(out["item_id"])
    assert len(out) == 10


def test_factorize_golden(raw_df):
    df = core_filter(raw_df, 2, 2)
    df, num_users, num_items = factorize_ids(df)
    assert num_users == 3  # 2 users + PAD
    assert num_items == 6  # 5 items + PAD
    assert df["user_id"].min() == 1
    assert df["item_id"].min() == 1


def test_full_pipeline_golden(raw_df):
    df = core_filter(raw_df, 2, 2)
    df, num_users, num_items = factorize_ids(df)
    df = df.sort_values(by=["user_id", "timestamp"])
    user_seqs = df.groupby("user_id")["item_id"].apply(list).to_dict()

    # golden: u1 sequence is i1..i5 in time order → ids [1,2,3,4,5]
    assert user_seqs[1] == [1, 2, 3, 4, 5]
    # u2: i1,i2,i3,i5,i4 by timestamp → [1,2,3,5,4]
    assert user_seqs[2] == [1, 2, 3, 5, 4]

    train, val, test = build_splits(user_seqs, max_seq_len=10)
    # u1: test target 5 from [1,2,3,4]; val target 4 from [1,2,3];
    #     train hist [1,2] targets [2,3]
    assert test.item_id[0] == 5 and test.seqlen[0] == 4
    assert list(test.in_item_id[0][:4]) == [1, 2, 3, 4]
    assert val.item_id[0] == 4 and val.seqlen[0] == 3
    assert train.seqlen[0] == 2
    assert list(train.in_item_id[0][:2]) == [1, 2]
    assert list(train.item_id[0][:2]) == [2, 3]
    assert list(train.label[0][:3]) == [1, 1, 0]
    # u2: train hist [1,2], targets [2,3]
    assert list(train.in_item_id[1][:2]) == [1, 2]
    assert list(train.item_id[1][:2]) == [2, 3]

    # seq2pat input strips the last two items
    seqs = seq2pat_sequences(user_seqs)
    assert seqs[0] == [1, 2, 3]
    assert seqs[1] == [1, 2, 3]


def test_analyzer_plot(tmp_path):
    from dr4sr_tpu.train.callbacks import Analyzer

    a = Analyzer()
    a.record_batch(np.array([3, 8, 25]), {"ndcg@20": np.array([0.1, 0.5, 0.9])})
    out = a.plot(str(tmp_path / "analyzer.png"))
    if out is not None:  # matplotlib present
        import os

        assert os.path.getsize(out) > 0
    assert "ndcg@20" in a.summary()


def test_yelp_csv_and_json_modes(tmp_path):
    """scripts/preprocess.py --yelp-csv / --yelp-json follow the yelp
    notebook protocol (headered 3-col frame, same 5-core + split)."""
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    import pandas as pd

    rows = []
    for u in range(1, 9):
        for i in range(6):
            rows.append((f"u{u}", f"b{(u + i) % 8}", f"2020-01-{i+1:02d}"))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "timestamp"])
    csv = tmp_path / "yelp.csv"
    df.to_csv(csv, index=False)
    js = tmp_path / "review.json"
    with open(js, "w") as f:
        for u, b, d in rows:
            f.write(json.dumps({"user_id": u, "business_id": b, "date": d,
                                "stars": 5}) + "\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = []
    for flag, src in (("--yelp-csv", csv), ("--yelp-json", js)):
        out = tmp_path / flag.strip("-").replace("-", "_")
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "preprocess.py"),
             flag, str(src), "--out", str(out)],
            capture_output=True, text=True, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-800:]
        assert (out / "train.npz").exists() and (out / "meta.npz").exists()
        outs.append(out)
    # identical protocol => identical splits from the two sources
    a = np.load(outs[0] / "train.npz")
    b = np.load(outs[1] / "train.npz")
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])

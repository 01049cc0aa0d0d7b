"""Dataset variants: condense packing, split, selection, pattern, mix."""

import copy

import numpy as np
import pytest

from dr4sr_tpu.data.dataset import (
    CondenseDataset,
    PatternDataset,
    SelectionDataset,
    SplitDataset,
    get_dataset_class,
    prepare_datasets,
)


@pytest.fixture(scope="module")
def variant_setup(tmp_path_factory):
    from dr4sr_tpu.data.synthetic import synthetic_config, write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("variants"))
    write_synthetic_dataset(root, num_users=100, num_items=60, seed=6)
    return root, synthetic_config()


def test_dispatch(variant_setup):
    _, cfg = variant_setup
    for key, cls in [
        ("general", None),
        ("condense", CondenseDataset),
        ("split", SplitDataset),
        ("selection", SelectionDataset),
        ("pattern", PatternDataset),
    ]:
        c = copy.deepcopy(cfg)
        c["data"]["dataset_class"] = key
        got = get_dataset_class(c)
        if cls is not None:
            assert got is cls
    with pytest.raises(NotImplementedError):
        c = copy.deepcopy(cfg)
        c["data"]["dataset_class"] = "bogus"
        get_dataset_class(c)


def test_condense_packs_sequences(variant_setup):
    root, cfg = variant_setup
    cfg = copy.deepcopy(cfg)
    cfg["data"]["dataset_class"] = "condense"
    train, _, _ = prepare_datasets(cfg, root=root)
    base_cfg = copy.deepcopy(cfg)
    base_cfg["data"]["dataset_class"] = "general"
    base_train, _, _ = prepare_datasets(base_cfg, root=root)
    # packing preserves total token count but uses fewer rows
    assert len(train) <= len(base_train)
    assert train.rows().seqlen.sum() == base_train.rows().seqlen.sum()
    # every row fits and label marks the filled region
    rows = train.rows()
    assert (rows.seqlen <= 50).all()
    for i in range(min(5, len(rows))):
        n = rows.seqlen[i]
        assert (rows.in_item_id[i][:n] != 0).all()
        assert (rows.in_item_id[i][n:] == 0).all()


def test_selection_halves(variant_setup):
    root, cfg = variant_setup
    cfg = copy.deepcopy(cfg)
    cfg["data"]["dataset_class"] = "selection"
    train, _, _ = prepare_datasets(cfg, root=root)
    base_cfg = copy.deepcopy(cfg)
    base_cfg["data"]["dataset_class"] = "general"
    base_train, _, _ = prepare_datasets(base_cfg, root=root)
    assert len(train) == len(base_train) // 2


def test_split_splits_long_rows(variant_setup):
    root, cfg = variant_setup
    cfg = copy.deepcopy(cfg)
    cfg["data"]["dataset_class"] = "split"
    train, _, _ = prepare_datasets(cfg, root=root)
    rows = train.rows()
    # token mass preserved
    base_cfg = copy.deepcopy(cfg)
    base_cfg["data"]["dataset_class"] = "general"
    base_train, _, _ = prepare_datasets(base_cfg, root=root)
    assert rows.seqlen.sum() == base_train.rows().seqlen.sum()
    assert len(rows) >= len(base_train)


def test_pattern_modes(variant_setup):
    root, cfg = variant_setup
    cfg = copy.deepcopy(cfg)
    cfg["data"]["dataset_class"] = "pattern"
    cfg["data"]["train_file"] = "_ori"
    train, _, _ = prepare_datasets(cfg, root=root)
    n_ori = len(train._data)
    n_pat = len(train._pattern_data)
    train.set_mode("original")
    assert len(train) == n_ori
    train.set_mode("pattern")
    assert len(train) == n_pat
    train.set_mode("all")
    assert len(train) == n_ori + n_pat

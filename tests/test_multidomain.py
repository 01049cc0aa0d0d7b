"""Multi-domain: per-domain eval masking + cross-domain aggregation."""

import copy
import os

import numpy as np
import pytest

from dr4sr_tpu.data.dataset import prepare_datasets
from dr4sr_tpu.data.preprocess import build_splits, save_domain
from dr4sr_tpu.data.synthetic import markov_sequences, synthetic_config
from dr4sr_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def two_domain_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("twodom"))
    # domain A: items 1..59, domain B: items 60..119 (disjoint catalogs)
    num_items = 120
    for idx, (dom, lo, hi, seed) in enumerate(
        [("doma", 1, 60, 0), ("domb", 60, 120, 1)]
    ):
        seqs = markov_sequences(num_users=80, num_items=hi - lo + 1, seed=seed)
        seqs = [[x + lo - 1 for x in s] for s in seqs]
        user_base = idx * 100
        user_seqs = {user_base + i + 1: s for i, s in enumerate(seqs) if len(s) >= 3}
        tr, va, te = build_splits(user_seqs, 50, domain_idx=idx)
        save_domain(os.path.join(root, "multi", dom), tr, va, te, 300, num_items)
    return root


@pytest.fixture(scope="module")
def two_domain_cfg():
    cfg = synthetic_config()
    cfg["data"]["dataset"] = "multi"
    cfg["data"]["domain_name_list"] = ["doma", "domb"]
    cfg["train"]["epochs"] = 1
    cfg["train"]["batch_size"] = 32
    return cfg


def test_domains_concatenate_for_train(two_domain_root, two_domain_cfg):
    train, val, test = prepare_datasets(two_domain_cfg, root=two_domain_root)
    assert train.num_domains == 2
    rows = train.rows()
    assert set(np.unique(rows.domain_id)) == {0, 1}
    # per-domain eval stores stay separate
    val.set_eval_domain("doma")
    n_a = len(val)
    val.set_eval_domain("domb")
    n_b = len(val)
    assert n_a > 0 and n_b > 0
    # disjoint item catalogs
    mask_a = train.domain_item_mask("doma")
    mask_b = train.domain_item_mask("domb")
    assert not (mask_a & mask_b).any()


def test_cross_domain_metric_aggregation(two_domain_root, two_domain_cfg, tmp_path):
    cfg = copy.deepcopy(two_domain_cfg)
    datasets = prepare_datasets(cfg, root=two_domain_root)
    trainer = Trainer(cfg, datasets, workdir=str(tmp_path))
    trainer.fit()
    m = trainer.logged_metrics
    # per-domain keys + summed cross-domain keys (reference fit_loop:142-148)
    assert "doma_ndcg@20" in m and "domb_ndcg@20" in m
    np.testing.assert_allclose(
        m["ndcg@20"], m["doma_ndcg@20"] + m["domb_ndcg@20"], rtol=1e-6
    )
    out = trainer.evaluate()
    np.testing.assert_allclose(
        out["ndcg@20"], out["doma_ndcg@20"] + out["domb_ndcg@20"], rtol=1e-6
    )
    # domain masking: recommendations for domain A never leave its catalog
    keep = datasets[2].domain_item_mask("doma")
    batch = datasets[2].get_loader(batch_size=16).sample_batch(16)
    db = trainer._device_batch(batch)
    import jax.numpy as jnp

    _, items = trainer._topk_for_eval(
        trainer.state.params, db, 10, jnp.asarray(keep)
    )
    assert np.asarray(jnp.take(jnp.asarray(keep), items)).all()

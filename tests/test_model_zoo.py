"""Every model family: one training epoch + eval on synthetic data."""

import copy

import numpy as np
import pytest

from dr4sr_tpu.data.dataset import prepare_datasets
from dr4sr_tpu.quickstart import make_trainer


@pytest.fixture(scope="module")
def zoo_setup(tmp_path_factory):
    from dr4sr_tpu.data.synthetic import synthetic_config, write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("zoo"))
    write_synthetic_dataset(root, num_users=120, num_items=50, seed=4)
    return root, synthetic_config()


def _run_model(root, base_cfg, model_name, extra_model_cfg=None, tmp=None):
    if tmp is None:  # never litter the repo's saved/ from tests
        import tempfile

        tmp = tempfile.mkdtemp(prefix="zoo_workdir_")
    cfg = copy.deepcopy(base_cfg)
    cfg["model"]["model"] = model_name
    cfg["train"]["epochs"] = 1
    cfg["train"]["batch_size"] = 32
    if extra_model_cfg:
        cfg["model"].update(extra_model_cfg)
    datasets = prepare_datasets(cfg, root=root)
    trainer = make_trainer(cfg, datasets, workdir=tmp)
    trainer.fit()
    out = trainer.evaluate()
    assert np.isfinite(trainer.logged_metrics["train_loss"])
    for key in ("ndcg@20", "recall@20"):
        assert 0.0 <= out[key] <= 1.0
    return trainer, out


def test_graph_cl_models(zoo_setup, tmp_path):
    """SGL/NCL/SimGCL run end-to-end as registered models (VERDICT r1 #7):
    SASRec backbone + graph-CL aux objective on the transition graph."""
    root, cfg = zoo_setup
    common = {"graph": "new", "gnn_layer": 2, "window": 2,
              "ssl_weight": 0.1, "ssl_temperature": 0.2}
    _run_model(root, cfg, "SGL", {**common, "ssl_ratio": 0.1}, str(tmp_path))
    _run_model(root, cfg, "SimGCL", {**common, "noise_eps": 0.1}, str(tmp_path))
    trainer, _ = _run_model(
        root, cfg, "NCL",
        {**common, "hyper_layers": 1, "num_clusters": 8, "proto_weight": 0.1},
        str(tmp_path),
    )
    assert "proto_centroids" in trainer.batch_extras  # per-epoch E-step ran


def test_iclrec(zoo_setup, tmp_path):
    root, cfg = zoo_setup
    trainer, _ = _run_model(
        root, cfg, "ICLRec",
        {"augment_type": "item_random", "temperature": 1.0,
         "instance_weight": 0.1, "intent_weight": 0.1,
         "num_intent_clusters": 8},
        str(tmp_path),
    )
    assert "intent_centroids" in trainer.batch_extras
    # mask-token row exists like CL4SRec
    table = trainer.state.params["item_embedding"]["embedding"]
    assert table.shape[0] == trainer.num_items + 1


def test_gru4rec(zoo_setup, tmp_path):
    root, cfg = zoo_setup
    _run_model(root, cfg, "GRU4Rec",
               {"hidden_size": 32, "layer_num": 2, "dropout_rate": 0.2},
               str(tmp_path))


def test_fmlp(zoo_setup, tmp_path):
    root, cfg = zoo_setup
    trainer, _ = _run_model(root, cfg, "FMLP",
                            {"layer_num": 2, "dropout_rate": 0.5}, str(tmp_path))
    assert trainer.pre_padding  # FMLP batches are pre-padded


def test_cl4srec(zoo_setup, tmp_path):
    root, cfg = zoo_setup
    trainer, _ = _run_model(
        root, cfg, "CL4SRec",
        {"augment_type": "item_random", "temperature": 1.0, "cl_weight": 0.1,
         "tau": 0.2, "gamma": 0.7, "beta": 0.2},
        str(tmp_path),
    )
    # mask-token row exists: table has num_items + 1 rows
    table = trainer.state.params["item_embedding"]["embedding"]
    assert table.shape[0] == trainer.num_items + 1


def test_cl4srec2_uses_original_aug(zoo_setup, tmp_path):
    root, cfg = zoo_setup
    cfg = copy.deepcopy(cfg)
    cfg["data"]["train_file"] = "_ori"
    trainer, _ = _run_model(
        root, cfg, "CL4SRec2",
        {"augment_type": "item_crop", "temperature": 1.0, "cl_weight": 0.1,
         "tau": 0.2, "gamma": 0.7, "beta": 0.2},
        str(tmp_path),
    )
    assert trainer.aug_from_original


def test_gnn(zoo_setup, tmp_path):
    root, cfg = zoo_setup
    trainer, _ = _run_model(
        root, cfg, "GNN",
        {"graph": "new", "gnn_layer": 2, "window": 2}, str(tmp_path),
    )
    assert "edge_row" in trainer.batch_extras
    assert len(trainer.batch_extras["edge_row"]) > 0


def test_gnn_old_graph(zoo_setup, tmp_path):
    root, cfg = zoo_setup
    _run_model(root, cfg, "GNN", {"graph": "old", "gnn_layer": 1, "window": 2},
               str(tmp_path))


def test_fmlp_prefix_expansion(zoo_setup, tmp_path):
    """FMLP trains on per-prefix rows (reference dataset_transform cell 3)."""
    import jax

    root, cfg = zoo_setup
    cfg = copy.deepcopy(cfg)
    cfg["model"]["model"] = "FMLP"
    cfg["model"].update({"layer_num": 1, "dropout_rate": 0.5})
    cfg["train"]["epochs"] = 1
    cfg["train"]["batch_size"] = 32
    datasets = prepare_datasets(cfg, root=root)
    n_orig = len(datasets[0])
    total_positions = int(datasets[0].rows().seqlen.sum())
    trainer = make_trainer(cfg, datasets, workdir=str(tmp_path))
    assert trainer.prefix_training
    rows = trainer.train_data.rows()
    assert len(rows) == total_positions > n_orig
    assert rows.item_id.ndim == 1  # single target per prefix row
    # prefixes are pre-padded: zeros in front, content at the end
    L = rows.max_seq_len
    i = int(np.argmax(rows.seqlen))  # a longer row
    n = int(rows.seqlen[i])
    assert (rows.in_item_id[i][: L - n] == 0).all()
    assert (rows.in_item_id[i][L - n :] != 0).all()
    trainer.fit()
    out = trainer.evaluate()
    assert 0.0 <= out["ndcg@20"] <= 1.0

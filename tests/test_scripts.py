"""Unit tests for the experiment-orchestration scripts (winner selection and
summary generation drive multi-hour TPU chains, so their parsing must be
regression-tested)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_meta_confirm_winner_overrides(tmp_path):
    mc = _load("meta_confirm_r2")
    sweep = {
        "MetaModel/amazon-toys_regen[model.sub_model=SASRec]": {
            "metrics": {"val_best": 0.040}
        },
        "MetaModel/amazon-toys_regen[model.sub_model=SASRec,train.inner_loss_scale=mean,train.seed=7]": {
            "metrics": {"val_best": 0.050}
        },
        "MetaModel/amazon-toys_regen[model.sub_model=SASRec,train.interval=10]": {
            "error": "exit 1"
        },
    }
    p = tmp_path / "sweep.json"
    p.write_text(json.dumps(sweep))
    ov, val = mc.winner_overrides(str(p))
    # picks the max-val trial, with train.seed stripped so it can be re-run
    # at other seeds
    assert ov == "model.sub_model=SASRec,train.inner_loss_scale=mean"
    assert val == 0.050


def test_meta_confirm_summarize(tmp_path, monkeypatch):
    mc = _load("meta_confirm_r2")
    monkeypatch.setattr(mc, "REPO", str(tmp_path))
    winner = "model.sub_model=SASRec,train.inner_loss_scale=mean"
    sweep = {
        # the winner at default seed 2023 (from the sweep itself)
        f"MetaModel/amazon-toys_regen[{winner}]": {
            "metrics": {"val_best": 0.050, "ndcg@20": 0.046}
        },
        # a non-winner config must NOT appear in the table
        "MetaModel/amazon-toys_regen[model.sub_model=SASRec]": {
            "metrics": {"val_best": 0.040, "ndcg@20": 0.040}
        },
    }
    confirm = {
        f"MetaModel/amazon-toys_regen[{winner},train.seed=7]": {
            "metrics": {"ndcg@20": 0.0441}
        },
        f"MetaModel/yelp_regen[{winner}]": {
            "metrics": {"ndcg@20": 0.0220}
        },
    }
    plain = {
        "SASRec/amazon-toys_regen[train.seed=2023]": {
            "metrics": {"ndcg@20": 0.0445}
        },
        "SASRec/amazon-toys_regen[train.seed=7]": {
            "metrics": {"ndcg@20": 0.0443}
        },
        "SASRec/yelp_regen[train.seed=2023]": {
            "metrics": {"ndcg@20": 0.0212}
        },
    }
    (tmp_path / "sweep.json").write_text(json.dumps(sweep))
    (tmp_path / "confirm.json").write_text(json.dumps(confirm))
    (tmp_path / "results_confirm_r2.json").write_text(json.dumps(plain))

    mc.summarize("sweep.json", "confirm.json", winner)
    out = (tmp_path / "RESULTS_R2_META_CONFIRM.md").read_text()
    # toys@2023: 0.046 > 0.0445 win; toys@7: 0.0441 < 0.0443 loss;
    # yelp@2023: 0.0220 > 0.0212 win
    assert "MetaModel wins 2/3" in out
    assert "| amazon-toys | 2023 | 0.0445 | 0.0460 | +0.0015 |" in out
    assert "0.0400" not in out  # non-winner config excluded


def test_confirm_best_trial_uses_multi_seed_mean(tmp_path):
    cf = _load("confirm_r2")
    res = {
        # single-seed flash in the pan: high once
        "trial_a": {"metrics": {"val_best": 0.050}},
        # two-seed consistent winner: mean 0.049 > would lose to a on argmax,
        # but multi-seed mean must also beat a's single 0.050? No: a's mean is
        # 0.050. Use a seed pair that drags a down instead.
        "trial_a_s7": {"metrics": {"val_best": 0.040}},  # a mean = 0.045
        "trial_b": {"metrics": {"val_best": 0.048}},
        "trial_b_s7": {"metrics": {"val_best": 0.049}},  # b mean = 0.0485
    }
    p = tmp_path / "res.json"
    p.write_text(json.dumps(res))
    name, rec = cf.best_trial(str(p))
    assert name == "trial_b"
    # representative record is the best seed of the winning group
    assert rec["metrics"]["val_best"] == 0.049


def test_run_suite_transient_backend_matcher():
    rs = _load("run_suite")
    wedge = {"error": "exit 1",
             "tail": "RuntimeError: Unable to initialize backend 'axon': "
                     "UNAVAILABLE: TPU backend setup/compile error"}
    assert rs.transient_backend_failure(wedge)
    assert not rs.transient_backend_failure(
        {"error": "exit 1", "tail": "ValueError: bad config"})
    assert not rs.transient_backend_failure({"metrics": {"ndcg@20": 0.1}})


def test_r3_matrix_job_generation():
    """Every stage emits well-formed Model:dataset:file:overrides jobs with
    seeds pinned; regen files must reference real per-dataset winners."""
    r3 = _load("r3_matrix")
    all_jobs = []
    for stage in (1, 2, 3, 4, 5):
        all_jobs += r3.stage_jobs(stage)
    assert len(all_jobs) == 16 + 8 + 8 + 24 + 3
    for job in all_jobs:
        parts = job.split(":", 3)
        assert len(parts) == 4
        model, ds, tf, ov = parts
        assert model in ("SASRec", "MetaModel", "FMLP", "CL4SRec", "GRU4Rec")
        assert ds in r3.REGEN_FILE or ds in ("amazon-toys", "yelp")
        assert tf == "" or tf == r3.REGEN_FILE[ds]
        assert "train.seed=" in ov
        if model == "MetaModel":
            assert "model.sub_model=SASRec" in ov
    # resumable keys must be distinct
    keys = set()
    for job in all_jobs:
        model, ds, tf, ov = job.split(":", 3)
        keys.add(f"{model}/{ds}{tf or '_base'}[{ov}]")
    assert len(keys) == len(all_jobs)


def test_summarize_r3_tables(tmp_path):
    """Paired-Δ math and CI formatting over a fabricated results file."""
    sm = _load("summarize_r3")
    mean, sd, half = sm.paired_stats([0.001, 0.002, 0.003, 0.002])
    assert abs(mean - 0.002) < 1e-12
    assert half is not None and half > 0
    p = sm.parse_key(
        "SASRec/amazon-beauty_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3[train.seed=42]")
    assert p == ("SASRec", "amazon-beauty",
                 "_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3", 42, "")
    p = sm.parse_key("SASRec/amazon-toys_base[train.seed=7]")
    assert p == ("SASRec", "amazon-toys", "_base", 7, "")


def test_chunk_output_roundtrip():
    """run_chunk's RESULT protocol parses back through run_suite, including
    interleaved logging noise and a malformed line."""
    rs = _load("run_suite")
    rc = _load("run_chunk")
    key = rc.job_key("SASRec", "amazon-toys", "", "train.seed=7")
    assert key == "SASRec/amazon-toys_base[train.seed=7]"
    stdout = "\n".join([
        "[12:00:00] INFO epoch 3: ndcg@20=0.01",
        f"RESULT\t{key}\t" + json.dumps({"metrics": {"ndcg@20": 0.04}}),
        "RESULT\tbroken-line-without-json",
        "RESULT\tMetaModel/yelp_regen[a=1]\t" + json.dumps({"error": "timeout"}),
    ])
    records = rs.parse_chunk_output(stdout)
    assert records[key]["metrics"]["ndcg@20"] == 0.04
    assert records["MetaModel/yelp_regen[a=1]"]["error"] == "timeout"
    assert len(records) == 2
    assert rs.parse_chunk_output(None) == {}


def test_chunk_config_matches_run_py_semantics():
    """run_chunk.build_config must mirror run.py: train_file override,
    typed --set values, and the _cli_overrides record for MetaModel."""
    rc = _load("run_chunk")
    cfg = rc.build_config(
        "SASRec", "amazon-toys", "_regen", 150,
        "train.seed=7,model.dropout_rate=0.2",
    )
    assert cfg["data"]["train_file"] == "_regen"
    assert cfg["train"]["epochs"] == 150
    assert cfg["train"]["seed"] == 7
    assert cfg["model"]["dropout_rate"] == 0.2  # yaml-typed, not str
    assert cfg["_cli_overrides"]["train"]["seed"] == 7

import os

from dr4sr_tpu.config import flatten_config, load_config, unflatten_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def test_three_layer_merge():
    cfg = load_config("SASRec", "amazon-toys", config_dir=CONFIG_DIR)
    assert cfg["data"]["dataset"] == "amazon-toys"
    assert cfg["data"]["domain_name_list"] == ["toy"]
    assert cfg["data"]["max_seq_len"] == 50
    # basemodel layer
    assert cfg["train"]["batch_size"] == 256
    assert cfg["eval"]["topk"] == 100
    assert cfg["model"]["embed_dim"] == 64
    # model layer overrides/extends
    assert cfg["model"]["hidden_size"] == 128
    assert cfg["model"]["model"] == "SASRec"


def test_model_layer_updates_sections():
    cfg = load_config("GRU4Rec", "amazon-beauty", config_dir=CONFIG_DIR)
    assert cfg["model"]["hidden_size"] == 256
    assert cfg["train"]["weight_decay"] == 0.0001
    # untouched base keys survive
    assert cfg["train"]["batch_size"] == 256


def test_flatten_roundtrip():
    cfg = load_config("SASRec", "yelp", config_dir=CONFIG_DIR)
    flat = flatten_config(cfg)
    assert flat["model.hidden_size"] == 128
    back = unflatten_config(flat)
    assert back["model"]["hidden_size"] == 128
    assert back["data"]["dataset"] == "yelp"


def test_overrides():
    cfg = load_config(
        "SASRec", "amazon-toys", config_dir=CONFIG_DIR,
        overrides={"train": {"epochs": 3}},
    )
    assert cfg["train"]["epochs"] == 3


def test_random_sweep_draws(monkeypatch):
    """tune(method='random') draws `samples` combos from the grid and selects
    on the validation monitor (VERDICT r1 weak-#8: wandb random-search
    parity)."""
    from dr4sr_tpu import quickstart

    seen = []

    def fake_run(cfg, root=None):
        seen.append((cfg["train"]["learning_rate"], cfg["model"]["embed_dim"]))
        return {"val_best": cfg["model"]["embed_dim"] * 1.0}

    monkeypatch.setattr(quickstart, "run", fake_run)
    cfg = {"train": {"learning_rate": 0}, "model": {"embed_dim": 0}}
    sweep = {"train.learning_rate": [1e-3, 1e-2],
             "model.embed_dim": [16, 32, 64]}
    best, results = quickstart.tune(cfg, sweep, method="random", samples=5,
                                    seed=3)
    assert len(results) == 5 and len(seen) == 5
    for lr, d in seen:
        assert lr in (1e-3, 1e-2) and d in (16, 32, 64)
    assert best["metrics"]["val_best"] == max(r["metrics"]["val_best"]
                                              for r in results)


def test_bayes_sweep_converges_to_good_region(monkeypatch):
    """tune(method='bayes') — the TPE-style discrete search spends its
    post-warmup budget mostly in the high-scoring region and never repeats a
    combo while unseen ones remain (reference tune.py's wandb `bayes` mode)."""
    from dr4sr_tpu import quickstart

    seen = []

    def fake_run(cfg, root=None):
        lr, d = cfg["train"]["learning_rate"], cfg["model"]["embed_dim"]
        seen.append((lr, d))
        # embed_dim=64 is the sharply-better region
        return {"val_best": (1.0 if d == 64 else 0.1) + lr}

    monkeypatch.setattr(quickstart, "run", fake_run)
    cfg = {"train": {"learning_rate": 0}, "model": {"embed_dim": 0}}
    sweep = {"train.learning_rate": [1e-4, 1e-3, 1e-2],
             "model.embed_dim": [16, 32, 48, 64, 96, 128]}
    best, results = quickstart.tune(cfg, sweep, method="bayes", samples=9,
                                    seed=0)
    assert len(results) == 9
    assert len(set(seen)) == len(seen)  # no repeats while unseen combos exist
    assert best["params"]["model.embed_dim"] == 64
    # post-warmup proposals visit the sharply-better d=64 column far more
    # often than uniform sampling would (3/18 of the space)
    post = [d for _, d in seen[3:]]
    assert sum(d == 64 for d in post) >= 2


def test_bayes_warmup_never_repeats_a_combo(monkeypatch):
    """Warmup draws are without replacement: on a tiny grid a duplicate draw
    would burn a full training run re-measuring a point TPE already has
    (pre-fix this failed for roughly half of all seeds on a 2-combo grid)."""
    from dr4sr_tpu import quickstart

    for seed in range(12):
        seen = []

        def fake_run(cfg, root=None):
            seen.append(cfg["train"]["learning_rate"])
            return {"val_best": cfg["train"]["learning_rate"]}

        monkeypatch.setattr(quickstart, "run", fake_run)
        cfg = {"train": {"learning_rate": 0}}
        sweep = {"train.learning_rate": [1e-3, 1e-2]}
        quickstart.tune(cfg, sweep, method="bayes", samples=2, seed=seed)
        assert len(seen) == 2 and len(set(seen)) == 2, f"seed {seed}: {seen}"

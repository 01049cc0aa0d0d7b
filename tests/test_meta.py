"""Bilevel machinery: hypergradient vs closed form; MetaTrainer smoke."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr4sr_tpu.meta.hypergrad import clip_by_global_norm, hypergradient


def test_hypergradient_matches_closed_form(rng):
    """Quadratic inner problem: L_train(w, φ) = ½wᵀAw − φᵀw, so
    ∇_w = Aw − φ, H = A, and the reference iteration gives
    hyper_grad = Σ_{i=0..k} (I − lr·A)^i · ∇_w L_val  (positive sign)."""
    d = 5
    m = rng.normal(size=(d, d))
    a = m @ m.T / d + np.eye(d)  # SPD
    w0 = rng.normal(size=d)
    phi0 = rng.normal(size=d)
    b = rng.normal(size=d)
    lr, k = 0.05, 3

    train_loss = lambda w, phi: 0.5 * w @ jnp.asarray(a) @ w - phi @ w
    val_loss = lambda w: jnp.asarray(b) @ w  # ∇_w L_val = b

    hg = hypergradient(train_loss, val_loss, jnp.asarray(w0), jnp.asarray(phi0),
                       lr=lr, truncate_iter=k)

    # closed form: p = Σ_{i=0}^{k} (I − lr A)^i b; hyper = −d/dφ⟨Aw−φ, p⟩ = p
    ima = np.eye(d) - lr * a
    p = b.copy()
    v = b.copy()
    for _ in range(k):
        v = ima @ v
        p = p + v
    np.testing.assert_allclose(np.asarray(hg), p, rtol=1e-5)


def test_clip_by_global_norm():
    tree = {"a": jnp.ones(4) * 10, "b": jnp.ones(2) * 10}
    clipped = clip_by_global_norm(tree, 1.0)
    total = np.sqrt(sum(float(jnp.sum(x * x)) for x in jax.tree_util.tree_leaves(clipped)))
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)
    small = {"a": jnp.ones(2) * 0.1}
    out = clip_by_global_norm(small, 1.0)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, rtol=1e-6)


@pytest.fixture(scope="module")
def meta_setup(tmp_path_factory):
    from dr4sr_tpu.data.dataset import prepare_datasets
    from dr4sr_tpu.data.synthetic import synthetic_config, write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("meta_data"))
    write_synthetic_dataset(root, num_users=150, num_items=60, seed=2)
    cfg = synthetic_config()
    datasets = prepare_datasets(cfg, root=root)
    return cfg, datasets


def test_meta_trainer_runs_and_updates_meta(meta_setup, tmp_path):
    from dr4sr_tpu.train.meta_trainer import MetaTrainer

    base_cfg, datasets = meta_setup
    cfg = copy.deepcopy(base_cfg)
    cfg["model"]["model"] = "MetaModel"
    cfg["model"]["sub_model"] = "SASRec"
    cfg["model"]["tau_min"] = 1.0
    cfg["train"].update(
        epochs=2, warmup_epoch=0, interval=3,
        meta_optimizer="sgd", meta_learning_rate=1e-2,
        hpo_learning_rate=1e-3, meta_weight_decay=0.0,
    )

    # MetaTrainer loads the sub-model config from the repo configs dir
    import os

    config_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
    )
    trainer = MetaTrainer(cfg, datasets, workdir=str(tmp_path), config_dir=config_dir)
    # sub-model picked up the sasrec yaml but kept the synthetic data section
    assert trainer.config["model"]["model"] == "SASRec"
    assert trainer.config["data"]["dataset"] == "synthetic"

    trainer.init_state()
    meta_before = jax.device_get(trainer.meta_params)
    loss_warm = trainer.training_epoch(0)  # epoch 0 is still warmup
    # epoch 1 (> warmup_epoch=0) runs weighted steps + outer loop
    loss0 = trainer.training_epoch(1)
    assert np.isfinite(loss_warm) and np.isfinite(loss0)
    assert trainer.step_counter >= 3  # outer step fired at least once
    meta_after = jax.device_get(trainer.meta_params)
    diffs = [
        float(np.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(meta_before),
            jax.tree_util.tree_leaves(meta_after),
        )
    ]
    assert max(diffs) > 0, "outer loop did not update meta params"


def test_weighted_loss_masks(meta_setup, tmp_path):
    """Pattern rows (user 0) get weight 1; padded positions weight 0 — so a
    batch of only pattern rows reproduces the unweighted summed loss."""
    import os

    from dr4sr_tpu.train.meta_trainer import MetaTrainer

    base_cfg, datasets = meta_setup
    cfg = copy.deepcopy(base_cfg)
    cfg["model"]["model"] = "MetaModel"
    cfg["model"]["sub_model"] = "SASRec"
    cfg["train"].update(warmup_epoch=0, interval=3, meta_optimizer="sgd",
                        meta_learning_rate=1e-2, hpo_learning_rate=1e-3)
    config_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
    )
    trainer = MetaTrainer(cfg, datasets, workdir=str(tmp_path), config_dir=config_dir)
    trainer.init_state()

    batch = trainer.train_data.get_loader(batch_size=8, shuffle=False).sample_batch(8)
    batch["user_id"] = np.zeros_like(batch["user_id"])  # all pattern rows
    dbatch = trainer._device_batch(batch)
    rng = jax.random.PRNGKey(0)
    w_loss = trainer._weighted_loss(trainer.state.params, trainer.meta_params,
                                    dbatch, rng)
    rng_loss, _ = jax.random.split(rng)
    ref_ps = trainer.rec.training_loss(
        {"params": trainer.state.params}, dbatch, rng_loss, reduce=False
    )
    np.testing.assert_allclose(float(w_loss), float(jnp.sum(ref_ps)), rtol=1e-5)


def test_cli_overrides_reach_sub_model_config(meta_setup, tmp_path):
    """run.py stashes explicit CLI overrides in ``_cli_overrides``; the
    MetaTrainer must re-apply them to its freshly-loaded sub-model config —
    otherwise ``--set train.seed=7`` changes only the meta loop and the inner
    training is bit-identical across seeds (round-2 regression)."""
    import copy as _copy
    import os

    from dr4sr_tpu.train.meta_trainer import MetaTrainer

    base_cfg, datasets = meta_setup
    cfg = _copy.deepcopy(base_cfg)
    cfg["model"]["model"] = "MetaModel"
    cfg["model"]["sub_model"] = "SASRec"
    cfg["train"]["seed"] = 7
    cfg["_cli_overrides"] = {"train": {"seed": 7, "epochs": 5}}

    config_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
    )
    trainer = MetaTrainer(cfg, datasets, workdir=str(tmp_path),
                          config_dir=config_dir)
    assert trainer.config["train"]["seed"] == 7
    assert trainer.config["train"]["epochs"] == 5
    # sub-model YAML hyperparameters not overridden on the CLI keep their own
    # values (sasrec yaml / basemodel defaults)
    assert trainer.config["train"]["learning_rate"] == 0.001

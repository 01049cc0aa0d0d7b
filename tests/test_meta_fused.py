"""MetaTrainer fused dispatch (``train.steps_per_dispatch`` in the bilevel
loop; VERDICT r4 next-#3).

Contract: with groups of weighted inner steps scanned on device and bounded
by the ``interval`` boundary, the fused path consumes the SAME host-side rng
split sequence and fires the SAME outer steps as the per-step loop — so
sub-model params AND meta params are bit-identical at fixed seed, through
both the warmup and the weighted phase.
"""

import copy
import os

import jax
import numpy as np
import pytest

from dr4sr_tpu.data.dataset import prepare_datasets

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
)


@pytest.fixture(scope="module")
def meta_setup(tmp_path_factory):
    from dr4sr_tpu.data.synthetic import synthetic_config, write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("meta_fused_data"))
    write_synthetic_dataset(root, num_users=200, num_items=60, seed=5)
    cfg = synthetic_config()
    cfg["model"]["model"] = "MetaModel"
    cfg["model"]["sub_model"] = "SASRec"
    cfg["model"]["tau_min"] = 1.0
    cfg["model"]["dropout_rate"] = 0.1  # exercise per-step rng parity
    cfg["train"].update(
        warmup_epoch=0, interval=3,
        meta_optimizer="sgd", meta_learning_rate=1e-2,
        hpo_learning_rate=1e-3, meta_weight_decay=0.0,
    )
    return cfg, root


def _run_epochs(cfg, root, epochs, spd):
    from dr4sr_tpu.train.meta_trainer import MetaTrainer

    cfg = copy.deepcopy(cfg)
    datasets = prepare_datasets(cfg, root=root)
    tr = MetaTrainer(cfg, datasets, config_dir=CONFIG_DIR)
    tr.config["train"]["steps_per_dispatch"] = spd
    tr.init_state()
    losses = [tr.training_epoch(e) for e in range(epochs)]
    return tr, losses


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(jax.device_get(a))
    lb = jax.tree_util.tree_leaves(jax.device_get(b))
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_meta_fused_bitwise_parity(meta_setup):
    """Fused ≡ per-step through warmup epoch 0 + weighted epochs 1-2, with
    spd=4 NOT dividing interval=3 so groups are boundary-clipped."""
    cfg, root = meta_setup
    single, l1 = _run_epochs(cfg, root, epochs=3, spd=1)
    fused, l2 = _run_epochs(cfg, root, epochs=3, spd=4)
    assert single.step_counter == fused.step_counter
    assert int(single.state.step) == int(fused.state.step)
    _assert_tree_equal(single.state.params, fused.state.params)
    _assert_tree_equal(single.meta_params, fused.meta_params)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_meta_trainer_mesh_parity(meta_setup):
    """MetaTrainer under a 2-device data mesh reproduces the single-device
    run: sub-model params AND meta params (the hypergradient jvp-of-grad
    program is the most fragile path under sharding; VERDICT r4 next-#5)."""
    from dr4sr_tpu.parallel.mesh import MeshPlan, create_mesh
    from dr4sr_tpu.train.meta_trainer import MetaTrainer

    cfg, root = meta_setup

    def run(mesh_plan):
        c = copy.deepcopy(cfg)
        c["model"]["dropout_rate"] = 0.0  # determinism across shardings
        datasets = prepare_datasets(c, root=root)
        tr = MetaTrainer(c, datasets, mesh_plan=mesh_plan,
                         config_dir=CONFIG_DIR)
        tr.config["model"]["dropout_rate"] = 0.0
        tr.init_state()
        [tr.training_epoch(e) for e in range(2)]
        return tr

    single = run(None)
    meshed = run(MeshPlan(mesh=create_mesh(data=2, devices=jax.devices()[:2])))
    assert single.step_counter == meshed.step_counter
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(single.meta_params)),
                    jax.tree_util.tree_leaves(jax.device_get(meshed.meta_params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(single.state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(meshed.state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_meta_rejects_context_parallel(meta_setup):
    """Bilevel + CP is rejected up front (ADVICE r4 low-#2): HVPs are
    forward-mode, the ring-attention path is reverse-mode only."""
    from dr4sr_tpu.train.meta_trainer import MetaTrainer

    cfg, root = meta_setup
    cfg = copy.deepcopy(cfg)
    cfg["_cli_overrides"] = {"model": {"context_parallel": 2}}
    datasets = prepare_datasets(cfg, root=root)
    with pytest.raises(ValueError, match="context_parallel"):
        MetaTrainer(cfg, datasets, config_dir=CONFIG_DIR)


def test_meta_fused_interval_boundary_groups(meta_setup):
    """No scan group may cross an interval boundary: after every fused
    epoch the number of outer steps taken equals the per-step loop's
    count (meta opt state trace must match too)."""
    cfg, root = meta_setup
    single, _ = _run_epochs(cfg, root, epochs=2, spd=1)
    fused, _ = _run_epochs(cfg, root, epochs=2, spd=5)
    _assert_tree_equal(single.meta_opt_state, fused.meta_opt_state)

"""Device-resident multi-step dispatch (``train.steps_per_dispatch``).

VERDICT r3 next-#3: at small batch sizes a single train step is ~90% fixed
per-dispatch overhead over the remote TPU tunnel; running N optimizer steps
inside one jitted ``lax.scan`` with donated state amortizes it WITHOUT
changing the training recipe. The contract tested here: the fused path is
bit-wise identical to N single steps at fixed rng (the host pre-splits the
same per-step keys the single-step path would consume).
"""

import copy

import jax
import numpy as np
import pytest

from dr4sr_tpu.data.dataset import prepare_datasets
from dr4sr_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    from dr4sr_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("data_fused"))
    write_synthetic_dataset(root, num_users=300, num_items=80, seed=3)
    return root


@pytest.fixture(scope="module")
def base_config():
    from dr4sr_tpu.data.synthetic import synthetic_config

    cfg = synthetic_config()
    cfg["train"]["epochs"] = 2
    cfg["model"]["dropout_rate"] = 0.1  # exercise per-step rng parity
    return cfg


def _params_after_epochs(cfg, root, epochs=2, mesh_plan=None):
    datasets = prepare_datasets(cfg, root=root)
    tr = Trainer(copy.deepcopy(cfg), datasets, mesh_plan=mesh_plan)
    tr.init_state()
    losses = [tr.training_epoch(e) for e in range(epochs)]
    return tr, losses


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(jax.device_get(a))
    lb = jax.tree_util.tree_leaves(jax.device_get(b))
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_bitwise_parity(base_config, synthetic_root):
    """N-step fused ≡ N single steps: params, opt step count, epoch loss."""
    single, l1 = _params_after_epochs(
        copy.deepcopy(base_config), synthetic_root
    )
    cfg = copy.deepcopy(base_config)
    cfg["train"]["steps_per_dispatch"] = 4
    fused, l2 = _params_after_epochs(cfg, synthetic_root)
    assert int(single.state.step) == int(fused.state.step)
    _assert_tree_equal(single.state.params, fused.state.params)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_fused_leftover_group(base_config, synthetic_root):
    """steps_per_dispatch that does NOT divide the epoch's batch count: the
    remainder group (including a possible singleton) must still run."""
    datasets = prepare_datasets(copy.deepcopy(base_config), root=synthetic_root)
    n_batches = len(datasets[0].get_loader())
    cfg = copy.deepcopy(base_config)
    # pick spd so the last group is a singleton when possible
    spd = n_batches - 1 if n_batches > 2 else 2
    cfg["train"]["steps_per_dispatch"] = spd
    fused, _ = _params_after_epochs(cfg, synthetic_root, epochs=1)
    single, _ = _params_after_epochs(
        copy.deepcopy(base_config), synthetic_root, epochs=1
    )
    assert int(single.state.step) == int(fused.state.step) == n_batches
    _assert_tree_equal(single.state.params, fused.state.params)


def test_fused_whole_epoch_one_dispatch(base_config, synthetic_root):
    """spd >= batches/epoch = the whole epoch in ONE dispatch."""
    cfg = copy.deepcopy(base_config)
    cfg["train"]["steps_per_dispatch"] = 10_000
    fused, _ = _params_after_epochs(cfg, synthetic_root, epochs=1)
    single, _ = _params_after_epochs(
        copy.deepcopy(base_config), synthetic_root, epochs=1
    )
    _assert_tree_equal(single.state.params, fused.state.params)


def test_fused_on_data_mesh(base_config, synthetic_root):
    """Fused dispatch under a DP mesh: the [steps, batch, ...] stack shards
    its batch axis over 'data' and still matches the single-step mesh path."""
    from dr4sr_tpu.parallel.mesh import MeshPlan, create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    plan_a = MeshPlan(mesh=create_mesh(data=8), shard_embedding=False)
    single, _ = _params_after_epochs(
        copy.deepcopy(base_config), synthetic_root, epochs=1, mesh_plan=plan_a
    )
    cfg = copy.deepcopy(base_config)
    cfg["train"]["steps_per_dispatch"] = 4
    plan_b = MeshPlan(mesh=create_mesh(data=8), shard_embedding=False)
    fused, _ = _params_after_epochs(
        cfg, synthetic_root, epochs=1, mesh_plan=plan_b
    )
    _assert_tree_equal(single.state.params, fused.state.params)


def test_fused_fit_end_to_end(base_config, synthetic_root, tmp_path):
    """fit() with steps_per_dispatch>1 trains to the usual quality band."""
    cfg = copy.deepcopy(base_config)
    cfg["train"]["epochs"] = 3
    cfg["train"]["steps_per_dispatch"] = 8
    datasets = prepare_datasets(cfg, root=synthetic_root)
    tr = Trainer(cfg, datasets, workdir=str(tmp_path))
    tr.fit()
    assert tr.logged_metrics["train_loss"] < 1.4
    assert tr.logged_metrics["recall@20"] > 0.3

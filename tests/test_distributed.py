"""SPMD parity on a virtual 8-device CPU mesh: data-parallel training equals
single-device; row-sharded embedding eval equals replicated."""

import copy

import jax
import numpy as np
import pytest

from dr4sr_tpu.data.dataset import prepare_datasets
from dr4sr_tpu.parallel.mesh import MeshPlan, create_mesh, shard_params
from dr4sr_tpu.train.trainer import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def dist_setup(tmp_path_factory):
    from dr4sr_tpu.data.synthetic import synthetic_config, write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("dist"))
    write_synthetic_dataset(root, num_users=160, num_items=64, seed=5)
    cfg = synthetic_config()
    cfg["model"]["dropout_rate"] = 0.0  # determinism across shardings
    cfg["train"]["batch_size"] = 64
    cfg["eval"]["topk"] = 20
    return root, cfg


def _make_trainers(root, cfg):
    datasets_a = prepare_datasets(cfg, root=root)
    datasets_b = prepare_datasets(cfg, root=root)
    single = Trainer(copy.deepcopy(cfg), datasets_a)
    plan = MeshPlan(mesh=create_mesh(data=8), shard_embedding=False)
    multi = Trainer(copy.deepcopy(cfg), datasets_b, mesh_plan=plan)
    single.init_state(seed=7)
    multi.init_state(seed=7)
    return single, multi


def test_dp_training_parity(dist_setup):
    root, cfg = dist_setup
    single, multi = _make_trainers(root, cfg)

    batch = single.train_data.get_loader(batch_size=64, shuffle=False).sample_batch(64)
    rng = jax.random.PRNGKey(3)
    sb = single._device_batch(batch)
    mb = multi._device_batch(batch)
    s_state, s_loss = single.train_step(single.state, sb, rng)
    m_state, m_loss = multi.train_step(multi.state, mb, rng)
    np.testing.assert_allclose(float(s_loss), float(m_loss), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_state.params)),
        jax.tree_util.tree_leaves(jax.device_get(m_state.params)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_embedding_eval_parity(dist_setup):
    root, cfg = dist_setup
    datasets = prepare_datasets(cfg, root=root)
    trainer = Trainer(copy.deepcopy(cfg), datasets)
    trainer.init_state(seed=9)

    plan = MeshPlan(mesh=create_mesh(data=4, model=2), shard_embedding=True)
    sharded_params = shard_params(jax.device_get(trainer.state.params), plan)

    import jax.numpy as jnp

    keep = jnp.asarray(trainer.val_data.domain_item_mask("syn"))
    batch = trainer.val_data.get_loader(batch_size=32).sample_batch(32)
    db = trainer._device_batch(batch)
    s1 = trainer.eval_step(trainer.state.params, db, keep)
    db2 = {k: jax.device_put(np.asarray(v)) for k, v in db.items()}
    s2 = trainer.eval_step(sharded_params, db2, keep)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]), atol=1e-5)


def _collective_bytes(hlo_text):
    """Sum output bytes of collective ops in compiled HLO (comm audit)."""
    import re

    total = 0
    per_op = {}
    # compiled HLO lines read `%name = f32[512,64]{1,0} all-gather(...)`:
    # result shape follows `=`, opcode follows the shape/layout
    for m in re.finditer(
        r"= (\w+)\[([\d,]*)\]\S* (all-gather|all-reduce|all-to-all|"
        r"collective-permute|reduce-scatter)\(", hlo_text
    ):
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        nbytes = n * 4
        total += nbytes
        per_op.setdefault(m.group(3), []).append((dims, nbytes))
    return total, per_op


def test_ep_training_parity_and_no_table_allgather(dist_setup):
    """VERDICT r1 #4: training with a row-sharded item table must (a) match
    single-device training numerically, and (b) compile to HLO with NO
    full-table all-gather — the explicit shard_map psum-gather moves only
    the per-id embeddings."""
    from dr4sr_tpu.data.synthetic import synthetic_config, write_synthetic_dataset

    import tempfile

    with tempfile.TemporaryDirectory() as root:
        # odd catalog exercises the EP row padding (61 -> 62 over model=2)
        write_synthetic_dataset(root, num_users=120, num_items=61, seed=6)
        cfg = synthetic_config()
        cfg["model"]["dropout_rate"] = 0.0
        cfg["train"]["batch_size"] = 32

        single = Trainer(copy.deepcopy(cfg), prepare_datasets(cfg, root=root))
        plan = MeshPlan(mesh=create_mesh(data=4, model=2), shard_embedding=True)
        multi = Trainer(copy.deepcopy(cfg), prepare_datasets(cfg, root=root),
                        mesh_plan=plan)
        single.init_state(seed=7)
        multi.init_state(seed=7)

        table_s = single.state.params["item_embedding"]["embedding"]
        table_m = multi.state.params["item_embedding"]["embedding"]
        assert table_s.shape[0] == 61 and table_m.shape[0] == 62

        batch = single.train_data.get_loader(batch_size=32, shuffle=False).sample_batch(32)
        rng = jax.random.PRNGKey(3)
        sb = single._device_batch(batch)
        mb = multi._device_batch(batch)
        for _ in range(3):
            s_state, s_loss = single.train_step(single.state, sb, rng)
            m_state, m_loss = multi.train_step(multi.state, mb, rng)
            single.state, multi.state = s_state, m_state
        np.testing.assert_allclose(float(s_loss), float(m_loss), rtol=1e-5)
        sp = jax.device_get(single.state.params)
        mp = jax.device_get(multi.state.params)
        np.testing.assert_allclose(
            mp["item_embedding"]["embedding"][:61],
            sp["item_embedding"]["embedding"], atol=1e-5,
        )
        for key in sp:
            if key == "item_embedding":
                continue
            for a, b in zip(jax.tree_util.tree_leaves(sp[key]),
                            jax.tree_util.tree_leaves(mp[key])):
                np.testing.assert_allclose(a, b, atol=1e-5)

        # --- HLO audit: no collective moves anything table-sized -----------
        hlo = (
            multi.train_step._jitted.lower(multi.state, mb, rng)
            .compile().as_text()
        )
        comm_bytes, per_op = _collective_bytes(hlo)
        # structural: no all-gather ever reconstructs the table (dim 62 from
        # 31-row shards). The EP gathers appear as all-reduces of per-id
        # embedding blocks whose size is independent of the catalog.
        for dims, nbytes in per_op.get("all-gather", []):
            assert 62 not in dims, (
                f"full-table all-gather {dims} in EP train step HLO"
            )
        print(f"EP train-step collective bytes/step: {comm_bytes} ({per_op})")


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_decode_parity():
    """Greedy decode with data-sharded lanes equals single-device decode."""
    import jax.numpy as jnp

    from dr4sr_tpu.parallel.mesh import MeshPlan, create_mesh
    from dr4sr_tpu.regen.decode import decode_dataset
    from dr4sr_tpu.regen.generator import Generator

    num_items = 30
    gen = Generator(num_items=num_items, k=2, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    src0 = np.zeros((1, 6), np.int32)
    variables = gen.init(
        {"params": rng, "dropout": rng, "gumbel": rng},
        jnp.asarray(src0), jnp.asarray(src0[:, :-1]),
        jnp.ones(1, np.int32), jnp.asarray(1.0),
    )
    r = np.random.default_rng(0)
    seqs = [list(r.integers(1, num_items, size=r.integers(2, 6))) for _ in range(16)]
    single = decode_dataset(gen, variables, seqs, 2, batch_size=8, max_len=6)
    plan = MeshPlan(mesh=create_mesh(data=8))
    sharded = decode_dataset(gen, variables, seqs, 2, batch_size=8, max_len=6,
                             mesh_plan=plan)
    assert single == sharded


def test_trainer_sharded_eval_matches_replicated(dist_setup):
    """Trainer eval with a row-sharded table (shard_map top-k merge) equals
    the replicated single-device eval."""
    root, cfg = dist_setup
    datasets = prepare_datasets(cfg, root=root)
    plain = Trainer(copy.deepcopy(cfg), datasets)
    plain.init_state(seed=11)

    datasets2 = prepare_datasets(cfg, root=root)
    plan = MeshPlan(mesh=create_mesh(data=4, model=2), shard_embedding=True)
    sharded = Trainer(copy.deepcopy(cfg), datasets2, mesh_plan=plan)
    sharded.init_state(seed=11)
    # identical params (same seed) but placed per plan
    sharded.state = sharded.state.replace(
        params=shard_params(jax.device_get(plain.state.params), plan)
    )

    a = plain._eval_epoch(plain.val_data, "syn", plain.state.params)
    b = sharded._eval_epoch(sharded.val_data, "syn", sharded.state.params)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-5)


def test_two_process_jax_distributed_param_parity():
    """TRUE multi-process test (SURVEY §4; VERDICT r2 next-#6): two OS
    processes join via jax.distributed.initialize on localhost, form a
    2-device global ``data`` mesh (one CPU device each), run real SASRec
    train steps through shard_params/shard_batch/put_global, and must agree
    bit-for-bit with each other and numerically with a single-process run."""
    import json
    import socket
    import subprocess
    import sys

    import tests.mp_worker as mp_worker

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    import tempfile

    ckpt_dir = tempfile.mkdtemp(prefix="mp_ckpt_")
    workers = []
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, mp_worker.__file__,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--ckpt-dir", ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    try:
        for w in workers:
            out, err = w.communicate(timeout=420)
            outs.append((w.returncode, out, err))
    except subprocess.TimeoutExpired:
        for w in workers:
            w.kill()
        pytest.skip("jax.distributed localhost workers timed out on this host")

    results = []
    for rc, out, err in outs:
        if rc != 0 and ("UNIMPLEMENTED" in err or "not supported" in err):
            pytest.skip(f"jax.distributed unsupported here: {err[-200:]}")
        assert rc == 0, f"worker failed: {err[-1500:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))

    assert all(r["num_processes"] == 2 for r in results)
    assert all(r["global_devices"] == 2 for r in results)
    # both controllers saw the identical SPMD program: bit-identical
    assert results[0]["checksum"] == results[1]["checksum"]
    assert results[0]["loss"] == results[1]["loss"]

    # single-process run of the same function (mesh=None) as ground truth
    from dr4sr_tpu.parallel.mesh import MeshPlan

    chk, loss = mp_worker.run_training(MeshPlan(mesh=None))
    np.testing.assert_allclose(results[0]["checksum"], chk, rtol=1e-5)
    np.testing.assert_allclose(results[0]["loss"], loss, rtol=1e-5)

    # single-writer checkpoint rule (VERDICT r4 weak-#6): exactly process 0
    # wrote its best.ckpt; process 1's guard skipped the write — and the
    # written checkpoint resumes (loads back the saved tree)
    by_pid = {r["process_id"]: r for r in results}
    assert by_pid[0]["ckpt_exists"] is True
    assert by_pid[1]["ckpt_exists"] is False
    import os

    from dr4sr_tpu.train.checkpoint import load_checkpoint

    params, meta = load_checkpoint(
        os.path.join(ckpt_dir, "p0", "best.ckpt"),
        {"w": np.zeros(3, np.float32)},
    )
    np.testing.assert_allclose(np.asarray(params["w"]), np.ones(3))
    assert meta["metric"]["ndcg@20"] == 0.5


def test_save_train_state_single_writer(monkeypatch, tmp_path):
    """``save_train_state`` on a non-zero process index is a no-op (the
    reference's unfixed ddp TODO, ``utils/callbacks.py:130``)."""
    import copy
    import os

    from dr4sr_tpu.data.dataset import prepare_datasets
    from dr4sr_tpu.data.synthetic import synthetic_config, write_synthetic_dataset
    from dr4sr_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    write_synthetic_dataset(root, num_users=60, num_items=30, seed=9)
    cfg = synthetic_config()
    datasets = prepare_datasets(copy.deepcopy(cfg), root=root)
    tr = Trainer(cfg, datasets, workdir=str(tmp_path / "w"))
    tr.init_state()

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    tr.save_train_state(epoch=0)
    assert not os.path.exists(tr._state_path())

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    tr.save_train_state(epoch=0)
    assert os.path.exists(tr._state_path())
    assert tr.restore_train_state() == 1

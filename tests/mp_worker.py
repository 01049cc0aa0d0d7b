"""Worker for the true multi-process ``jax.distributed`` test (SURVEY §4).

Launched as ``python tests/mp_worker.py --coordinator localhost:PORT
--num-processes 2 --process-id I`` by ``test_distributed.py``. Each process
contributes one CPU device to a global 2-device ``data`` mesh, runs a few
real SASRec train steps through the framework's mesh/placement path
(``create_mesh`` + ``shard_params``/``shard_batch``/``put_global``), and
prints a checksum of the final params. The parent asserts both processes
agree with each other and with a single-process run of the same function.

``run_training`` is shared: the pytest process imports it for the
single-process reference value.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_training(plan, steps: int = 3):
    """A few deterministic SASRec train steps under the given MeshPlan;
    returns (param checksum, last loss) — both replicated scalars."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dr4sr_tpu.data.loader import BatchIterator
    from dr4sr_tpu.data.preprocess import resplit_sequences
    from dr4sr_tpu.data.synthetic import markov_sequences, synthetic_config
    from dr4sr_tpu.models.base import RecModel
    from dr4sr_tpu.models.registry import get_model_class
    from dr4sr_tpu.parallel.mesh import replicate, shard_batch, shard_params
    from dr4sr_tpu.train.trainer import TrainState, make_optimizer

    seqs = markov_sequences(num_users=64, num_items=40, min_len=4,
                            max_len=10, seed=3)
    train, _val, _test, n_users, n_items = resplit_sequences(seqs, 12)
    cfg = synthetic_config(max_seq_len=12)
    cfg["model"]["dropout_rate"] = 0.0  # determinism across shardings
    batch_size = 16
    rec = RecModel(cfg, get_model_class("SASRec").build(cfg, n_items),
                   n_items, n_users)

    loader = BatchIterator(train, batch_size, shuffle=False)
    batches = [loader.sample_batch(batch_size) for _ in range(steps)]

    rng = jax.random.PRNGKey(0)
    variables = rec.init(rng, jax.device_put(batches[0]))
    tx = make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = TrainState.create(apply_fn=rec.module.apply,
                              params=variables["params"], tx=tx)
    state = state.replace(
        params=shard_params(state.params, plan),
        opt_state=replicate(state.opt_state, plan),
        step=jax.device_put(state.step) if plan.mesh is None
        else replicate(state.step, plan),
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: rec.training_loss({"params": p}, batch, rng)
        )(state.params)
        return state.apply_gradients(grads=grads), loss

    for i in range(steps):
        rng, r = jax.random.split(rng)
        state, loss = train_step(state, shard_batch(batches[i], plan), r)

    @jax.jit
    def checksum(params):
        leaves = jax.tree_util.tree_leaves(params)
        return sum(jnp.sum(jnp.abs(x)) for x in leaves)

    return float(checksum(state.params)), float(loss)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--ckpt-dir", default=None,
                        help="exercise the single-writer checkpoint rule: "
                             "every process calls EarlyStopping on the same "
                             "path; only process 0 may write (VERDICT r4 "
                             "weak-#6)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # env pins axon; see conftest
    jax.config.update("jax_enable_x64", False)
    # the harness env forces 8 virtual host devices; one per process here
    jax.config.update("jax_num_cpu_devices", 1)
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == args.num_processes, (
        f"expected 1 CPU device/process, got {jax.device_count()} global"
    )

    from dr4sr_tpu.parallel.mesh import MeshPlan, create_mesh

    plan = MeshPlan(mesh=create_mesh(data=args.num_processes))
    chk, loss = run_training(plan)
    wrote = None
    if args.ckpt_dir:
        # every process runs the identical callback on the identical path —
        # the single-writer guard must let exactly process 0 create the file
        import jax.numpy as jnp

        from dr4sr_tpu.train.callbacks import EarlyStopping

        # per-process dir: if the guard failed, process 1 would create a
        # file under p1/ — existence there is unambiguous evidence of a
        # second writer (a shared path can't distinguish who wrote)
        cb = EarlyStopping(
            monitor="ndcg@20", patience=3, model_name="SASRec",
            dataset_name="mp",
            save_dir=os.path.join(args.ckpt_dir, f"p{args.process_id}"),
            filename="best.ckpt",
        )
        cb({"w": jnp.full((3,), 1.0 + args.process_id * 0.0)},
           {"model": {"model": "SASRec"}}, 0, {"ndcg@20": 0.5})
        wrote = os.path.exists(cb.checkpoint_path)
    print("RESULT " + json.dumps({
        "process_id": args.process_id,
        "num_processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "checksum": chk,
        "loss": loss,
        "ckpt_exists": wrote,
    }), flush=True)


if __name__ == "__main__":
    main()

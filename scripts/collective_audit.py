"""Per-config communication audit (VERDICT r4 next-#7).

Compiles the framework's four core programs — per-step train, fused
multi-step train, full-catalog eval top-k, and the bilevel outer step —
over several mesh shapes on a virtual CPU device mesh, and tabulates the
collective traffic each compiled HLO moves per step, by collective class
(all-reduce / all-gather / all-to-all / reduce-scatter / collective-permute).

This is the evidence layer under docs/SCALING.md's scaling-efficiency
claims: multi-host hardware is not available here, so the committed numbers
are the compiler-inserted collective bytes (exact, shape-derived) plus an
analytic ICI-time model, rather than measured step times.

  python scripts/collective_audit.py [--out results_collective_audit.json]

The script re-derives the table from scratch each run; the committed JSON is
its output on the round's code.
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s64": 8, "u64": 8, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1}

COLLECTIVES = ("all-gather", "all-reduce", "all-to-all",
               "collective-permute", "reduce-scatter")


def collective_bytes(hlo_text):
    """{collective_class: output bytes} summed over a compiled HLO module.

    Handles tuple-shaped collectives — gradient sums compile as ONE
    all-reduce over a tuple of every parameter gradient, e.g.
    ``%ar = (f32[1000,64]{1,0}, f32[128]{0}) all-reduce(...)`` — by summing
    every ``dtype[dims]`` group on the line's LHS."""
    per_op = {}
    opcode_re = re.compile(r"\b(" + "|".join(COLLECTIVES) + r")(?:-start)?\(")
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        if "=" not in line:
            continue
        lhs, _, rhs = line.partition("=")
        m = opcode_re.search(rhs)
        if m is None:
            continue
        # shapes sit between '=' and the opcode token
        shapes_text = rhs[: m.start()]
        nbytes = 0
        for sm in shape_re.finditer(shapes_text):
            if sm.group(1) not in DTYPE_BYTES:
                continue  # layout annotations like {1,0} don't match \w+[
            n = 1
            for d in (int(d) for d in sm.group(2).split(",") if d):
                n *= d
            nbytes += n * DTYPE_BYTES[sm.group(1)]
        per_op[m.group(1)] = per_op.get(m.group(1), 0) + nbytes
    return per_op


def build_world(batch_size, n_items=1000, max_seq_len=16):
    from dr4sr_tpu.data.loader import BatchIterator
    from dr4sr_tpu.data.preprocess import resplit_sequences
    from dr4sr_tpu.data.synthetic import markov_sequences, synthetic_config
    from dr4sr_tpu.models.base import RecModel
    from dr4sr_tpu.models.registry import get_model_class

    cfg = synthetic_config(max_seq_len=max_seq_len)
    cfg["train"]["batch_size"] = batch_size
    seqs = markov_sequences(num_users=256, num_items=n_items, seed=0)
    train, _v, _t, n_users, n_items = resplit_sequences(seqs, max_seq_len)
    rec = RecModel(cfg, get_model_class("SASRec").build(cfg, n_items),
                   n_items, n_users)
    batch = BatchIterator(train, batch_size, shuffle=False).sample_batch(
        batch_size)
    return cfg, rec, batch, n_items


def audit_mesh(data, model, batch_size=64):
    from dr4sr_tpu.meta.hypergrad import hypergradient
    from dr4sr_tpu.models.metamodel import gumbel_softmax_weight
    from dr4sr_tpu.modules.layers import MLP
    from dr4sr_tpu.ops.attention import reference_attention
    from dr4sr_tpu.parallel import ep
    from dr4sr_tpu.parallel.mesh import (
        MeshPlan, create_mesh, put_global, replicate, shard_batch,
        shard_params,
    )

    mesh = create_mesh(data=data, model=model,
                       devices=jax.devices()[: data * model])
    plan = MeshPlan(mesh=mesh, shard_embedding=model > 1)
    ep.set_plan(mesh if model > 1 else None)
    try:
        cfg, rec, host_batch, n_items = build_world(batch_size)
        rng = jax.random.PRNGKey(0)
        variables = rec.init(rng, jax.device_put(host_batch))
        params = shard_params(variables["params"], plan)
        tx = optax.adam(1e-3)
        opt_state = replicate(tx.init(jax.device_get(params)), plan)
        dbatch = shard_batch(host_batch, plan)

        out = {}

        def train_step(p, o, b, r):
            loss, grads = jax.value_and_grad(
                lambda q: rec.training_loss({"params": q}, b, r))(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        out["train_step"] = collective_bytes(
            jax.jit(train_step).lower(params, opt_state, dbatch, rng)
            .compile().as_text())

        # fused scan of 4 steps: collective bytes should be ~4x train_step's
        # (per-step traffic is unchanged by the dispatch fusion)
        stack = {k: np.stack([np.asarray(v)] * 4)
                 for k, v in host_batch.items()}
        stacked = {k: put_global(v, plan.stacked_batch_sharding(np.ndim(v)))
                   for k, v in stack.items()}
        rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(4)])

        def fused(p, o, st, rs):
            def body(carry, xs):
                p, o = carry
                b, r = xs
                p, o, l = train_step(p, o, b, r)
                return (p, o), l
            (p, o), ls = jax.lax.scan(body, (p, o), (st, rs))
            return p, o, ls

        out["fused_scan4"] = collective_bytes(
            jax.jit(fused).lower(params, opt_state, stacked, rngs)
            .compile().as_text())

        # full-catalog masked top-k eval (the EP merge path when model>1)
        keep = jax.device_put(np.ones(n_items, bool))
        if model > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from dr4sr_tpu.models.base import item_table
            from dr4sr_tpu.ops.topk import sharded_masked_topk

            def eval_step(p, b, km):
                query = rec.encode_eval({"params": p}, b)
                table = item_table({"params": p})[:n_items]
                pad = (-n_items) % model
                if pad:
                    table = jnp.pad(table, ((0, pad), (0, 0)))
                    km = jnp.pad(km, (0, pad))
                hist = jnp.zeros((query.shape[0], 1), jnp.int32)
                return shard_map(
                    lambda q, t, k2, h: sharded_masked_topk(
                        q, t, 100, "model", item_keep_mask_local=k2,
                        user_hist=h),
                    mesh=mesh, in_specs=(P(), P("model"), P("model"), P()),
                    out_specs=P(), check_vma=False,
                )(query, table, km, hist)
        else:
            def eval_step(p, b, km):
                return rec.topk({"params": p}, b, 100, item_keep_mask=km)

        out["eval_topk"] = collective_bytes(
            jax.jit(eval_step).lower(params, dbatch, keep)
            .compile().as_text())

        # bilevel outer step (jvp-of-grad Neumann HVPs)
        d_emb = int(cfg["model"]["embed_dim"])
        meta_module = MLP((d_emb, 2))
        meta_params = replicate(
            {"mlp": meta_module.init(jax.random.PRNGKey(5),
                                     jnp.zeros((1, d_emb)))["params"],
             "tau": jnp.asarray(10.0)}, plan)

        def weighted_loss(p, m, b, r):
            r_loss, r_g = jax.random.split(r)
            loss_ps, query = rec.training_loss(
                {"params": p}, b, r_loss, reduce=False, return_query=True)
            logits = meta_module.apply({"params": m["mlp"]}, query)
            w = gumbel_softmax_weight(logits, jnp.clip(m["tau"], min=1.0),
                                      r_g)
            if w.ndim > loss_ps.ndim:
                w = w[..., 0]
            w = jnp.where(b["item_id"] == 0, 0.0, w)
            return jnp.sum(w * loss_ps)

        def outer(p, m, tb, vb, r):
            r_v, r_t = jax.random.split(r)
            with reference_attention():
                return hypergradient(
                    lambda pp, mm: weighted_loss(pp, mm, tb, r_t),
                    lambda pp: rec.training_loss({"params": pp}, vb, r_v),
                    p, m, lr=1e-3, truncate_iter=3)

        out["meta_outer_step"] = collective_bytes(
            jax.jit(outer).lower(params, meta_params, dbatch, dbatch, rng)
            .compile().as_text())
        return out
    finally:
        ep.set_plan(None)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="results_collective_audit.json")
    parser.add_argument("--batch_size", type=int, default=64)
    args = parser.parse_args()

    meshes = [(1, 1), (8, 1), (4, 2), (2, 4)]
    results = {"batch_size": args.batch_size, "seq_len": 16, "embed_dim": 64,
               "num_items": 1000, "dtype_note":
               "bytes = HLO collective OUTPUT bytes per occurrence in the "
               "compiled module; a lax.scan body's collectives execute once "
               "PER ITERATION (fused_scan4 moves 4x its listed bytes per "
               "dispatch — i.e. the same per-step traffic as train_step)",
               "configs": {}}
    for data, model in meshes:
        tag = f"data{data}xmodel{model}"
        print(f"=== {tag}", flush=True)
        audit = audit_mesh(data, model, args.batch_size)
        results["configs"][tag] = audit
        for prog, per_op in audit.items():
            total = sum(per_op.values())
            print(f"  {prog:16s} total={total:>10,d} B  {per_op}")
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Where do the stress step's 90 ms actually go? (round-5 follow-up to
results_stress_profile.json: attention+matmuls only explain ~30 ms.)

Measures the full train step under controlled ablations:
  * catalog size N ∈ {10k, 1M}       → table-dependent costs (dense Adam
                                        over the [N, D] table, gathers)
  * dropout 0.5 vs 0.0               → threefry RNG + mask cost
  * rng_impl threefry vs rbg         → cheaper TPU RNG for dropout
and A/Bs the exact top-k (grouped two-phase vs plain lax.top_k) at the
1M-item eval shape.

  python scripts/stress_decompose.py [--out results_stress_decompose.json]

Run alone on the chip.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from dr4sr_tpu.utils.env import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build(batch_size, n_items, seq_len, embed_dim, dropout):
    from dr4sr_tpu.data.dataset import RowData
    from dr4sr_tpu.data.synthetic import synthetic_config
    from dr4sr_tpu.models.base import RecModel
    from dr4sr_tpu.models.registry import get_model_class

    cfg = synthetic_config(max_seq_len=seq_len)
    cfg["train"]["batch_size"] = batch_size
    cfg["model"].update({"embed_dim": embed_dim,
                         "hidden_size": 4 * embed_dim,
                         "layer_num": 2, "head_num": 4,
                         "dropout_rate": dropout})
    cfg["data"]["max_seq_len"] = seq_len
    rec = RecModel(cfg, get_model_class("SASRec").build(cfg, n_items),
                   n_items, batch_size)
    r = np.random.default_rng(0)
    lens = r.integers(seq_len // 2, seq_len + 1, batch_size).astype(np.int32)
    seq = np.zeros((batch_size, seq_len), np.int32)
    tgt = np.zeros((batch_size, seq_len), np.int32)
    for i in range(batch_size):
        seq[i, : lens[i]] = r.integers(1, n_items, lens[i])
        tgt[i, : lens[i]] = r.integers(1, n_items, lens[i])
    rows = RowData(np.arange(batch_size, dtype=np.int32), seq, tgt, lens,
                   np.ones((batch_size, seq_len), np.float32),
                   np.zeros(batch_size, np.int32))
    return rec, rows


def step_ms(rec, rows, batch_size, n_steps=10):
    """Self-validating step timing: measures at n_steps and 2*n_steps with a
    HOST READBACK of the final loss (device_get) as the barrier — over the
    remote tunnel this is the only sync we have seen to be reliable — and
    derives ms/step from the (2n − n) difference, cancelling any fixed
    residual. Raises if the two windows don't scale (timing not trustable)."""
    import bench

    def window(n):
        t0 = time.perf_counter()
        _sps, _ms, state, _reps = bench.bench_train(rec, rows, batch_size,
                                                    n_steps=n)
        # force full materialization through the host
        float(np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(state.params)[0])).ravel()[0])
        return time.perf_counter() - t0

    window(2)  # compile + first-dispatch warmup
    t1 = window(n_steps)
    t2 = window(2 * n_steps)
    ms = (t2 - t1) / n_steps * 1e3
    if ms <= 0:
        raise RuntimeError(f"non-scaling timing: {t1:.3f}s vs {t2:.3f}s")
    return round(ms, 2)


def topk_ab(n_items=1_000_000, b=128, d=256, k=100, iters=10):
    # grouped two-phase exact top-k, kept HERE as the measured-and-rejected
    # alternative (round 5): on v5e it is 2-5x slower than native lax.top_k
    def _exact_topk_grouped(scores, k, group=8192):
        b_, n = scores.shape
        if n <= 2 * group or k > group:
            return jax.lax.top_k(scores, k)
        g = -(-n // group)
        pad = g * group - n
        if pad:
            scores = jnp.pad(scores, ((0, 0), (0, pad)),
                             constant_values=-1e30)
        sv, si = jax.lax.top_k(scores.reshape(b_, g, group), k)
        si = si + (jnp.arange(g, dtype=si.dtype) * group)[None, :, None]
        v, pos = jax.lax.top_k(sv.reshape(b_, g * k), k)
        return v, jnp.take_along_axis(si.reshape(b_, g * k), pos, axis=1)

    r = np.random.default_rng(1)
    q = jnp.asarray(r.normal(size=(b, d)), jnp.float32)
    t = jnp.asarray(r.normal(size=(n_items, d)) / np.sqrt(d), jnp.float32)

    def run(fn):
        # chain iterations through a data dependency (q shifted by a tiny
        # function of the previous output) and END with a HOST READBACK —
        # independent re-dispatches of an identical program have shown
        # non-blocking completion over the remote tunnel
        @jax.jit
        def step(q, t):
            v, i = fn(jnp.dot(q, t.T), k)
            return v, i

        def chained(n):
            qq = q
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                v, i = step(qq, t)
                qq = qq + 1e-12 * v[:, :1]  # dependency: next q needs v
                last = v
            float(np.asarray(jax.device_get(last))[0, 0])
            return time.perf_counter() - t0

        chained(2)  # compile + warm
        t1 = chained(iters)
        t2 = chained(2 * iters)
        return max((t2 - t1) / iters * 1e3, 0.0)

    plain = run(lambda s, kk: jax.lax.top_k(s, kk))
    out = {"plain_topk_ms": round(plain, 2)}
    for group in (8192, 32768, 65536, 131072):
        ms = run(lambda s, kk, g=group: _exact_topk_grouped(s, kk, group=g))
        out[f"grouped_{group}_ms"] = round(ms, 2)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="results_stress_decompose.json")
    args = parser.parse_args()

    B, L, D = 128, 512, 256
    res = {"shape": f"B{B} L{L} D{D}", "device": str(jax.devices()[0]),
           "train_step_ms": {}}

    for tag, n, drop in (
        ("N1M_drop0.5", 1_000_000, 0.5),
        ("N1M_drop0.0", 1_000_000, 0.0),
        ("N10k_drop0.5", 10_000, 0.5),
        ("N10k_drop0.0", 10_000, 0.0),
    ):
        rec, rows = build(B, n, L, D, drop)
        res["train_step_ms"][tag] = round(step_ms(rec, rows, B), 2)
        print(tag, res["train_step_ms"][tag], flush=True)

    # rbg rng: cheaper TPU dropout RNG (threefry is the jax default)
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        rec, rows = build(B, 1_000_000, L, D, 0.5)
        res["train_step_ms"]["N1M_drop0.5_rbg"] = round(step_ms(rec, rows, B), 2)
        print("rbg", res["train_step_ms"]["N1M_drop0.5_rbg"], flush=True)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")

    # fused-scan stress step: the trace shows device-busy ~21 ms/step vs
    # 90 ms wall per-step-dispatch — if the fused path lands near the busy
    # time, the stress gap is dispatch overhead, already solved by
    # train.steps_per_dispatch (same conclusion as the bs256 workload)
    import bench

    rec, rows = build(B, 1_000_000, L, D, 0.5)

    def fused_window(n_dispatch):
        t0 = time.perf_counter()
        bench.bench_train_fused(rec, rows, B, spd=10, n_dispatch=n_dispatch)
        return time.perf_counter() - t0

    fused_window(1)  # compile
    t1 = fused_window(2)
    t2 = fused_window(4)
    fms = (t2 - t1) / (2 * 10) * 1e3  # 2 extra dispatches x spd steps
    res["train_step_ms"]["N1M_drop0.5_fused_spd10"] = round(fms, 2)
    print("fused", round(fms, 2), flush=True)

    res["eval_topk_ab"] = topk_ab()
    print(json.dumps(res["eval_topk_ab"]), flush=True)

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

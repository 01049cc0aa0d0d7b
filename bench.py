"""Benchmark: training / eval / regeneration throughput on one TPU chip.

Primary metric: SASRec training sequences/sec on the real amazon-toys
workload (rebuilt from the reference's bundled ``seq2pat_data.pth``).
Baseline: the reference trains SASRec on amazon-toys at ~13.4 s/epoch over
~19.4k sequences on its GPU (BASELINE.md) ≈ 1449 seqs/s.

Extras: full-catalog masked top-k eval throughput, batched hybrid-decode
throughput (vs the reference's batch=1 greedy loop), and analytic
FLOPs/step + MFU vs the chip's bf16 peak. Prints ONE JSON line — always,
even on backend failure (VERDICT r2 weak-#1): TPU-client init is
health-checked in a subprocess and retried with backoff before any
in-process jax work, and main() emits whatever completed on error.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_SEQS_PER_SEC = 19412 / 13.4  # ≈1449, poster toys runtime (GPU)

TOYS_SEQ2PAT = "/root/reference/dataset/amazon-toys/toy/seq2pat_data.pth"

# TPU v5e (1 chip): 197 TFLOP/s bf16 on the MXU (public spec). fp32 matmuls
# run below this, so MFU-vs-bf16-peak is a conservative lower bound.
V5E_BF16_PEAK_FLOPS = 197e12


def backend_health(timeout_s: int = 420) -> bool:
    """Run a tiny jit matmul in a SUBPROCESS (a hung/poisoned axon client
    cannot be recovered in-process; memory: axon-tpu-quirks)."""
    code = ("import jax, jax.numpy as jnp;"
            "print(jnp.dot(jnp.ones((8,8)), jnp.ones((8,8))).sum())")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, timeout=timeout_s)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(retries: int = 2, backoff_s: int = 300) -> bool:
    """One bench-level backoff-retry cycle for axon outages (the same
    failure mode scripts/run_suite.py:61-100 retries)."""
    for attempt in range(retries + 1):
        if backend_health():
            return True
        if attempt < retries:
            print(f"# backend unhealthy, retry in {backoff_s}s "
                  f"(attempt {attempt + 1}/{retries})", file=sys.stderr)
            time.sleep(backoff_s)
    return False


def transformer_train_flops(batch, seq_len, embed_dim, hidden, layers,
                            num_neg=1):
    """Analytic matmul FLOPs for one SASRec train step (fwd + 2x bwd).

    Per layer: QKV+out projections 8*B*S*D^2, attention scores+apply
    4*B*S^2*D, FFN 4*B*S*D*F; scoring adds 2*B*S*(1+num_neg)*2*D.
    """
    per_layer = (8 * batch * seq_len * embed_dim ** 2
                 + 4 * batch * seq_len ** 2 * embed_dim
                 + 4 * batch * seq_len * embed_dim * hidden)
    scoring = 4 * batch * seq_len * (1 + num_neg) * embed_dim
    return 3 * (layers * per_layer + scoring)


def measured_reference():
    """Measured numbers from actually running /root/reference on this host
    (scripts/measure_reference_baseline.py -> BASELINE_MEASURED.json;
    VERDICT r1 #6). Returns {} when the measurement hasn't been run."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def load_workload(max_seq_len: int = 50):
    from dr4sr_tpu.data.preprocess import resplit_sequences

    if os.path.exists(TOYS_SEQ2PAT):
        import torch

        seqs = torch.load(TOYS_SEQ2PAT, weights_only=False)
        name = "amazon-toys"
    else:
        from dr4sr_tpu.data.synthetic import markov_sequences

        seqs = markov_sequences(num_users=19412, num_items=11925, min_len=3,
                                max_len=10, seed=0)
        name = "synthetic-toys-scale"
    train, val, test, n_users, n_items = resplit_sequences(seqs, max_seq_len)
    return name, seqs, train, val, n_users, n_items


def bench_train(rec, train_rows, batch_size, n_steps=60, precision="fp32",
                repeats=1):
    import functools

    import jax
    import jax.numpy as jnp

    from dr4sr_tpu.data.loader import BatchIterator
    from dr4sr_tpu.train.trainer import TrainState, make_optimizer

    loader = BatchIterator(train_rows, batch_size, shuffle=True, seed=0)
    rng = jax.random.PRNGKey(0)
    first = loader.sample_batch(batch_size)
    variables = rec.init(rng, jax.device_put(first))
    tx = make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = TrainState.create(apply_fn=rec.module.apply, params=variables["params"], tx=tx)

    def maybe_cast(p):  # mixed precision: bf16 fwd/bwd, f32 master weights
        if precision != "bf16":
            return p
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        loss, grads = jax.value_and_grad(
            lambda p: rec.training_loss({"params": maybe_cast(p)}, batch, rng)
        )(state.params)
        return state.apply_gradients(grads=grads), loss

    batches = [loader.sample_batch(batch_size) for _ in range(8)]
    for i in range(3):
        rng, r = jax.random.split(rng)
        state, loss = train_step(state, jax.device_put(batches[i % 8]), r)
    jax.block_until_ready(loss)

    sps_list, ms_list = [], []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        for i in range(n_steps):
            rng, r = jax.random.split(rng)
            state, loss = train_step(state, jax.device_put(batches[i % 8]), r)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        sps_list.append(n_steps * batch_size / dt)
        ms_list.append(1000 * dt / n_steps)
    # repeated timing windows: median + the raw list, so tunnel noise is
    # distinguishable from a real regression (VERDICT r3 weak-#1/next-#4).
    # Always a 4-tuple — the single-repeat case returns a length-1 repeats
    # list rather than a different arity (ADVICE r4 low-#4)
    return (float(np.median(sps_list)), float(np.median(ms_list)), state,
            [round(s, 1) for s in sps_list])


def bench_train_fused(rec, train_rows, batch_size, spd=50, n_dispatch=3,
                      precision="fp32"):
    """Device-resident multi-step dispatch (train.steps_per_dispatch): spd
    optimizer steps per jitted lax.scan dispatch, including the host->device
    ship of the stacked batches each dispatch (what a real epoch pays).
    This amortizes the ~1.8 ms fixed per-dispatch tunnel overhead that makes
    the per-step bs256 path ~90% launch-bound (VERDICT r3 next-#3)."""
    import functools

    import jax
    import jax.numpy as jnp

    from dr4sr_tpu.data.loader import BatchIterator
    from dr4sr_tpu.train.trainer import TrainState, make_optimizer

    loader = BatchIterator(train_rows, batch_size, shuffle=True, seed=0)
    rng = jax.random.PRNGKey(0)
    first = loader.sample_batch(batch_size)
    variables = rec.init(rng, jax.device_put(first))
    tx = make_optimizer({"optimizer": "adam", "learning_rate": 1e-3})
    state = TrainState.create(apply_fn=rec.module.apply,
                              params=variables["params"], tx=tx)

    def maybe_cast(p):
        if precision != "bf16":
            return p
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    batches = [loader.sample_batch(batch_size) for _ in range(8)]
    stacked = {k: np.stack([batches[i % 8][k] for i in range(spd)])
               for k in batches[0]}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def steps(state, stack, rng):
        rngs = jax.random.split(rng, spd)

        def body(st, xs):
            batch, r = xs
            loss, grads = jax.value_and_grad(
                lambda p: rec.training_loss({"params": maybe_cast(p)}, batch, r)
            )(st.params)
            return st.apply_gradients(grads=grads), loss

        st, losses = jax.lax.scan(body, state, (stack, rngs))
        return st, losses.mean()

    rng, r = jax.random.split(rng)
    state, loss = steps(state, jax.device_put(stacked), r)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        rng, r = jax.random.split(rng)
        state, loss = steps(state, jax.device_put(stacked), r)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    n_steps = spd * n_dispatch
    return n_steps * batch_size / dt, 1000 * dt / n_steps


def bench_eval(rec, state, val_rows, n_items, batch_size=2048, k=100, n_steps=20,
               method="exact"):
    import jax
    import jax.numpy as jnp

    from dr4sr_tpu.data.loader import BatchIterator
    from dr4sr_tpu.models.base import item_table
    from dr4sr_tpu.ops.topk import masked_topk_scores

    loader = BatchIterator(val_rows, batch_size, shuffle=False)
    batch = loader.sample_batch(batch_size)
    keep = jnp.asarray(np.arange(n_items) > 0)

    @jax.jit
    def step(params, batch, keep):
        query = rec.encode_eval({"params": params}, batch)
        table = item_table({"params": params})[:n_items]
        return masked_topk_scores(query, table, k, item_keep_mask=keep,
                                  user_hist=batch["user_hist"], method=method)

    db = jax.device_put(batch)
    out = step(state.params, db, keep)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step(state.params, jax.device_put(batch), keep)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n_steps * batch_size / dt


_REPO = os.path.dirname(os.path.abspath(__file__))
# Prefer the round's freshly-trained checkpoint under dataset/ (gitignored,
# wiped on machine resets); fall back to the committed copy under artifacts/
# so the trained-weights decode bench (VERDICT r4 weak-#7) survives resets.
_TOYS_REGEN_CANDIDATES = [
    os.path.join(_REPO, "dataset", "amazon-toys", "toy",
                 "regenerator_a5b2K5ew1p0.msgpack"),
    os.path.join(_REPO, "artifacts", "regenerator_toys_a5b2K5ew1p0.msgpack"),
]
TOYS_REGEN_CKPT = next(
    (p for p in _TOYS_REGEN_CANDIDATES if os.path.exists(p)),
    _TOYS_REGEN_CANDIDATES[0])


def bench_decode(n_items, sequences, batch_size=4096, max_len=25, n_batches=4,
                 precision="fp32", extras=None):
    # lane-count probe on v5e (scripts/probe_decode_batch.py, round 2):
    # b2048 25.6k, b4096 29.6k, b8192 28.9k seqs/s — 4096 is the knee
    import jax

    from dr4sr_tpu.regen.decode import decode_dataset
    from dr4sr_tpu.regen.generator import Generator

    gen = Generator(num_items=n_items, k=5)
    rng = jax.random.PRNGKey(0)
    src0 = np.zeros((1, 8), np.int32)
    variables = gen.init(
        {"params": rng, "dropout": rng, "gumbel": rng},
        src0, src0[:, :-1], np.ones(1, np.int32), np.asarray(1.0),
    )
    # measure with the TRAINED toys regenerator when its checkpoint is on
    # disk: a random-weight model's EOS timing is unrepresentative of real
    # decode termination (VERDICT r4 weak-#7). Falls back to the random
    # init (and says so in the JSON) when the round's artifacts are absent.
    trained = False
    if os.path.exists(TOYS_REGEN_CKPT):
        try:
            from flax import serialization

            with open(TOYS_REGEN_CKPT, "rb") as f:
                variables = serialization.from_bytes(
                    jax.device_get(variables), f.read())
            trained = True
        except Exception:
            pass
    if extras is not None:
        extras["decode_weights"] = "trained" if trained else "random-init"
    subset = [list(s) for s in sequences[: batch_size]]
    # warmup/compile
    decode_dataset(gen, variables, subset[:batch_size], 1,
                   batch_size=batch_size, max_len=max_len, precision=precision)
    t0 = time.perf_counter()
    decode_dataset(gen, variables, subset, n_batches,
                   batch_size=batch_size, max_len=max_len, precision=precision)
    dt = time.perf_counter() - t0
    return len(subset) * n_batches / dt


def bench_stress(batch_size=128, n_items=1_000_000, seq_len=512, embed_dim=256,
                 n_steps=10):
    """Scale demo (VERDICT r1 #9): shapes where the TPU-first design pays —
    flash-attention blocking at L=512 and a 1M-item catalog (1GB table) —
    train step + full-catalog masked top-k, single chip."""
    import jax

    from dr4sr_tpu.data.synthetic import synthetic_config
    from dr4sr_tpu.models.base import RecModel
    from dr4sr_tpu.models.registry import get_model_class

    cfg = synthetic_config(max_seq_len=seq_len)
    cfg["train"]["batch_size"] = batch_size
    cfg["model"].update({"embed_dim": embed_dim, "hidden_size": 4 * embed_dim,
                         "layer_num": 2, "head_num": 4})
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
    from dr4sr_tpu.data.dataset import RowData

    rows = RowData(np.arange(batch_size, dtype=np.int32), seq, tgt, lens,
                   np.ones((batch_size, seq_len), np.float32),
                   np.zeros(batch_size, np.int32))
    sps, step_ms, state, _ = bench_train(rec, rows, batch_size, n_steps=n_steps)
    flops = transformer_train_flops(batch_size, seq_len, embed_dim,
                                    4 * embed_dim, 2)
    tflops = flops / (step_ms / 1000) / 1e12
    # same workload under bf16 mixed precision (train.precision: bf16)
    try:
        sps16, ms16, _, _ = bench_train(rec, rows, batch_size, n_steps=n_steps,
                                        precision="bf16")
        bf16 = {
            "stress_bf16_train_seqs_per_sec": round(sps16, 1),
            "stress_bf16_step_ms": round(ms16, 1),
            "stress_bf16_mfu_vs_bf16_peak": round(
                flops / (ms16 / 1000) / V5E_BF16_PEAK_FLOPS, 4),
        }
    except Exception as e:
        bf16 = {"stress_bf16_error": str(e)[:120]}

    # full-catalog eval at 1M items
    eval_rows = RowData(rows.user_id, seq, tgt[:, 0], lens,
                        np.ones(batch_size, np.float32),
                        rows.domain_id, user_hist=seq)
    eval_sps = bench_eval(rec, state, eval_rows, n_items,
                          batch_size=batch_size, k=100, n_steps=5)
    # same eval under eval.topk_method=approx (TPU approx_max_k MIPS path)
    try:
        eval_approx_sps = round(bench_eval(
            rec, state, eval_rows, n_items, batch_size=batch_size, k=100,
            n_steps=5, method="approx"), 1)
    except Exception as e:
        eval_approx_sps = f"error: {str(e)[:80]}"
    return {
        "stress_config": f"B{batch_size} L{seq_len} D{embed_dim} N{n_items}",
        "stress_train_seqs_per_sec": round(sps, 1),
        "stress_step_ms": round(step_ms, 1),
        "stress_tokens_per_sec": round(sps * seq_len, 0),
        "stress_eval_seqs_per_sec": round(eval_sps, 1),
        "stress_eval_approx_topk_seqs_per_sec": eval_approx_sps,
        "stress_train_tflops_per_sec": round(tflops, 2),
        "stress_mfu_vs_bf16_peak": round(
            tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 4),
        **bf16,
    }


def run_benchmarks(args, extras):
    """All measurement; mutates ``extras`` progressively so the caller can
    emit whatever completed even if a later stage raises."""
    import jax

    from dr4sr_tpu.data.synthetic import synthetic_config
    from dr4sr_tpu.models.base import RecModel
    from dr4sr_tpu.models.registry import get_model_class
    from dr4sr_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    name, seqs, train_rows, val_rows, n_users, n_items = load_workload()
    batch_size = 256
    cfg = synthetic_config(max_seq_len=50)
    cfg["train"]["batch_size"] = batch_size

    rec = RecModel(cfg, get_model_class("SASRec").build(cfg, n_items), n_items, n_users)
    train_sps, step_ms, state, sps_spread = bench_train(
        rec, train_rows, batch_size, repeats=3)
    extras["per_step_sps_repeats"] = sps_spread

    flops = transformer_train_flops(
        batch_size, cfg["data"]["max_seq_len"], cfg["model"]["embed_dim"],
        cfg["model"]["hidden_size"], cfg["model"]["layer_num"])
    tflops = flops / (step_ms / 1000) / 1e12
    extras.update({
        "num_items": int(n_items),
        "num_train_rows": len(train_rows),
        "batch_size": batch_size,
        "step_ms": round(step_ms, 2),
        "device": str(jax.devices()[0]),
        "train_flops_per_step": int(flops),
        "train_tflops_per_sec": round(tflops, 3),
        # analytic matmul FLOPs / v5e bf16 peak — tiny D=64 research shapes
        # are HBM/latency-bound, so this is expected to be small; the
        # --stress config is the MXU-utilization story
        "mfu_vs_bf16_peak": round(tflops * 1e12 / V5E_BF16_PEAK_FLOPS, 5),
    })
    extras["_primary"] = (name, train_sps)
    extras["train_seqs_per_sec_per_step_dispatch"] = round(train_sps, 1)
    # fused multi-step dispatch (train.steps_per_dispatch in the trainer,
    # bit-parity-tested in tests/test_trainer_fused.py): the recommended way
    # to train small-batch workloads over the remote tunnel. If it beats the
    # per-step path (it should by ~an order of magnitude at bs256), it
    # becomes the headline number, explicitly labeled.
    try:
        fused_sps_list = []
        for _ in range(3):
            fsps, fms = bench_train_fused(rec, train_rows, batch_size, spd=50)
            fused_sps_list.append(round(fsps, 1))
        fused_sps = float(np.median(fused_sps_list))
        # derive the reported ms from the SAME median sps so the pair can't
        # disagree under tunnel noise (ADVICE r4 low-#3: fms used to come
        # from the last repeat while sps was the median)
        fms = 1000.0 * batch_size / fused_sps
        extras["train_seqs_per_sec_fused_spd50"] = round(fused_sps, 1)
        extras["fused_step_ms"] = round(fms, 3)
        extras["fused_sps_repeats"] = fused_sps_list
        extras["fused_train_tflops_per_sec"] = round(
            extras["train_flops_per_step"] / (fms / 1000) / 1e12, 3)
        extras["fused_mfu_vs_bf16_peak"] = round(
            extras["fused_train_tflops_per_sec"] * 1e12 / V5E_BF16_PEAK_FLOPS,
            5)
        if fused_sps > train_sps:
            extras["headline_is_fused_dispatch"] = True
            extras["_primary"] = (name, fused_sps)
    except Exception as e:
        extras["fused_error"] = str(e)[:160]
    if not args.quick:
        try:
            big_sps, big_ms, _, _ = bench_train(rec, train_rows, 2048,
                                                n_steps=20)
            extras["train_seqs_per_sec_bs2048"] = round(big_sps, 1)
            extras["step_ms_bs2048"] = round(big_ms, 2)
        except Exception as e:
            extras["bigbatch_error"] = str(e)[:120]
        try:
            extras["eval_seqs_per_sec"] = round(
                bench_eval(rec, state, val_rows, n_items), 1
            )
        except Exception as e:  # keep the primary metric alive
            extras["eval_error"] = str(e)[:120]
        try:
            decode_sps = bench_decode(n_items, seqs, extras=extras)
            extras["regen_decode_seqs_per_sec"] = round(decode_sps, 1)
            ref = measured_reference()
            if ref.get("decode_seqs_per_sec"):
                # measured: the reference's own batch=1 translate loop run
                # on this host (scripts/measure_reference_baseline.py)
                extras["regen_vs_reference_measured"] = round(
                    decode_sps / ref["decode_seqs_per_sec"], 1
                )
            else:
                extras["regen_vs_reference_est"] = round(decode_sps / 30.0, 1)
            extras["regen_decode_bf16_seqs_per_sec"] = round(
                bench_decode(n_items, seqs, precision="bf16"), 1)
        except Exception as e:
            extras["decode_error"] = str(e)[:120]
    if args.stress:
        try:
            extras.update(bench_stress())
        except Exception as e:
            extras["stress_error"] = str(e)[:160]

    ref = measured_reference()
    if ref.get("train_seqs_per_sec"):
        extras["reference_cpu_measured_seqs_per_sec"] = round(
            ref["train_seqs_per_sec"], 1
        )
        extras["vs_reference_cpu_measured"] = round(
            train_sps / ref["train_seqs_per_sec"], 1
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="training throughput only")
    parser.add_argument("--stress", action="store_true",
                        help="also run the L=512/D=256/1M-item scale demo")
    parser.add_argument("--no-health-check", action="store_true",
                        help="skip the subprocess backend probe (CI/CPU)")
    args = parser.parse_args()

    extras = {}
    if not args.no_health_check and not wait_for_backend():
        # a hung axon init would block in-process forever and emit nothing;
        # fall back to CPU so the driver still gets an honest (labeled) line
        extras["backend_unavailable"] = True
        print(f"# backend unavailable after retries; JAX_PLATFORMS="
              f"{os.environ.get('JAX_PLATFORMS')!r}; falling back to CPU",
              file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
    error = None
    try:
        run_benchmarks(args, extras)
    except Exception as e:  # emit whatever completed (VERDICT r2 weak-#1)
        error = f"{type(e).__name__}: {e}"

    name, train_sps = extras.pop("_primary", ("unmeasured", 0.0))
    # regression tripwire vs the prior round's committed bench record
    # (VERDICT r3 next-#4): compare like with like — the per-step number
    # against r3's per-step headline — and surface the ratio + repeat spread
    # so tunnel noise vs real regression is decidable from the artifact.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_r03.json")) as f:
            prior = json.load(f)
        if "value" not in prior and "tail" in prior:
            # the driver wraps the metric line in {"n","cmd","rc","tail"}
            for line in reversed(prior["tail"].strip().splitlines()):
                if line.startswith("{"):
                    prior = json.loads(line)
                    break
        prior_val = float(prior.get("value", 0.0))
        per_step = extras.get("train_seqs_per_sec_per_step_dispatch")
        if prior_val > 0 and per_step:
            extras["regression_vs"] = {
                "round": "r03", "prior_per_step_sps": prior_val,
                "ratio_per_step": round(per_step / prior_val, 3),
            }
    except Exception:
        pass
    out = {
        "metric": f"train_seqs_per_sec_sasrec_{name}",
        "value": round(train_sps, 1),
        "unit": "seqs/s",
        # vs the reference's published GPU epoch time (poster); the measured
        # CPU ratio is in extras
        "vs_baseline": round(train_sps / REFERENCE_SEQS_PER_SEC, 3),
        "extras": extras,
    }
    if error:
        out["error"] = error[:300]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Stress-shape profile + per-op roofline (VERDICT r4 next-#4).

Times the B128/L512/D256/1M-item SASRec train step AND its components
(flash attention fwd/bwd, the transformer matmul stack, embedding+scoring)
separately, in fp32 and bf16, and captures a ``jax.profiler`` trace of the
full step. The decomposition is the committed evidence for where the stress
step's time goes (docs/PERFORMANCE.md's HBM-bound claim was analytic only).

  python scripts/stress_profile.py [--trace-dir saved/profile_r5] \
      [--out results_stress_profile.json]

Run alone on the chip (timing work must not share the axon tunnel).
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

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49e12  # ~bf16/4: f32 operands take multiple MXU passes
V5E_HBM_GBPS = 819e9


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def attention_component(b, h, l, dh, dtype):
    """fwd+bwd through the differentiable flash kernel (the train step's
    attention cost for one layer, both passes)."""
    from dr4sr_tpu.ops.attention import _flash_diff

    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.normal(size=(b, h, l, dh)), dtype)
               for _ in range(3))
    mask = jnp.zeros((b, l), bool)

    @jax.jit
    def fwd_bwd(q, k, v):
        def f(q, k, v):
            return jnp.sum(_flash_diff(q, k, v, mask, True).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    dt = timeit(fwd_bwd, q, k, v)
    # matmul FLOPs: fwd 2·(QK^T + PV) = 4·b·h·l²·dh; bwd recompute s + 4
    # grad matmuls ≈ 10·b·h·l²·dh; total 14·b·h·l²·dh MACs → ×2 FLOPs
    flops = 2 * 14 * b * h * l * l * dh
    # HBM floor: q,k,v,o,do in + dq,dk,dv out (+ fwd writes o) once each
    bytes_ = (9 + 1) * b * h * l * dh * np.dtype(
        np.float32 if dtype == jnp.float32 else np.float16).itemsize
    return dt, flops, bytes_


def matmul_stack_component(b, l, d, f, dtype):
    """The per-layer projection+FFN matmuls (QKV, out, FFN up/down) fwd+bwd
    as plain XLA matmuls — the MXU-friendly bulk of the model."""
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(b * l, d)), dtype)
    w_qkv = jnp.asarray(r.normal(size=(d, 3 * d)) / np.sqrt(d), dtype)
    w_o = jnp.asarray(r.normal(size=(d, d)) / np.sqrt(d), dtype)
    w_up = jnp.asarray(r.normal(size=(d, f)) / np.sqrt(d), dtype)
    w_dn = jnp.asarray(r.normal(size=(f, d)) / np.sqrt(f), dtype)

    @jax.jit
    def fwd_bwd(x, w_qkv, w_o, w_up, w_dn):
        def fn(x, w_qkv, w_o, w_up, w_dn):
            y = x @ w_qkv
            y = y[:, :d] @ w_o
            y = jax.nn.gelu(y @ w_up) @ w_dn
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.grad(fn, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_o, w_up, w_dn)

    dt = timeit(fwd_bwd, x, w_qkv, w_o, w_up, w_dn)
    macs = b * l * (d * 3 * d + d * d + 2 * d * f)
    return dt, 3 * 2 * macs  # fwd + 2x bwd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="results_stress_profile.json")
    parser.add_argument("--trace-dir", default="saved/profile_r5")
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    b, h, l, dh, d, f = 128, 4, 512, 64, 256, 1024
    layers = 2
    results = {"shape": f"B{b} H{h} L{l} Dh{dh} D{d} F{f} x{layers}L",
               "device": str(jax.devices()[0]), "components": {}}

    for dtype, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        dt, fl, by = attention_component(b, h, l, dh, dtype)
        results["components"][f"attention_fwd_bwd_{name}"] = {
            "ms": round(dt * 1e3, 3),
            "tflops_per_sec": round(fl / dt / 1e12, 2),
            "pct_of_bf16_peak": round(100 * fl / dt / V5E_BF16_PEAK, 1),
            "pct_of_f32_peak": round(100 * fl / dt / V5E_F32_PEAK, 1),
            "hbm_floor_ms": round(by / V5E_HBM_GBPS * 1e3, 3),
        }
        dt2, fl2 = matmul_stack_component(b, l, d, f, dtype)
        results["components"][f"matmul_stack_{name}"] = {
            "ms": round(dt2 * 1e3, 3),
            "tflops_per_sec": round(fl2 / dt2 / 1e12, 2),
            "pct_of_bf16_peak": round(100 * fl2 / dt2 / V5E_BF16_PEAK, 1),
        }
        print(name, json.dumps(results["components"], indent=1)[-400:],
              flush=True)

    # full stress train step (bench.py's exact workload) + profiler trace
    import bench as bench_mod

    res = bench_mod.bench_stress(n_steps=10)
    results["stress_bench"] = res
    # one traced window of the full step for the committed artifact
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        bench_mod.bench_stress(n_steps=3)
    results["trace_dir"] = args.trace_dir

    with open(os.path.join(REPO, args.out), "w") as fjson:
        json.dump(results, fjson, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

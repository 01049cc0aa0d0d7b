"""Kernel parity ON THE CHIP: Pallas flash attention fwd+bwd, the
DFT-operator FilterLayer, fused masked top-k, and the KV-cached decoder —
each checked against a host-numpy / pure-jnp oracle evaluated on CPU-side
values. These are exactly the kernels whose interpret-mode passes hid real
lowering failures in round 1 (see docs in tests_tpu/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np


def _np_attention(q, k, v, pad_mask, causal):
    """Host-numpy oracle. q,k,v: [B,H,L,Dh]; pad_mask [B,L] True=pad."""
    b, h, l, dh = q.shape
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
    if causal:
        tri = np.triu(np.ones((l, l), bool), 1)
        scores = np.where(tri[None, None], -np.inf, scores)
    scores = np.where(pad_mask[:, None, None, :], -np.inf, scores)
    m = np.max(scores, -1, keepdims=True)
    e = np.exp(scores - np.where(np.isfinite(m), m, 0.0))
    e = np.where(np.isfinite(scores), e, 0.0)
    p = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def _rand_qkv(rng, b=4, h=2, l=64, dh=32):
    q, k, v = (rng.standard_normal((b, h, l, dh)).astype(np.float32) * 0.5
               for _ in range(3))
    pad = np.zeros((b, l), bool)
    pad[0, 50:] = True
    pad[2, 10:] = True
    return q, k, v, pad


def test_flash_attention_forward_on_chip():
    # TPU f32 matmuls run with bf16 MXU passes at default precision (observed
    # max|Δ| ≈ 4e-3 vs a float64 host oracle). Request full-precision passes
    # and keep a tolerance that still catches real lowering bugs (masking,
    # off-by-one, NaN), which produce O(1) errors.
    from dr4sr_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    q, k, v, pad = _rand_qkv(rng)
    with jax.default_matmul_precision("highest"):
        for causal in (True, False):
            out = flash_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(pad), causal=causal,
            )
            ref = _np_attention(q, k, v, pad, causal)
            np.testing.assert_allclose(np.asarray(out), ref, atol=6e-3)
            assert np.isfinite(np.asarray(out)).all()


def test_flash_attention_backward_on_chip():
    """Gradients of the custom-VJP Pallas path vs gradients of the jnp
    reference path, both evaluated on the chip."""
    from dr4sr_tpu.ops.attention import mha_reference, multihead_attention

    rng = np.random.default_rng(1)
    q, k, v, pad = _rand_qkv(rng)
    jq, jk, jv, jpad = map(jnp.asarray, (q, k, v, pad))

    def loss_pallas(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, key_padding_mask=jpad,
                                           causal=True, use_pallas=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, jpad, causal=True) ** 2)

    with jax.default_matmul_precision("highest"):
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(jq, jk, jv)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(jq, jk, jv)
    # both paths on-chip; residual difference is MXU pass ordering (bf16-pass
    # scale ≈ 4e-3 at default precision, far below a real VJP bug's O(1))
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=6e-3, rtol=6e-3)


def test_filter_layer_dft_matches_host_fft():
    """The all-real DFT-operator FilterLayer (the chip path — jnp.fft is
    UNIMPLEMENTED on this backend) equals the fft formulation computed
    host-side."""
    from dr4sr_tpu.modules.layers import FilterLayer

    rng = np.random.default_rng(2)
    b, l, d = 4, 50, 64
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    layer = FilterLayer(max_seq_len=l, embed_dim=d, dropout=0.0, use_fft=False)
    with jax.default_matmul_precision("highest"):
        variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = layer.apply(variables, jnp.asarray(x))

    w = np.asarray(variables["params"]["complex_weight"])
    filt = w[..., 0] + 1j * w[..., 1]  # [1, freq, D]
    fx = np.fft.rfft(x, axis=1, norm="ortho")
    y = np.fft.irfft(fx * filt[:, : fx.shape[1]], n=l, axis=1, norm="ortho")
    # host LayerNorm residual
    h = y + x
    mu = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    scale = np.asarray(variables["params"]["LayerNorm_0"]["scale"])
    bias = np.asarray(variables["params"]["LayerNorm_0"]["bias"])
    expect = (h - mu) / np.sqrt(var + 1e-12) * scale + bias
    # three chained DFT einsums on the MXU: bf16-pass rounding ≈ 5e-4 at
    # default precision (LayerNorm divides it away only partially)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1.5e-3)


def test_masked_topk_on_chip():
    from dr4sr_tpu.ops.topk import masked_topk_scores

    rng = np.random.default_rng(3)
    b, n, d, k = 8, 500, 32, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    keep = rng.random(n) > 0.3
    keep[0] = False
    hist = rng.integers(0, n, (b, 5)).astype(np.int32)
    scores, items = masked_topk_scores(
        jnp.asarray(q), jnp.asarray(emb), k,
        item_keep_mask=jnp.asarray(keep), user_hist=jnp.asarray(hist),
    )
    ref = q @ emb.T
    ref[:, ~keep] = -np.inf
    for i in range(b):
        ref[i, hist[i]] = -np.inf
    order = np.argsort(-ref, axis=1)[:, :k]
    np.testing.assert_array_equal(np.sort(np.asarray(items), 1),
                                  np.sort(order, 1))


def test_kv_cached_decode_on_chip():
    """The KV-cached greedy decoder produces identical tokens to the
    full-buffer recompute path on the real backend (fori_loop + dynamic
    slices + cache updates all lower)."""
    from dr4sr_tpu.regen.decode import (
        greedy_decode_batch,
        greedy_decode_batch_cached,
    )
    from dr4sr_tpu.regen.generator import Generator

    num_items = 50
    gen = Generator(num_items=num_items, k=2, dropout=0.0)
    rng = jax.random.PRNGKey(7)
    host = np.random.default_rng(4)
    b, ls = 32, 14
    src = np.zeros((b, ls), np.int32)
    for i in range(b):
        n = host.integers(2, 10)
        items = host.choice(np.arange(1, num_items), size=n, replace=False)
        src[i, : n + 2] = [num_items, *items, num_items + 1]
    cond = host.integers(0, 2, size=b).astype(np.int32)
    variables = gen.init(
        {"params": rng, "dropout": rng, "gumbel": rng},
        jnp.asarray(src), jnp.asarray(src[:, :-1]),
        jnp.full((b,), 5), jnp.asarray(1.0),
    )
    r = jax.random.PRNGKey(9)
    full = greedy_decode_batch(gen, variables, jnp.asarray(src),
                               jnp.asarray(cond), r, max_len=12, gamma=0.5)
    cached = greedy_decode_batch_cached(gen, variables, jnp.asarray(src),
                                        jnp.asarray(cond), r, max_len=12,
                                        gamma=0.5)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))


def test_flash_attention_bf16_io_on_chip():
    """Round 3 adds bf16 mixed-precision training: the Pallas kernel must
    accept bfloat16 q/k/v on hardware (f32 accumulate inside, bf16 out)."""
    from dr4sr_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(3)
    q, k, v, pad = _rand_qkv(rng)
    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    out = flash_attention(qb, kb, vb, jnp.asarray(pad), causal=True)
    assert out.dtype == jnp.bfloat16
    ref = _np_attention(q, k, v, pad, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, atol=3e-2)  # bf16 io rounding
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # backward also lowers with bf16 io (multihead_attention is the
    # custom-VJP entry point; raw flash_attention has no grad rule)
    from dr4sr_tpu.ops.attention import multihead_attention

    def loss(a, b, c):
        return jnp.sum(multihead_attention(
            a, b, c, key_padding_mask=jnp.asarray(pad), causal=True,
            use_pallas=True).astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
    for g in grads:
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_ring_attention_lowers_on_chip():
    """Ring attention on the real backend (VERDICT r3 next-#5). Only ONE
    chip is reachable through the tunnel, so the ring degenerates to a
    single-device mesh — this still exercises the shard_map + online-softmax
    body lowering on hardware (the multi-device ring math is parity-tested
    4/8-way on the CPU mesh in tests/test_ring_attention.py)."""
    from jax.sharding import Mesh

    from dr4sr_tpu.ops.attention import mha_reference
    from dr4sr_tpu.ops.ring_attention import ring_attention

    rng = np.random.default_rng(11)
    q, k, v, pad = _rand_qkv(rng)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("model",))
    with jax.default_matmul_precision("highest"):
        out = ring_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(pad), causal=True, mesh=mesh, axis_name="model",
        )
        ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(pad), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-3, rtol=6e-3)


def test_approx_topk_recall_and_speed_at_1m_items():
    """eval.topk_method=approx at the 1M-item stress shape: measure actual
    recall@100 vs the exact path and the wall-clock ratio on the chip —
    the CPU test proves only the contract (approx lowers to exact there);
    this is the real quality/throughput tradeoff (VERDICT r3 missing-#3)."""
    import time

    from dr4sr_tpu.ops.topk import masked_topk_scores

    rng = np.random.default_rng(12)
    b, n, d, k = 128, 1_000_000, 256, 100
    q = rng.standard_normal((b, d)).astype(np.float32)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    jq, jemb = jnp.asarray(q), jnp.asarray(emb)
    keep = jnp.ones((n,), bool).at[0].set(False)

    @jax.jit
    def run_exact(q, e):
        return masked_topk_scores(q, e, k, item_keep_mask=keep,
                                  method="exact")

    @jax.jit
    def run_approx(q, e):
        return masked_topk_scores(q, e, k, item_keep_mask=keep,
                                  method="approx")

    _, it_exact = run_exact(jq, jemb)
    _, it_approx = run_approx(jq, jemb)
    jax.block_until_ready((it_exact, it_approx))

    t0 = time.perf_counter()
    for _ in range(5):
        _, a = run_exact(jq, jemb)
    jax.block_until_ready(a)
    dt_exact = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        _, a = run_approx(jq, jemb)
    jax.block_until_ready(a)
    dt_approx = (time.perf_counter() - t0) / 5

    ex = np.asarray(it_exact)
    ap = np.asarray(it_approx)
    recall = np.mean([
        len(set(ex[i]) & set(ap[i])) / k for i in range(b)
    ])
    print(f"\nAPPROX_TOPK_1M: recall@{k}={recall:.4f} "
          f"exact_ms={1000*dt_exact:.2f} approx_ms={1000*dt_approx:.2f} "
          f"speedup={dt_exact/dt_approx:.2f}x")
    # approx_max_k is spec'd at recall_target=0.95 per reduced row; demand a
    # conservative floor so a broken lowering (recall ~ k/n) fails loudly
    assert recall >= 0.9

"""Pooling, GRU, FMLP-filter and augmentation behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from dr4sr_tpu.modules.augmentation import item_crop, item_mask, item_reorder
from dr4sr_tpu.modules.layers import GRUStack, FilterLayer, seq_pooling


def test_seq_pooling_types(rng):
    B, L, D = 3, 6, 4
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    seqlen = jnp.asarray([6, 3, 1])
    last = seq_pooling(x, seqlen, "last")
    np.testing.assert_allclose(np.asarray(last[0]), np.asarray(x[0, 5]))
    np.testing.assert_allclose(np.asarray(last[1]), np.asarray(x[1, 2]))
    origin = seq_pooling(x, seqlen, "origin")
    assert np.allclose(np.asarray(origin[1, 3:]), 0.0)
    mean = seq_pooling(x, seqlen, "mean")
    np.testing.assert_allclose(
        np.asarray(mean[1]), np.asarray(x[1, :3]).mean(0), rtol=1e-5
    )
    s = seq_pooling(x, seqlen, "sum")
    np.testing.assert_allclose(np.asarray(s[2]), np.asarray(x[2, 0]), rtol=1e-5)


def test_gru_matches_manual_recurrence(rng):
    B, L, Din, H = 2, 5, 3, 4
    x = jnp.asarray(rng.normal(size=(B, L, Din)).astype(np.float32))
    gru = GRUStack(hidden_dim=H, num_layers=1)
    params = gru.init(jax.random.PRNGKey(0), x)
    out = gru.apply(params, x)
    wi = np.asarray(params["params"]["cell_0_wi"]["kernel"])  # [Din, 3H]
    wh = np.asarray(params["params"]["cell_0"]["wh"]["kernel"])  # [H, 3H]

    def sigmoid(a):
        return 1.0 / (1.0 + np.exp(-a))

    h = np.zeros((B, H), np.float32)
    outs = []
    for t in range(L):
        gi = np.asarray(x[:, t]) @ wi
        gh = h @ wh
        r = sigmoid(gi[:, :H] + gh[:, :H])
        z = sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        n = np.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        h = (1 - z) * n + z * h
        outs.append(h.copy())
    manual = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-5)


def test_filter_layer_identity_at_unit_filter(rng):
    """With the complex filter == 1, rfft->irfft is the identity, so the
    layer reduces to LayerNorm(x + x) up to numerics."""
    B, L, D = 2, 8, 4
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    layer = FilterLayer(max_seq_len=L, embed_dim=D, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(0), x)
    w = np.zeros((1, L // 2 + 1, D, 2), np.float32)
    w[..., 0] = 1.0  # real part 1 -> identity filter
    params = {"params": {**params["params"], "complex_weight": jnp.asarray(w)}}
    out = layer.apply(params, x)
    # LayerNorm(2x) == LayerNorm(x) (affine-invariant to scaling)
    import flax.linen as nn

    expect = nn.LayerNorm(epsilon=1e-12).init_with_output(jax.random.PRNGKey(0), x)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


# ---------------------------------------------------------------------------
# augmentation property tests (reference semantics: module/data_augmentation.py)
# ---------------------------------------------------------------------------


def _batch(rng, B=8, L=12):
    seqlen = rng.integers(2, L + 1, size=B).astype(np.int32)
    seq = np.zeros((B, L), np.int32)
    for i in range(B):
        seq[i, : seqlen[i]] = rng.integers(1, 100, size=seqlen[i])
    return jnp.asarray(seq), jnp.asarray(seqlen)


def test_item_crop_properties(rng):
    seq, seqlen = _batch(rng)
    out, out_len = item_crop(jax.random.PRNGKey(1), seq, seqlen, tao=0.5)
    out, out_len = np.asarray(out), np.asarray(out_len)
    for i in range(len(out)):
        n = int(np.asarray(seqlen)[i])
        expect = max(1, int(0.5 * n))
        assert out_len[i] == expect
        assert (out[i, :expect] != 0).all()
        assert (out[i, expect:] == 0).all()
        # cropped tokens are a contiguous subsequence of the original
        s = list(np.asarray(seq)[i, :n])
        sub = list(out[i, :expect])
        assert any(s[j : j + expect] == sub for j in range(n - expect + 1))


def test_item_mask_properties(rng):
    seq, seqlen = _batch(rng)
    out, out_len = item_mask(jax.random.PRNGKey(2), seq, seqlen, gamma=0.5, mask_id=999)
    out = np.asarray(out)
    assert (np.asarray(out_len) == np.asarray(seqlen)).all()
    for i in range(len(out)):
        n = int(np.asarray(seqlen)[i])
        n_masked = int((out[i, :n] == 999).sum())
        assert n_masked == int(0.5 * n)
        # untouched elsewhere
        keep = out[i, :n] != 999
        assert (out[i, :n][keep] == np.asarray(seq)[i, :n][keep]).all()
        assert (out[i, n:] == np.asarray(seq)[i, n:]).all()


def test_item_reorder_properties(rng):
    seq, seqlen = _batch(rng)
    out, out_len = item_reorder(jax.random.PRNGKey(3), seq, seqlen, beta=0.5)
    out = np.asarray(out)
    assert (np.asarray(out_len) == np.asarray(seqlen)).all()
    for i in range(len(out)):
        n = int(np.asarray(seqlen)[i])
        # multiset preserved; padding untouched
        assert sorted(out[i, :n]) == sorted(np.asarray(seq)[i, :n])
        assert (out[i, n:] == 0).all()


def test_filter_layer_matmul_matches_fft(rng):
    """The MXU linear-operator formulation equals the FFT path."""
    B, L, D = 3, 10, 6
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    fft_layer = FilterLayer(max_seq_len=L, embed_dim=D, dropout=0.0, use_fft=True)
    mm_layer = FilterLayer(max_seq_len=L, embed_dim=D, dropout=0.0, use_fft=False)
    params = fft_layer.init(jax.random.PRNGKey(3), x)
    a = fft_layer.apply(params, x)
    b = mm_layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # grads agree too
    ga = jax.grad(lambda p: jnp.sum(fft_layer.apply(p, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(mm_layer.apply(p, x) ** 2))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-3)


def test_encoder_remat_parity():
    """model.remat recomputes block activations on the backward pass without
    changing values: loss and grads match the non-remat encoder exactly."""
    import numpy as np
    from dr4sr_tpu.modules.layers import TransformerEncoder

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 12, 32)),
                    jnp.float32)
    pad = jnp.zeros((4, 12), bool).at[1, 8:].set(True)

    def make(remat):
        enc = TransformerEncoder(num_layers=2, embed_dim=32, num_heads=2,
                                 ffn_dim=64, dropout=0.0, remat=remat)
        variables = enc.init(jax.random.PRNGKey(0), x, pad)
        return enc, variables

    enc0, v0 = make(False)
    enc1, v1 = make(True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v0, v1)

    def loss(enc, v):
        return lambda p: jnp.sum(enc.apply({"params": p}, x, pad) ** 2)

    l0, g0 = jax.value_and_grad(loss(enc0, v0))(v0["params"])
    l1, g1 = jax.value_and_grad(loss(enc1, v1))(v1["params"])
    assert float(l0) == float(l1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        g0, g1)

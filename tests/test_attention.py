"""Pallas flash-attention parity vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr4sr_tpu.ops.attention import flash_attention, mha_reference


def _rand_qkv(rng, b, h, l, d):
    q = rng.normal(size=(b, h, l, d)).astype(np.float32)
    k = rng.normal(size=(b, h, l, d)).astype(np.float32)
    v = rng.normal(size=(b, h, l, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_reference(rng, causal):
    b, h, l, d = 2, 2, 50, 32
    q, k, v = _rand_qkv(rng, b, h, l, d)
    seqlen = np.array([50, 17])
    mask = jnp.asarray(np.arange(l)[None, :] >= seqlen[:, None])
    ref = mha_reference(q, k, v, mask, causal=causal)
    out = flash_attention(q, k, v, mask, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_long_sequence_blocks(rng):
    # sequence longer than one k block exercises the online-softmax loop
    b, h, l, d = 1, 1, 300, 16
    q, k, v = _rand_qkv(rng, b, h, l, d)
    mask = jnp.zeros((b, l), bool)
    ref = mha_reference(q, k, v, mask, causal=True)
    out = flash_attention(q, k, v, mask, causal=True, block_q=64, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fully_masked_rows_are_zero(rng):
    b, h, l, d = 1, 1, 8, 8
    q, k, v = _rand_qkv(rng, b, h, l, d)
    mask = jnp.ones((b, l), bool)  # everything padded
    ref = mha_reference(q, k, v, mask, causal=True)
    out = flash_attention(q, k, v, mask, causal=True, interpret=True)
    assert np.allclose(np.asarray(ref), 0.0)
    assert np.allclose(np.asarray(out), 0.0)


def test_reference_grads_finite(rng):
    b, h, l, d = 1, 1, 12, 8
    q, k, v = _rand_qkv(rng, b, h, l, d)
    mask = jnp.asarray(np.arange(l)[None, :] >= 5)

    def f(q):
        return jnp.sum(mha_reference(q, k, v, mask, causal=True) ** 2)

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("causal", [True, False])
def test_flash_backward_matches_reference_vjp(rng, causal):
    from dr4sr_tpu.ops.attention import flash_attention_bwd

    b, h, l, d = 2, 2, 50, 32
    q, k, v = _rand_qkv(rng, b, h, l, d)
    seqlen = np.array([50, 23])
    mask = jnp.asarray(np.arange(l)[None, :] >= seqlen[:, None])
    g = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))

    o, vjp = jax.vjp(lambda q_, k_, v_: mha_reference(q_, k_, v_, mask, causal), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = flash_attention_bwd(q, k, v, o, g, mask, causal=causal,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=3e-4)


def test_flash_backward_long_sequence(rng):
    from dr4sr_tpu.ops.attention import flash_attention_bwd

    b, h, l, d = 1, 1, 200, 16
    q, k, v = _rand_qkv(rng, b, h, l, d)
    mask = jnp.zeros((b, l), bool)
    g = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    o, vjp = jax.vjp(lambda q_, k_, v_: mha_reference(q_, k_, v_, mask, True), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = flash_attention_bwd(q, k, v, o, g, mask, causal=True,
                                     block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=3e-4)


def test_flash_bf16_operands_fwd_bwd(rng):
    """bf16 inputs take the bf16-MXU-operand path (round-5 MFU work): both
    kernels must stay within bf16 rounding of the f32 reference, and the
    f32 path must remain bit-for-bit what it was (covered by the tests
    above — this one pins the new branch)."""
    from dr4sr_tpu.ops.attention import flash_attention_bwd

    b, h, l, d = 2, 2, 50, 32
    q, k, v = _rand_qkv(rng, b, h, l, d)
    seqlen = np.array([50, 23])
    mask = jnp.asarray(np.arange(l)[None, :] >= seqlen[:, None])
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    ref = mha_reference(q, k, v, mask, causal=True)
    out = flash_attention(qb, kb, vb, mask, causal=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2)

    g = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    o, vjp = jax.vjp(
        lambda q_, k_, v_: mha_reference(q_, k_, v_, mask, True), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = flash_attention_bwd(
        qb, kb, vb, o.astype(jnp.bfloat16), g.astype(jnp.bfloat16), mask,
        causal=True, interpret=True)
    assert dq.dtype == jnp.bfloat16
    for got, want in ((dq, dq_ref), (dk, dk_ref), (dv, dv_ref)):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=8e-2)

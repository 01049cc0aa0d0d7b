"""The dataset regenerator — a diversity-promoted seq2seq transformer.

Behavioral spec from the reference (``2.Pretrain_regenerator.py:95-216``):

* shared item embedding (catalog + SOS=num_items, EOS=num_items+1 rows),
  initialized from a pre-trained SASRec item table (``load_pretrained``);
* encoder (2 layers, d=64, h=2, ffn=256, post-norm, **causal** during
  training — a reference quirk we reproduce; non-causal at inference like
  ``translate``'s zero src_mask);
* **diversity promoter**: ``condition_linear`` projects the encoder memory
  into K latent memories [B, L, K, D]; a ``ConditionEncoder`` (2-layer
  transformer over the *target*, mean-pool, MLP → K, gumbel-softmax with
  annealed τ) picks the memory mixture during training; at inference the
  condition k is forced per decode lane;
* decoder (2 layers) with cross-attention over the mixed memory; logits are
  tied to the embedding (``out @ E.T``) and restricted to source items
  (``condition_mask``);
* loss: CE(ignore PAD=0) + entropy regularizer on the condition probs.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dr4sr_tpu.models.base import embedding_init, normal_init
from dr4sr_tpu.modules.layers import (
    MLP,
    TransformerDecoder,
    TransformerEncoder,
    seq_pooling,
)

NEG = -1e30


class ConditionEncoder(nn.Module):
    """Target-side condition picker (reference ``ConditionEncoder``)."""

    k: int
    embed_dim: int = 64
    num_heads: int = 2
    ffn_dim: int = 256
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        tgt_emb: jax.Array,  # [B, Lt, D]
        tgt_padding_mask: jax.Array,  # [B, Lt] True = pad
        tgt_seqlen: jax.Array,  # [B]
        tau: jax.Array,  # scalar gumbel temperature (annealed by the caller)
        rng: Optional[jax.Array],
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        out = TransformerEncoder(
            num_layers=2,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            dropout=self.dropout,
            activation="gelu",
            layer_norm_eps=1e-12,
            name="encoder",
        )(tgt_emb, key_padding_mask=tgt_padding_mask, causal=True,
          deterministic=deterministic)
        pooled = seq_pooling(out, tgt_seqlen, "mean")  # [B, D]
        logits = MLP((self.embed_dim, self.k), name="condition_layer")(pooled)  # [B, K]
        if rng is not None:
            g = jax.random.gumbel(rng, logits.shape)
            cond = jax.nn.softmax((logits + g) / tau, axis=-1)
        else:
            cond = jax.nn.softmax(logits / tau, axis=-1)
        return cond, logits


class Generator(nn.Module):
    """Seq2seq regenerator with K-way conditioned memory."""

    num_items: int  # catalog size (PAD..num_items-1); SOS/EOS appended
    k: int = 5
    embed_dim: int = 64
    num_heads: int = 2
    num_layers: int = 2
    ffn_dim: int = 256
    dropout: float = 0.5
    max_len: int = 64

    @property
    def sos(self) -> int:
        return self.num_items

    @property
    def eos(self) -> int:
        return self.num_items + 1

    def setup(self):
        self.item_embedding = nn.Embed(
            self.num_items + 2, self.embed_dim, embedding_init=embedding_init
        )
        self.position_embedding = nn.Embed(
            self.max_len, self.embed_dim, embedding_init=normal_init
        )
        self.encoder = TransformerEncoder(
            num_layers=self.num_layers,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            dropout=self.dropout,
            activation="gelu",
            layer_norm_eps=1e-12,
        )
        self.decoder = TransformerDecoder(
            num_layers=self.num_layers,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            dropout=self.dropout,
            activation="gelu",
            layer_norm_eps=1e-12,
        )
        self.condition_linear = MLP(
            (self.embed_dim * self.k, self.embed_dim * self.k)
        )
        self.condition_encoder = ConditionEncoder(
            self.k, self.embed_dim, self.num_heads, self.ffn_dim, self.dropout
        )
        self.input_dropout = nn.Dropout(self.dropout)

    # ----------------------------------------------------------------- pieces
    def embed(self, tokens: jax.Array, deterministic: bool) -> jax.Array:
        l = tokens.shape[1]
        x = self.item_embedding(tokens) + self.position_embedding(
            jnp.arange(l)[None, :]
        )
        return self.input_dropout(x, deterministic=deterministic)

    def encode(
        self, src: jax.Array, causal: bool, deterministic: bool = True
    ) -> jax.Array:
        """Encoder memory [B, Ls, D]. Training uses causal=True (reference
        quirk); inference uses causal=False (zero src_mask in translate)."""
        x = self.embed(src, deterministic)
        return self.encoder(
            x, key_padding_mask=src == 0, causal=causal,
            deterministic=deterministic,
        )

    def conditioned_memory(self, memory: jax.Array) -> jax.Array:
        """[B, L, D] -> [B, L, K, D] latent memories."""
        b, l, d = memory.shape
        return self.condition_linear(memory).reshape(b, l, self.k, d)

    def logits_from(self, out: jax.Array) -> jax.Array:
        table = self.item_embedding.embedding  # [N+2, D]
        return jnp.dot(out, table.T, preferred_element_type=jnp.float32)

    # ------------------------------------------------------------------ train
    def __call__(
        self,
        src: jax.Array,  # [B, Ls] with SOS/EOS framing
        tgt_in: jax.Array,  # [B, Lt] target input (starts with SOS)
        tgt_seqlen: jax.Array,  # [B]
        tau: jax.Array,
        training: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (logits [B, Lt, N+2] restricted to src items, condition
        probs [B, K])."""
        deterministic = not training
        memory = self.encode(src, causal=True, deterministic=deterministic)
        mem_k = self.conditioned_memory(memory)

        tgt_emb = self.embed(tgt_in, deterministic)
        rng = self.make_rng("gumbel") if training else None
        cond, _ = self.condition_encoder(
            tgt_emb, tgt_in == 0, tgt_seqlen, tau, rng, deterministic
        )  # [B, K]
        memory_cond = jnp.einsum("blkd,bk->bld", mem_k, cond)

        out = self.decoder(
            tgt_emb,
            memory_cond,
            tgt_key_padding_mask=tgt_in == 0,
            memory_key_padding_mask=src == 0,
            causal=True,
            deterministic=deterministic,
        )
        logits = self.logits_from(out)
        # restrict predictions to items present in the source (condition_mask)
        keep = jnp.zeros(logits.shape, bool).at[
            jnp.arange(src.shape[0])[:, None, None],
            jnp.arange(tgt_in.shape[1])[None, :, None],
            src[:, None, :],
        ].set(True)
        logits = jnp.where(keep, logits, NEG)
        return logits, cond

    # -------------------------------------------------------------- inference
    def decode_state(
        self,
        src: jax.Array,  # [B, Ls] SOS/EOS-framed, 0-padded
        condition: jax.Array,  # [B] int condition index per lane
    ):
        """Once-per-decode setup for the KV-cached path: encode (non-causal,
        like ``translate``'s zero src_mask), pick the per-lane conditioned
        memory, and project per-layer cross-attention K/V — the projections
        the full-buffer path recomputed every step. Returns
        (mem_k, mem_v) each [num_layers, B, Ls, D]."""
        memory = self.encode(src, causal=False, deterministic=True)
        mem_k = self.conditioned_memory(memory)
        memory_cond = jnp.take_along_axis(
            mem_k, condition[:, None, None, None], axis=2
        )[:, :, 0]
        return self.decoder.project_memory(memory_cond)

    def cached_decode_step(
        self,
        tok: jax.Array,  # [B] token at position `pos`
        pos: jax.Array,  # scalar int32
        cache_k: jax.Array,  # [nl, B, Lmax, D] self-attn caches
        cache_v: jax.Array,
        mem_k: jax.Array,  # [nl, B, Ls, D] from decode_state
        mem_v: jax.Array,
        memory_valid: jax.Array,  # [B, Ls] True = real src position
    ):
        """Incremental decoder step (SURVEY §3.4): O(pos) attention against
        the K/V caches instead of re-running the decoder over the whole
        buffer. Returns (logits [B, V], cache_k, cache_v)."""
        x = self.item_embedding(tok) + self.position_embedding(pos)
        y, cache_k, cache_v = self.decoder.step(
            x, cache_k, cache_v, pos, mem_k, mem_v, memory_valid
        )
        return self.logits_from(y), cache_k, cache_v

    def decode_step(
        self,
        tgt_buf: jax.Array,  # [B, Lmax] current prefix (0-padded)
        memory_k: jax.Array,  # [B, Ls, K, D]
        src_pad: jax.Array,  # [B, Ls] True = pad
        condition: jax.Array,  # [B] int per-lane condition index
        step: jax.Array,  # scalar: index of the position to read
    ) -> jax.Array:
        """One greedy-decode step: returns logits [B, N+2] at ``step``."""
        memory_cond = jnp.take_along_axis(
            memory_k, condition[:, None, None, None], axis=2
        )[:, :, 0]
        tgt_emb = self.embed(tgt_buf, deterministic=True)
        out = self.decoder(
            tgt_emb,
            memory_cond,
            tgt_key_padding_mask=tgt_buf == 0,
            memory_key_padding_mask=src_pad,
            causal=True,
            deterministic=True,
        )
        step_out = jnp.take_along_axis(
            out, step[None, None, None].repeat(out.shape[0], 0), axis=1
        )[:, 0]
        return self.logits_from(step_out)


def generator_loss(
    logits: jax.Array,  # [B, Lt, V]
    targets: jax.Array,  # [B, Lt] (0 = ignore)
    cond: jax.Array,  # [B, K]
    entropy_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """CE(ignore 0) + entropy regularizer (``2.Pretrain_regenerator.py:283-287``)."""
    mask = targets != 0
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(mask.sum(), 1)
    # reference adds reg_loss = -(p·log p).sum().mean() = +H(cond) with weight
    # 1, i.e. minimizes ce + H — entropy is *penalized*, pushing each sample
    # toward a peaked (distinct) condition choice
    ent = -jnp.sum(cond * jnp.log(cond + 1e-12), axis=-1).mean()
    loss = ce + entropy_weight * ent
    return loss, {"ce": ce, "entropy": ent}


def frame_pairs(
    pairs, num_items: int, max_src: int = 52, max_tgt: int = 27
) -> Dict[str, np.ndarray]:
    """(sequence, pattern) pairs -> padded SOS/EOS-framed arrays
    (``2.Pretrain_regenerator.py:49-64``)."""
    sos, eos = num_items, num_items + 1
    n = len(pairs)
    src = np.zeros((n, max_src), np.int32)
    tgt = np.zeros((n, max_tgt), np.int32)
    src_len = np.zeros(n, np.int32)
    tgt_len = np.zeros(n, np.int32)
    for i, (s, t) in enumerate(pairs):
        s = [sos] + list(s)[: max_src - 2] + [eos]
        t = [sos] + list(t)[: max_tgt - 2] + [eos]
        src[i, : len(s)] = s
        tgt[i, : len(t)] = t
        src_len[i] = len(s)
        tgt_len[i] = len(t)
    return {"src": src, "tgt": tgt, "src_len": src_len, "tgt_len": tgt_len}

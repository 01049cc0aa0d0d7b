"""SASRec — causal transformer sequence encoder.

Behavioral spec from the reference ``SASRecQueryEncoder``
(``model/sasrec.py:10-75``): item embedding + learned absolute positions →
dropout → post-norm causal TransformerEncoder with key-padding mask →
pooling ('origin' per-position queries when training, 'last' at eval).
Supports the reference's hooks: ``batch['input_weight']`` multiplier and
``batch['seq_emb']`` direct-embedding injection.

TPU notes: attention runs on the fused Pallas flash kernel; all masking is
boolean (no -inf writes); the whole encoder jits into one program.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from dr4sr_tpu.models.base import embedding_init, normal_init
from dr4sr_tpu.models.registry import register_model
from dr4sr_tpu.modules.layers import TransformerEncoder, seq_pooling
from dr4sr_tpu.parallel.ep import embed_lookup, padded_rows


class SASRecEncoder(nn.Module):
    num_items: int
    embed_dim: int
    max_seq_len: int
    num_heads: int
    hidden_size: int
    num_layers: int
    dropout: float
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12
    bidirectional: bool = False
    training_pooling: str = "origin"
    eval_pooling: str = "last"
    extra_embedding_rows: int = 0  # CL4SRec adds a mask token row
    remat: bool = False

    def setup(self):
        self.item_embedding = nn.Embed(
            padded_rows(self.num_items + self.extra_embedding_rows),
            self.embed_dim,
            embedding_init=embedding_init,
        )
        self.position_emb = nn.Embed(
            self.max_seq_len, self.embed_dim, embedding_init=normal_init
        )
        self.encoder = TransformerEncoder(
            num_layers=self.num_layers,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            ffn_dim=self.hidden_size,
            dropout=self.dropout,
            activation=self.activation,
            layer_norm_eps=self.layer_norm_eps,
            remat=self.remat,
        )
        self.input_dropout = nn.Dropout(self.dropout)

    def __call__(
        self,
        batch: Dict[str, jax.Array],
        training: bool = False,
        need_pooling: bool = True,
    ) -> jax.Array:
        if batch.get("seq_emb") is None:
            seq = batch["in_item_id"]  # [B, L]
            seq_embs = embed_lookup(self.item_embedding, seq)
            key_padding_mask = seq == 0
            l = seq.shape[1]
        else:
            seq_embs = batch["seq_emb"]
            key_padding_mask = batch.get("key_padding_mask")
            l = seq_embs.shape[1]
        positions = jnp.arange(l)[None, :]
        x = seq_embs + self.position_emb(positions)
        if batch.get("input_weight") is not None:
            x = batch["input_weight"][..., None] * x
        x = self.input_dropout(x, deterministic=not training)
        out = self.encoder(
            x,
            key_padding_mask=key_padding_mask,
            causal=not self.bidirectional,
            deterministic=not training,
        )
        if not need_pooling:
            return out
        pooling = self.training_pooling if training else self.eval_pooling
        return seq_pooling(out, batch["seqlen"], pooling)


@register_model("SASRec")
class SASRec:
    """Architecture factory: builds the flax module from a layered config."""

    @staticmethod
    def build(config: Dict[str, Any], num_items: int, **kwargs) -> nn.Module:
        m = config["model"]
        return SASRecEncoder(
            num_items=num_items,
            embed_dim=int(m["embed_dim"]),
            max_seq_len=int(config["data"]["max_seq_len"]),
            num_heads=int(m["head_num"]),
            hidden_size=int(m["hidden_size"]),
            num_layers=int(m["layer_num"]),
            dropout=float(m["dropout_rate"]),
            activation=m.get("activation", "gelu"),
            layer_norm_eps=float(m.get("layer_norm_eps", 1e-12)),
            remat=bool(m.get("remat", False)),
            **kwargs,
        )

"""GRU4Rec — recurrent sequence encoder.

Reference: ``model/gru4rec.py:8-37`` — item embedding → dropout → 2-layer
bias-free GRU (hidden 256) → Linear back to embed_dim; 'origin' pooling for
training, 'last' for eval. The cuDNN recurrence becomes a compiled
``lax.scan`` (see ``modules.layers.GRUStack``).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax

from dr4sr_tpu.models.base import embedding_init, normal_init
from dr4sr_tpu.models.registry import register_model
from dr4sr_tpu.modules.layers import GRUStack, seq_pooling


class GRU4RecEncoder(nn.Module):
    num_items: int
    embed_dim: int
    hidden_size: int
    num_layers: int
    dropout: float

    def setup(self):
        from dr4sr_tpu.parallel.ep import padded_rows

        self.item_embedding = nn.Embed(
            padded_rows(self.num_items), self.embed_dim,
            embedding_init=embedding_init,
        )
        self.gru = GRUStack(self.hidden_size, self.num_layers)
        self.out_proj = nn.Dense(self.embed_dim, kernel_init=normal_init)
        self.input_dropout = nn.Dropout(self.dropout)

    def __call__(
        self,
        batch: Dict[str, jax.Array],
        training: bool = False,
        need_pooling: bool = True,
    ) -> jax.Array:
        from dr4sr_tpu.parallel.ep import embed_lookup

        x = embed_lookup(self.item_embedding, batch["in_item_id"])
        x = self.input_dropout(x, deterministic=not training)
        out = self.out_proj(self.gru(x))
        if not need_pooling:
            return out
        pooling = "origin" if training else "last"
        return seq_pooling(out, batch["seqlen"], pooling)


@register_model("GRU4Rec")
class GRU4Rec:
    @staticmethod
    def build(config: Dict[str, Any], num_items: int, **kwargs) -> nn.Module:
        m = config["model"]
        return GRU4RecEncoder(
            num_items=num_items,
            embed_dim=int(m["embed_dim"]),
            hidden_size=int(m["hidden_size"]),
            num_layers=int(m["layer_num"]),
            dropout=float(m["dropout_rate"]),
        )

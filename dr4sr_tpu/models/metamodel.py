"""MetaModel (DR4SR+) — bilevel per-sample reweighting around any sub-model.

Behavioral spec from the reference ``model/metamodel.py``:

* sub-model is built from its own layered config (``sub_model`` key);
* meta-net = MLP(D → D → 2) over the per-position query + learnable
  temperature τ (init 10, clipped at ``tau_min``); per-position weight =
  ``gumbel_softmax(meta(query), τ)[..., 0]``;
* weights are forced to 1 on pattern rows (user_id == 0) and 0 on padding;
  inner loss = Σ weight · per-position loss (the per-position losses already
  carry the 1/M normalizer from ``reduce=False``);
* inner loop: plain sub-model steps during ``warmup_epoch`` epochs, weighted
  steps after; outer loop every ``interval`` steps: implicit hypergradient of
  an unweighted val-proxy batch loss wrt the meta params (3-term Neumann),
  grad-clip 10, SGD(momentum 0.9)/Adam on meta params.

The trainer below subclasses the base :class:`Trainer`; inner and outer steps
are each one jitted program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dr4sr_tpu.models.registry import register_model


@register_model("MetaModel")
class MetaModel:
    is_meta = True

    @staticmethod
    def build(config, num_items, **kwargs):  # pragma: no cover - not used
        raise RuntimeError("MetaModel is a trainer wrapper; use MetaTrainer")


def gumbel_softmax_weight(
    logits: jax.Array, tau: jax.Array, rng: Optional[jax.Array]
) -> jax.Array:
    """softmax((logits + Gumbel)/τ)[..., 0] (torch ``F.gumbel_softmax`` hard=False)."""
    if rng is not None:
        g = jax.random.gumbel(rng, logits.shape)
        logits = logits + g
    return jax.nn.softmax(logits / tau, axis=-1)[..., 0]



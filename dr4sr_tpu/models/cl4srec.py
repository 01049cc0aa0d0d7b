"""CL4SRec — SASRec + contrastive augmentation loss.

Reference ``model/cl4srec.py`` + ``CL4SRecAugmentation``
(``module/data_augmentation.py:577-619``): per training step, two stochastic
augmentations of each input sequence are encoded (no pooling), mean-pooled,
length-1 sequences dropped, and an InfoNCE ('batch_both', 2B-1 in-batch
negatives) loss is added with weight ``cl_weight``. The item table carries
one extra row — the mask token id == num_items (``model/cl4srec.py:30-32``).

The augmented views run through the same jitted encoder; dropping len-1 rows
becomes a validity mask inside the InfoNCE (fixed shapes under jit).
``CL4SRec2`` (reference ``model/cl4srec2.py``) draws its augmentation batch
from the *original* dataset while the main loss uses the regenerated data —
handled in the trainer by a second iterator feeding ``batch['aug_*']``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from dr4sr_tpu.models.registry import register_model
from dr4sr_tpu.models.sasrec import SASRec, SASRecEncoder
from dr4sr_tpu.modules.augmentation import augment
from dr4sr_tpu.modules.losses import info_nce_loss
from dr4sr_tpu.modules.layers import seq_pooling


def cl_loss(
    module: SASRecEncoder,
    variables,
    rng: jax.Array,
    seq: jax.Array,
    seqlen: jax.Array,
    valid: jax.Array,
    model_cfg: Dict[str, Any],
    num_items: int,
    reduce: bool = True,
) -> jax.Array:
    """The contrastive term: two augmented views -> mean-pooled reps -> InfoNCE."""
    r_i, r_j, r_di, r_dj = jax.random.split(rng, 4)
    kind = model_cfg.get("augment_type", "item_random")
    kw = dict(
        tao=float(model_cfg.get("tau", 0.2)),
        gamma=float(model_cfg.get("gamma", 0.7)),
        beta=float(model_cfg.get("beta", 0.2)),
        mask_id=num_items,
    )
    seq_i, len_i = augment(r_i, seq, seqlen, kind, **kw)
    seq_j, len_j = augment(r_j, seq, seqlen, kind, **kw)

    def encode(s, n, dr):
        out = module.apply(
            variables,
            {"in_item_id": s, "seqlen": n},
            training=True,
            need_pooling=False,
            rngs={"dropout": dr},
        )
        return seq_pooling(out, n, "mean")

    rep_i = encode(seq_i, len_i, r_di)
    rep_j = encode(seq_j, len_j, r_dj)
    keep = (seqlen > 1) & valid
    return info_nce_loss(
        rep_i,
        rep_j,
        temperature=float(model_cfg.get("temperature", 1.0)),
        valid=keep,
        reduce=reduce,
    )


@register_model("CL4SRec")
class CL4SRec(SASRec):
    contrastive = True
    aug_from_original = False

    @staticmethod
    def build(config: Dict[str, Any], num_items: int, **kwargs):
        return SASRec.build(config, num_items, extra_embedding_rows=1, **kwargs)


@register_model("CL4SRec2")
class CL4SRec2(CL4SRec):
    aug_from_original = True

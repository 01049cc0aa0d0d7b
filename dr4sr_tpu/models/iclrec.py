"""ICLRec — intent-contrastive sequential recommendation, runnable as
``-m ICLRec``.

Reference ``ICLRecAugmentation`` (``module/data_augmentation.py:671-745``) is
dead RecStudio code upstream; here it is a live model: SASRec backbone +
(a) instance CL between two stochastic augmentations of each sequence and
(b) intent CL pulling each sequence representation toward its k-means intent
prototype, with same-intent de-noising. Prototypes are re-fit every epoch
over the pooled representations of the whole training set (the reference's
per-epoch faiss E-step → jit'd Lloyd k-means on device).

Like CL4SRec the item table carries one extra mask-token row
(id == num_items) for the mask augmentation.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from dr4sr_tpu.models.registry import register_model
from dr4sr_tpu.models.sasrec import SASRec
from dr4sr_tpu.modules.graph_augmentation import KMeansState, iclrec_cl_losses, kmeans
from dr4sr_tpu.modules.layers import seq_pooling


@register_model("ICLRec")
class ICLRec(SASRec):
    @staticmethod
    def build(config: Dict[str, Any], num_items: int, **kwargs):
        kwargs.pop("num_edges", None)
        return SASRec.build(config, num_items, extra_embedding_rows=1, **kwargs)

    @staticmethod
    def refresh_state(trainer, nepoch: int) -> Dict[str, jax.Array]:
        """E-step: pooled reps of all train rows under current params →
        k-means intent prototypes."""
        if "iclrec_pool" not in trainer._compiled:

            @jax.jit
            def pool(params, seq, seqlen):
                out = trainer.rec.module.apply(
                    {"params": params}, {"in_item_id": seq, "seqlen": seqlen},
                    training=False, need_pooling=False,
                )
                return seq_pooling(out, seqlen, "mean")

            trainer._compiled["iclrec_pool"] = pool

        pool = trainer._compiled["iclrec_pool"]
        reps = []
        loader = trainer.train_data.get_loader(shuffle=False)
        for batch in loader:
            batch = trainer._host_transform(batch, is_train=True)
            r = pool(trainer.state.params, jnp.asarray(batch["in_item_id"]),
                     jnp.asarray(batch["seqlen"]))
            valid = batch.get("valid")
            r = np.asarray(r)
            reps.append(r if valid is None else r[np.asarray(valid)])
        reps = jnp.asarray(np.concatenate(reps, axis=0))
        k = int(trainer.config["model"].get("num_intent_clusters", 32))
        cents, _ = kmeans(jax.random.PRNGKey(nepoch), reps, k)
        return {"intent_centroids": cents}

    @staticmethod
    def aux_loss(module, variables, batch, rng, model_cfg, num_items):
        r_main, r_drop = jax.random.split(rng)

        def encode(seq, seqlen, dr):
            return module.apply(
                variables, {"in_item_id": seq, "seqlen": seqlen},
                training=True, need_pooling=False, rngs={"dropout": dr},
            )

        pooled = seq_pooling(
            encode(batch["in_item_id"], batch["seqlen"], r_drop),
            batch["seqlen"], "mean",
        )
        state = KMeansState(
            batch["intent_centroids"],
            jnp.zeros(batch["intent_centroids"].shape[0], jnp.int32),
        )
        out = iclrec_cl_losses(
            r_main, encode, batch["in_item_id"], batch["seqlen"], pooled,
            state, num_items,
            aug_kind=model_cfg.get("augment_type", "item_random"),
            temperature=float(model_cfg.get("temperature", 1.0)),
            valid=batch.get("valid"),
        )
        w_i = float(model_cfg.get("instance_weight", 0.1))
        w_c = float(model_cfg.get("intent_weight", 0.1))
        return w_i * out["instance_cl_loss"] + w_c * out["intent_cl_loss"]

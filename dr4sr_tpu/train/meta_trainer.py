"""MetaTrainer — the bilevel (DR4SR+) training loop.

See ``dr4sr_tpu.models.metamodel`` for the behavioral spec; this module holds
the trainer subclass (separate file to keep models/ free of trainer imports).
"""

from __future__ import annotations

import copy
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from dr4sr_tpu.meta.hypergrad import clip_by_global_norm, hypergradient
from dr4sr_tpu.models.metamodel import gumbel_softmax_weight
from dr4sr_tpu.modules.layers import MLP
from dr4sr_tpu.train.trainer import Trainer


class MetaTrainer(Trainer):
    """Bilevel trainer: inner weighted sub-model steps + periodic outer
    implicit-gradient meta updates."""

    def __init__(self, config, datasets, mesh_plan=None, workdir=None,
                 config_dir: Optional[str] = None):
        sub_name = config["model"]["sub_model"]
        from dr4sr_tpu.config import load_config

        # explicit CLI overrides (--set/--epochs, stashed by run.py) apply to
        # the inner training too — without this, train.seed=... would change
        # only the meta loop and the sub-model would train identically across
        # seeds (sub-model YAML hyperparameters still take their own values)
        sub_config = load_config(sub_name, config["data"]["dataset"],
                                 config_dir=config_dir,
                                 overrides=config.get("_cli_overrides"))
        # the sub-model trains on the same (regenerated) data/files
        sub_config["data"] = copy.deepcopy(config["data"])
        self.meta_config = config
        # bilevel + context parallelism is rejected up front: the outer
        # step's HVPs run forward-mode (jvp-of-grad) under the jnp
        # reference-attention override, but an installed CP plan would route
        # attention through the shard_map/ppermute ring — a path with no
        # tested jvp story, and skipping the ring under force_reference
        # would silently compute local attention on sequence SHARDS
        # (ADVICE r4 low-#2)
        if int(sub_config["model"].get("context_parallel", 1)) > 1:
            raise ValueError(
                "MetaModel (bilevel) does not support "
                "model.context_parallel>1: hypergradient HVPs are "
                "forward-mode and the ring-attention path is reverse-mode "
                "only. Train the sub-model with CP directly, or drop CP "
                "for the bilevel run."
            )
        super().__init__(sub_config, datasets, mesh_plan=mesh_plan, workdir=workdir)
        self.model_name = "MetaModel"

        self.interval = int(config["train"].get("interval", 30))
        self.warmup_epoch = int(config["train"].get("warmup_epoch", 10))
        self.tau_min = float(config["model"].get("tau_min", 1.0))
        self.hpo_lr = float(config["train"].get("hpo_learning_rate", 1e-3))
        # 'sum' is the reference arithmetic (Σ weight·loss,
        # model/metamodel.py:182-193) whose magnitude jumps ~B·L× at the
        # warmup→weighted transition; 'mean' normalizes by the number of
        # weightable positions so the inner objective stays on the warmup
        # scale (VERDICT r1 weak-#2 audit knob)
        self.inner_scale = str(config["train"].get("inner_loss_scale", "sum"))
        self.meta_module = MLP((int(sub_config["model"]["embed_dim"]), 2))
        self.step_counter = 0

    # ------------------------------------------------------------------ state
    def init_state(self, seed: Optional[int] = None):
        state = super().init_state(seed)
        rng = jax.random.PRNGKey((seed or 0) + 101)
        d = int(self.config["model"]["embed_dim"])
        mlp_vars = self.meta_module.init(rng, jnp.zeros((1, d)))
        # reference inits tau=10 (model/metamodel.py:26) and lets the outer
        # loop learn it down toward tau_min — but at meta_lr 1e-3 tau moves
        # ~0.1 per 75 epochs, so gumbel weights stay ≈0.5±0.05 (near-uniform)
        # and the meta-net never differentiates samples; tau_init exposes a
        # sharper start without changing the reference default
        tau_init = float(self.meta_config["model"].get("tau_init", 10.0))
        self.meta_params = {
            "mlp": mlp_vars["params"],
            "tau": jnp.ones(()) * tau_init,
        }
        self.meta_tx = self._make_meta_optimizer()
        self.meta_opt_state = self.meta_tx.init(self.meta_params)
        return state

    def _make_meta_optimizer(self) -> optax.GradientTransformation:
        cfg = self.meta_config["train"]
        name = str(cfg.get("meta_optimizer", "sgd")).lower()
        lr = float(cfg.get("meta_learning_rate", 1e-3))
        wd = float(cfg.get("meta_weight_decay", 0.0) or 0.0)
        if name == "sgd":
            steps = [optax.add_decayed_weights(wd)] if wd else []
            steps += [optax.trace(decay=0.9), optax.scale(-lr)]
            return optax.chain(*steps)
        return optax.chain(optax.scale_by_adam(), optax.scale(-lr))

    # -------------------------------------------------------------- loss fns
    def _weighted_loss(self, params, meta_params, batch, rng):
        """Inner objective (reference ``MetaModel.training_step:174-194``).

        For contrastive sub-models (CL4SRec/CL4SRec2) the reference weights
        only the main per-position loss and adds the InfoNCE term unweighted
        (``rst += loss_value[1].sum()``, ``model/metamodel.py:189-193``).
        """
        rng_loss, rng_gumbel = jax.random.split(rng)
        cl_term = 0.0
        if self.contrastive:
            from dr4sr_tpu.models.cl4srec import cl_loss

            rng_loss, rng_cl = jax.random.split(rng_loss)
            aug_seq = batch.get("aug_in_item_id", batch["in_item_id"])
            aug_len = batch.get("aug_seqlen", batch["seqlen"])
            aug_valid = batch.get("aug_valid", batch.get("valid"))
            if aug_valid is None:
                aug_valid = jnp.ones(aug_seq.shape[0], bool)
            cl = cl_loss(
                self.rec.module, {"params": params}, rng_cl, aug_seq, aug_len,
                aug_valid, self.config["model"], self.num_items,
            )
            cl_term = float(self.config["model"].get("cl_weight", 0.1)) * cl
        loss_ps, query = self.rec.training_loss(
            {"params": params}, batch, rng_loss, reduce=False, return_query=True
        )
        logits = self.meta_module.apply({"params": meta_params["mlp"]}, query)
        tau = jnp.clip(meta_params["tau"], min=self.tau_min)
        weight = gumbel_softmax_weight(logits, tau, rng_gumbel)
        # weight shape follows query: [B, L] (origin pooling) or [B] (FMLP)
        if weight.ndim > loss_ps.ndim:
            weight = weight[..., 0]
        user_mask = batch["user_id"] == 0  # pattern rows: weight 1
        while user_mask.ndim < weight.ndim:
            user_mask = user_mask[..., None]
        weight = jnp.where(user_mask, 1.0, weight)
        pad = batch["item_id"] == 0
        if pad.ndim == weight.ndim:
            weight = jnp.where(pad, 0.0, weight)
        elif pad.ndim > weight.ndim:  # [B] weight vs [B, L] loss
            weight = jnp.where(pad, 0.0, weight[:, None] if weight.ndim == 1 else weight)
        if "valid" in batch:
            valid = batch["valid"]
            while valid.ndim < weight.ndim:
                valid = valid[..., None]
            weight = jnp.where(valid, weight, 0.0)
        total = jnp.sum(weight * loss_ps)
        if self.inner_scale == "mean":
            weightable = jnp.broadcast_to(
                ~pad, jnp.broadcast_shapes(pad.shape, loss_ps.shape)
            )
            if "valid" in batch:
                v = batch["valid"]
                v = v.reshape(v.shape + (1,) * (weightable.ndim - v.ndim))
                weightable = weightable & v
            total = total / jnp.maximum(jnp.sum(weightable), 1)
        return total + cl_term

    # ------------------------------------------------------------- jit steps
    @property
    def weighted_train_step(self):
        if "weighted_train_step" not in self._compiled:

            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(state, meta_params, batch, rng):
                loss, grads = jax.value_and_grad(
                    lambda p: self._weighted_loss(p, meta_params, batch, rng)
                )(state.params)
                return state.apply_gradients(grads=grads), loss

            self._compiled["weighted_train_step"] = self._with_ep_plan(step)
        return self._compiled["weighted_train_step"]

    @property
    def multi_weighted_train_step(self):
        """N weighted inner steps inside ONE jitted ``lax.scan`` dispatch —
        the MetaTrainer counterpart of ``Trainer.multi_train_step`` (VERDICT
        r4 next-#3: DR4SR+ is the slowest, most-repeated loop in every
        round's evidence matrix and dispatched per step until round 5).
        Groups are bounded by the ``interval`` boundary in
        ``training_epoch`` so meta_params are constant within a scan; the
        host pre-splits the same per-step rng keys the per-step path would
        consume, so the fused path is bit-identical (tests/
        test_meta_fused.py)."""
        if "multi_weighted_train_step" not in self._compiled:

            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def steps(state, meta_params, batches, rngs, extras):
                def body(st, xs):
                    batch, rng = xs
                    merged = dict(batch)
                    merged.update(extras)
                    loss, grads = jax.value_and_grad(
                        lambda p: self._weighted_loss(
                            p, meta_params, merged, rng
                        )
                    )(st.params)
                    return st.apply_gradients(grads=grads), loss

                state, losses = jax.lax.scan(body, state, (batches, rngs))
                return state, losses

            self._compiled["multi_weighted_train_step"] = self._with_ep_plan(
                steps
            )
        return self._compiled["multi_weighted_train_step"]

    @property
    def outer_step(self):
        if "outer_step" not in self._compiled:

            import functools

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def step(params, meta_params, meta_opt_state, val_batch,
                     train_batch, rng):
                r_val, r_train = jax.random.split(rng)
                from dr4sr_tpu.ops.attention import reference_attention

                val_loss_fn = lambda p: self.rec.training_loss(
                    {"params": p}, val_batch, r_val
                )
                train_loss_fn = lambda p, m: self._weighted_loss(
                    p, m, train_batch, r_train
                )
                # HVPs use forward-mode: route attention through the jnp
                # path (Pallas custom_vjp kernels have no jvp rule)
                with reference_attention():
                    hgrads = hypergradient(
                        train_loss_fn, val_loss_fn, params, meta_params,
                        lr=self.hpo_lr, truncate_iter=3,
                    )
                hgrads = clip_by_global_norm(hgrads, 10.0)
                updates, meta_opt_state = self.meta_tx.update(
                    hgrads, meta_opt_state, meta_params
                )
                meta_params = optax.apply_updates(meta_params, updates)
                return meta_params, meta_opt_state

            self._compiled["outer_step"] = self._with_ep_plan(step)
        return self._compiled["outer_step"]

    # --------------------------------------------------------- observability
    @property
    def weight_stats_step(self):
        """Distribution of the learned per-sample weights on a probe batch —
        logged per epoch so sweeps can see whether the meta-net actually
        differentiates samples (VERDICT r1 weak-#2) instead of collapsing
        to uniform."""
        if "weight_stats" not in self._compiled:

            @jax.jit
            def step(params, meta_params, batch, rng):
                rng_loss, rng_gumbel = jax.random.split(rng)
                loss_ps, query = self.rec.training_loss(
                    {"params": params}, batch, rng_loss,
                    reduce=False, return_query=True,
                )
                logits = self.meta_module.apply(
                    {"params": meta_params["mlp"]}, query
                )
                tau = jnp.clip(meta_params["tau"], min=self.tau_min)
                weight = gumbel_softmax_weight(logits, tau, rng_gumbel)
                if weight.ndim > loss_ps.ndim:
                    weight = weight[..., 0]
                mask = batch["item_id"] != 0
                mask = mask & (batch["user_id"] != 0).reshape(
                    (-1,) + (1,) * (mask.ndim - 1)
                )
                if mask.ndim > weight.ndim:
                    weight = jnp.broadcast_to(weight[..., None], mask.shape)
                w = jnp.where(mask, weight, jnp.nan)
                return {
                    "weight_mean": jnp.nanmean(w),
                    "weight_std": jnp.nanstd(w),
                    "weight_frac_high": jnp.nanmean((w > 0.9).astype(jnp.float32)
                                                    + jnp.where(jnp.isnan(w), jnp.nan, 0.0)),
                    "weight_frac_low": jnp.nanmean((w < 0.1).astype(jnp.float32)
                                                   + jnp.where(jnp.isnan(w), jnp.nan, 0.0)),
                    "tau": tau,
                }

            self._compiled["weight_stats"] = self._with_ep_plan(step)
        return self._compiled["weight_stats"]

    # ------------------------------------------------------------ epoch loop
    def _maybe_outer_step(self, meta_loader, warm: bool):
        """Outer implicit-gradient update when the global step counter sits
        on an ``interval`` boundary (reference ``model/metamodel.py:104-109``
        fires the outer loop every ``interval`` inner steps after warmup)."""
        if warm or self.step_counter % self.interval != 0:
            return
        val_b = self._device_batch(meta_loader.sample_batch(), is_train=True)
        train_b = self._device_batch(meta_loader.sample_batch(), is_train=True)
        self._rng, r2 = jax.random.split(self._rng)
        self.meta_params, self.meta_opt_state = self.outer_step(
            self.state.params, self.meta_params, self.meta_opt_state,
            val_b, train_b, r2,
        )

    def training_epoch(self, nepoch: int) -> float:
        assert self.state is not None
        loader = self.train_data.get_loader(seed=nepoch)
        meta_loader = self.train_data.get_loader(seed=nepoch + 4099)
        total_loss, n_steps = None, 0
        warm = nepoch <= self.warmup_epoch
        spd = int(self.config["train"].get("steps_per_dispatch", 1))
        if spd > 1:
            # fused dispatch (VERDICT r4 next-#3): scan groups of inner
            # steps on device, bounded so no group crosses an interval
            # boundary — the outer step between groups then sees exactly
            # the state/meta_params the per-step loop would. Same host-side
            # rng split sequence → bit-identical (tests/test_meta_fused.py).
            import itertools

            it = iter(loader)
            while True:
                take = spd
                if not warm:
                    to_boundary = self.interval - (
                        self.step_counter % self.interval
                    )
                    take = min(spd, to_boundary)
                group = list(itertools.islice(it, take))
                if not group:
                    break
                rngs = []
                for _ in group:
                    self._rng, r = jax.random.split(self._rng)
                    rngs.append(r)
                if len(group) == 1:
                    dbatch = self._device_batch(group[0], is_train=True)
                    if warm:
                        self.state, loss = self.train_step(
                            self.state, dbatch, rngs[0]
                        )
                    else:
                        self.state, loss = self.weighted_train_step(
                            self.state, self.meta_params, dbatch, rngs[0]
                        )
                    group_sum = loss
                else:
                    dstack = self._device_batch_stack(group)
                    if warm:
                        self.state, losses = self.multi_train_step(
                            self.state, dstack, jnp.stack(rngs),
                            self.batch_extras,
                        )
                    else:
                        self.state, losses = self.multi_weighted_train_step(
                            self.state, self.meta_params, dstack,
                            jnp.stack(rngs), self.batch_extras,
                        )
                    group_sum = losses.sum()
                total_loss = (
                    group_sum if total_loss is None else total_loss + group_sum
                )
                n_steps += len(group)
                self.step_counter += len(group)
                self._maybe_outer_step(meta_loader, warm)
            return self._finish_epoch(
                total_loss, n_steps, warm, meta_loader
            )
        for batch in loader:
            dbatch = self._device_batch(batch, is_train=True)
            self._rng, r = jax.random.split(self._rng)
            if warm:
                self.state, loss = self.train_step(self.state, dbatch, r)
            else:
                self.state, loss = self.weighted_train_step(
                    self.state, self.meta_params, dbatch, r
                )
            total_loss = loss if total_loss is None else total_loss + loss
            n_steps += 1
            self.step_counter += 1
            self._maybe_outer_step(meta_loader, warm)
        return self._finish_epoch(total_loss, n_steps, warm, meta_loader)

    def _finish_epoch(self, total_loss, n_steps, warm, meta_loader):
        if not warm:
            probe = self._device_batch(meta_loader.sample_batch(), is_train=True)
            self._rng, r3 = jax.random.split(self._rng)
            stats = self.weight_stats_step(
                self.state.params, self.meta_params, probe, r3
            )
            self.logged_metrics.update(
                {k: float(v) for k, v in stats.items()}
            )
        return float(total_loss) / max(n_steps, 1)

"""Implicit-gradient engine for bilevel optimization (DR4SR+).

Pure-JAX port of the reference's ``Hypergrad``/``MetaOptimizer``
(``utils/utils.py:134-255``), which follows "Optimizing Millions of
Hyperparameters by Implicit Differentiation" (Lorraine et al., 2020):

    hyper_grad(φ) = - d/dφ [ ∂L_train/∂W · v ],
    v ≈ (∂²L_train/∂W²)^{-1} ∂L_val/∂W   (Neumann series, ``truncate_iter``
    terms, each scaled by ``lr``)

The reference needs create_graph double-backward and a cuDNN-off workaround
for GRU (``model/metamodel.py:125,176``); here HVPs are forward-over-reverse
``jax.jvp(jax.grad(...))`` — composable with scan-based GRUs and jit — and
the whole outer step compiles into a single XLA program.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Tree = Any


def tree_add(a: Tree, b: Tree) -> Tree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a: Tree, b: Tree) -> Tree:
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(a: Tree, s) -> Tree:
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_vdot(a: Tree, b: Tree) -> jax.Array:
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_global_norm(a: Tree) -> jax.Array:
    return jnp.sqrt(
        jax.tree_util.tree_reduce(
            jnp.add, jax.tree_util.tree_map(lambda x: jnp.sum(x * x), a)
        )
    )


def clip_by_global_norm(a: Tree, max_norm: float) -> Tree:
    norm = tree_global_norm(a)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return tree_scale(a, scale)


def gumbel_topk_relaxation(
    rng: jax.Array, scores: jax.Array, k: int, tau: float = 1.0,
    hard: bool = False, eps: float = 1e-10,
) -> jax.Array:
    """Continuous top-k relaxation via iterated gumbel-softmax (reference
    ``SubsetOperator``, ``utils/utils.py:257-288``): returns a [B, N] k-hot
    relaxation; ``hard`` straight-throughs onto the exact top-k."""
    g = jax.random.gumbel(rng, scores.shape)
    scores = scores + g
    khot = jnp.zeros_like(scores)
    onehot_approx = jnp.zeros_like(scores)
    for _ in range(k):
        mask = jnp.maximum(1.0 - onehot_approx, eps)
        scores = scores + jnp.log(mask)
        onehot_approx = jax.nn.softmax(scores / tau, axis=-1)
        khot = khot + onehot_approx
    if hard:
        _, idx = jax.lax.top_k(khot, k)
        hard_khot = jnp.zeros_like(khot).at[
            jnp.arange(khot.shape[0])[:, None], idx
        ].set(1.0)
        khot = hard_khot - jax.lax.stop_gradient(khot) + khot
    return khot


def hypergradient(
    train_loss_fn: Callable[[Tree, Tree], jax.Array],  # (params, meta) -> loss
    val_loss_fn: Callable[[Tree], jax.Array],  # params -> loss
    params: Tree,
    meta_params: Tree,
    lr: float = 0.1,
    truncate_iter: int = 3,
) -> Tree:
    """Returns dL_val/dφ via the truncated-Neumann inverse-HVP.

    Matches the reference iteration (``utils/utils.py:180-205``):
        p = v = dL_val/dW
        repeat truncate_iter: v ← v − lr·H·v ;  p ← p + v
    then hyper_grads = − d/dφ [ dL_train/dW · p ].
    """
    v1 = jax.grad(val_loss_fn)(params)

    grad_train = lambda p: jax.grad(lambda q: train_loss_fn(q, meta_params))(p)

    def hvp(v: Tree) -> Tree:
        return jax.jvp(grad_train, (params,), (v,))[1]

    p = v = v1
    for _ in range(truncate_iter):
        v = tree_sub(v, tree_scale(hvp(v), lr))
        p = tree_add(p, v)

    def inner(meta: Tree) -> jax.Array:
        g = jax.grad(lambda q: train_loss_fn(q, meta))(params)
        return tree_vdot(g, p)

    v3 = jax.grad(inner)(meta_params)
    return tree_scale(v3, -1.0)

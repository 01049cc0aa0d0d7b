"""Flat-parameter utilities.

Equivalent of the reference's ``ReparamModule`` (``utils/reparam_module.py``,
the AuxiLearn/dataset-distillation helper that flattens all module params into
one vector and runs a functional forward with injected params). In JAX the
functional forward is the default, so the whole machinery collapses to
ravel/unravel over the param pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def flatten_params(params: Any) -> Tuple[jax.Array, Callable[[jax.Array], Any]]:
    """Returns (flat_vector, unravel_fn)."""
    return ravel_pytree(params)


def functional_apply(
    apply_fn: Callable, unravel: Callable[[jax.Array], Any], flat: jax.Array,
    *args, **kwargs,
):
    """Forward with an injected flat parameter vector."""
    return apply_fn({"params": unravel(flat)}, *args, **kwargs)


def flat_param_count(params: Any) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(params))

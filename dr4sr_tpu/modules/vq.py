"""Vector-quantization layers.

Equivalents of the reference's (dormant) VQ stack (``module/layers.py:237-385``):
a residual multi-level :class:`VectorQuantizer` and a single-codebook
:class:`VanillaVectorQuantizer`, both with straight-through estimators and
EMA-free commitment losses — expressed as jit-friendly argmin lookups.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dr4sr_tpu.models.base import normal_init


def _nearest(codebook: jax.Array, x: jax.Array) -> jax.Array:
    # codebook [K, D], x [..., D] -> indices [...]
    d2 = (
        jnp.sum(x**2, -1, keepdims=True)
        - 2 * x @ codebook.T
        + jnp.sum(codebook**2, -1)[None, :]
    )
    return jnp.argmin(d2, axis=-1)


class VanillaVectorQuantizer(nn.Module):
    num_codes: int
    embed_dim: int
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (quantized, codes, loss)."""
        codebook = self.param("codebook", normal_init, (self.num_codes, self.embed_dim))
        codes = _nearest(codebook, x)
        quant = codebook[codes]
        codebook_loss = jnp.mean((quant - jax.lax.stop_gradient(x)) ** 2)
        commit_loss = jnp.mean((x - jax.lax.stop_gradient(quant)) ** 2)
        loss = codebook_loss + self.commitment_cost * commit_loss
        quant = x + jax.lax.stop_gradient(quant - x)  # straight-through
        return quant, codes, loss


class VectorQuantizer(nn.Module):
    """Residual VQ: each level quantizes the residual of the previous one."""

    num_codes: int
    embed_dim: int
    num_levels: int = 2
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        residual = x
        total = jnp.zeros_like(x)
        losses = []
        codes = []
        for level in range(self.num_levels):
            q, c, loss = VanillaVectorQuantizer(
                self.num_codes, self.embed_dim, self.commitment_cost,
                name=f"level_{level}",
            )(residual)
            residual = residual - jax.lax.stop_gradient(q)
            total = total + q
            losses.append(loss)
            codes.append(c)
        return total, jnp.stack(codes, axis=-1), jnp.sum(jnp.stack(losses))

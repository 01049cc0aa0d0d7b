"""Stochastic sequence augmentations (CL4SRec) — vectorized for TPU.

The reference implements crop/mask/reorder as per-example Python loops
(``module/data_augmentation.py:20-95``); under jit those become fixed-shape,
batch-vectorized transforms driven by ``jax.random``:

* crop: keep a random contiguous ``ceil/floor(tao·len)`` window, re-pack to
  the front (gather with start offsets);
* mask: overwrite ``int(gamma·len)`` random positions (without replacement,
  via per-row uniform-key ranking) with the dedicated mask token;
* reorder: shuffle a random ``int(beta·len)`` window in place via a sort-key
  trick — positions outside the window keep their integer index, positions
  inside get ``start + U[0,1)`` so an argsort permutes exactly the window.

``augment('random', ...)`` picks one of the three per call with
``lax.switch`` (the reference picks per batch call too).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Seq = jax.Array  # [B, L] int32
Lens = jax.Array  # [B] int32


def item_crop(rng: jax.Array, seq: Seq, seqlen: Lens, tao: float) -> Tuple[Seq, Lens]:
    b, l = seq.shape
    sub_len = jnp.maximum(1, (tao * seqlen).astype(jnp.int32))
    start = jax.random.randint(rng, (b,), 0, jnp.maximum(seqlen - sub_len + 1, 1))
    pos = jnp.arange(l)[None, :]
    src = jnp.clip(start[:, None] + pos, 0, l - 1)
    out = jnp.take_along_axis(seq, src, axis=1)
    out = jnp.where(pos < sub_len[:, None], out, 0)
    return out, sub_len


def item_mask(
    rng: jax.Array, seq: Seq, seqlen: Lens, gamma: float, mask_id: int
) -> Tuple[Seq, Lens]:
    b, l = seq.shape
    sub_len = (gamma * seqlen).astype(jnp.int32)
    u = jax.random.uniform(rng, (b, l))
    pos = jnp.arange(l)[None, :]
    u = jnp.where(pos < seqlen[:, None], u, jnp.inf)
    # rank of each position among the row's uniforms; lowest sub_len get masked
    rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
    masked = rank < sub_len[:, None]
    out = jnp.where(masked, mask_id, seq)
    return out, seqlen


def item_reorder(rng: jax.Array, seq: Seq, seqlen: Lens, beta: float) -> Tuple[Seq, Lens]:
    b, l = seq.shape
    r_start, r_perm = jax.random.split(rng)
    sub_len = (beta * seqlen).astype(jnp.int32)
    start = jax.random.randint(r_start, (b,), 0, jnp.maximum(seqlen - sub_len + 1, 1))
    pos = jnp.arange(l)[None, :]
    in_window = (pos >= start[:, None]) & (pos < (start + sub_len)[:, None])
    u = jax.random.uniform(r_perm, (b, l))
    sort_key = jnp.where(in_window, start[:, None] + u, pos.astype(jnp.float32))
    perm = jnp.argsort(sort_key, axis=1)
    out = jnp.take_along_axis(seq, perm, axis=1)
    return out, seqlen


@functools.partial(jax.jit, static_argnames=("kind", "tao", "gamma", "beta", "mask_id"))
def augment(
    rng: jax.Array,
    seq: Seq,
    seqlen: Lens,
    kind: str = "item_random",
    tao: float = 0.2,
    gamma: float = 0.7,
    beta: float = 0.2,
    mask_id: int = 0,
) -> Tuple[Seq, Lens]:
    if kind == "item_crop":
        return item_crop(rng, seq, seqlen, tao)
    if kind == "item_mask":
        return item_mask(rng, seq, seqlen, gamma, mask_id)
    if kind == "item_reorder":
        return item_reorder(rng, seq, seqlen, beta)
    if kind == "item_random":
        r_pick, r_aug = jax.random.split(rng)
        choice = jax.random.randint(r_pick, (), 0, 3)
        return jax.lax.switch(
            choice,
            [
                lambda r: item_crop(r, seq, seqlen, tao),
                lambda r: item_mask(r, seq, seqlen, gamma, mask_id),
                lambda r: item_reorder(r, seq, seqlen, beta),
            ],
            r_aug,
        )
    raise ValueError(f"unknown augmentation kind {kind!r}")


def random_augmentation(
    rng: jax.Array,
    seq: Seq,
    seqlen: Lens,
    augment_threshold: int,
    short_kinds: Tuple[str, ...] = ("item_mask",),
    long_kinds: Tuple[str, ...] = ("item_crop", "item_mask", "item_reorder"),
    tao: float = 0.2,
    gamma: float = 0.7,
    beta: float = 0.2,
    mask_id: int = 0,
) -> Tuple[Seq, Lens]:
    """Length-conditioned augmentation (reference ``Random_Augmentation``,
    ``module/data_augmentation.py:194-223``): rows longer than the threshold
    draw from ``long_kinds``, shorter rows from ``short_kinds``. Fixed-shape:
    both branches are computed and selected per row."""
    r_short, r_long, r_pick = jax.random.split(rng, 3)
    kw = dict(tao=tao, gamma=gamma, beta=beta, mask_id=mask_id)

    def pick(r, kinds):
        r_c, r_a = jax.random.split(r)
        choice = jax.random.randint(r_c, (), 0, len(kinds))
        branches = [
            (lambda kk: (lambda rr: augment(rr, seq, seqlen, kk, **kw)))(k_)
            for k_ in kinds
        ]
        return jax.lax.switch(choice, branches, r_a)

    s_seq, s_len = pick(r_short, short_kinds)
    l_seq, l_len = pick(r_long, long_kinds)
    is_long = (seqlen > augment_threshold)[:, None]
    out_seq = jnp.where(is_long, l_seq, s_seq)
    out_len = jnp.where(is_long[:, 0], l_len, s_len)
    return out_seq, out_len

"""Ring attention: context-parallel attention over a mesh axis.

Round 1-2 documented sequence/context parallelism as a skip (SURVEY §2.2:
not required at L=50). This implements it anyway as the scaling story for
long-context variants: the sequence axis shards over a mesh axis, each
device keeps its Q block resident, and K/V blocks rotate around the ring
via ``lax.ppermute`` while an online-softmax accumulator (running max,
denominator, weighted sum — the same math as the Pallas flash kernel,
``ops/attention.py``) folds in one block per step. Communication is
point-to-point neighbor traffic on ICI — no all-gather of the full K/V —
so the per-device memory is O(L/n) and the ring pipelines transfer behind
compute.

Reference: none (the upstream repo is single-GPU, L=50). Public technique:
Liu et al., "Ring Attention with Blockwise Transformers" (2023).

Layout: q, k, v are [B, H, L, Dh] sharded as P(None, None, axis, None)
inside ``shard_map``; the per-device view is [B, H, Lc, Dh] with
Lc = L / axis_size. Padding masks rotate with their K/V blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG = -1e30

# Process-global context-parallel plan, mirroring the EP plan pattern
# (parallel/ep.py): the trainer installs (mesh, axis_name) right before any
# step traces when ``model.context_parallel > 1``; ``multihead_attention``
# reads it at trace time and routes encoder attention through the ring.
_CTX_PLAN: Optional[tuple] = None


def set_context_plan(mesh: Optional[Mesh], axis_name: str = "model") -> None:
    global _CTX_PLAN
    _CTX_PLAN = None if mesh is None else (mesh, axis_name)


def get_context_plan() -> Optional[tuple]:
    return _CTX_PLAN


def _block_update(q, k_blk, v_blk, mask_blk, m, l, acc, scale):
    """One online-softmax fold of a K/V block into the accumulator.

    q [B,H,Lq,Dh]; k_blk/v_blk [B,H,Lk,Dh]; mask_blk [B,H,Lq,Lk] bool
    (True = attend); m/l [B,H,Lq,1] f32; acc [B,H,Lq,Dh] f32.
    """
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask_blk, scores, NEG)
    m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    # rows with nothing attendable yet keep m = NEG; exp(NEG - NEG) would be
    # 1 and pollute l, so clamp the shift for those rows
    shift = jnp.where(m_new <= NEG / 2, 0.0, m_new)
    p = jnp.exp(scores - shift)
    p = jnp.where(mask_blk, p, 0.0)
    corr = jnp.exp(jnp.where(m <= NEG / 2, shift, m) - shift)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def _ring_body(q, k, v, pad, axis_name: str, axis_size: int, causal: bool):
    """Per-device program under shard_map."""
    b, h, lc, dh = q.shape
    scale = 1.0 / (dh ** 0.5)
    idx = jax.lax.axis_index(axis_name)
    qf = q.astype(jnp.float32)

    q_pos = idx * lc + jnp.arange(lc)  # global positions of local queries
    m = jnp.full((b, h, lc, 1), NEG, jnp.float32)
    l = jnp.zeros((b, h, lc, 1), jnp.float32)
    acc = jnp.zeros((b, h, lc, dh), jnp.float32)

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    k_cur, v_cur, pad_cur = k, v, pad
    src = idx  # ring step s holds the block that originated on device idx - s
    for step in range(axis_size):
        k_pos = src * lc + jnp.arange(lc)
        mask = ~pad_cur[:, None, None, :]  # [B,1,1,Lk]
        if causal:
            mask = mask & (q_pos[:, None] >= k_pos[None, :])[None, None]
        mask = jnp.broadcast_to(mask, (b, h, lc, lc))
        m, l, acc = _block_update(
            qf, k_cur.astype(jnp.float32), v_cur.astype(jnp.float32),
            mask, m, l, acc, scale,
        )
        if step + 1 < axis_size:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            pad_cur = jax.lax.ppermute(pad_cur, axis_name, perm)
            src = (src - 1) % axis_size
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,  # [B, H, L, Dh]
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,  # [B, L] True = pad
    causal: bool = True,
    *,
    mesh: Mesh,
    axis_name: str,
    batch_axis: Optional[str] = None,
    in_jit: bool = False,
) -> jax.Array:
    """Context-parallel attention; L must divide the mesh axis size.

    ``batch_axis``: mesh axis the batch dim is sharded over (composes CP
    with DP — the ring body is batch-local so the data axis just rides
    along). ``in_jit``: skip the eager ``device_put`` placement — under an
    enclosing jit the shard_map specs alone define the partitioning.
    """
    b, h, length, dh = q.shape
    n = mesh.shape[axis_name]
    assert length % n == 0, f"L={length} not divisible by {axis_name}={n}"
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, length), bool)

    spec_qkv = P(batch_axis, None, axis_name, None)
    spec_pad = P(batch_axis, axis_name)
    body = functools.partial(
        _ring_body, axis_name=axis_name, axis_size=n, causal=causal
    )
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_pad),
        out_specs=spec_qkv,
    )
    if not in_jit:
        q = jax.device_put(q, NamedSharding(mesh, spec_qkv))
        k = jax.device_put(k, NamedSharding(mesh, spec_qkv))
        v = jax.device_put(v, NamedSharding(mesh, spec_qkv))
        key_padding_mask = jax.device_put(
            key_padding_mask, NamedSharding(mesh, spec_pad)
        )
    return fn(q, k, v, key_padding_mask)

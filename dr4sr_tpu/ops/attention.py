"""Fused multi-head attention for TPU.

The hot attention path of every transformer encoder in the framework (SASRec,
CL4SRec, GNN encoder, the regenerator's encoder/decoder). Replaces the
reference's ``torch.nn.TransformerEncoder`` SDPA (``model/sasrec.py:21-34``)
with:

* :func:`flash_attention` — a Pallas kernel fusing QK^T + masking + online
  softmax + PV into one VMEM-resident pass (no [B,H,L,L] score tensor in HBM).
  Blockwise over the query axis; keys/values stay in VMEM per (batch, head)
  program, with an inner online-softmax loop over key blocks so long
  sequences stream rather than materialize.
* :func:`mha_reference` — a pure-jnp reference used for parity tests and as
  the fallback on CPU (the kernel itself also runs under ``interpret=True``).

Masking semantics match the reference: a boolean key-padding mask (True =
masked out, like torch's ``src_key_padding_mask``) plus an optional causal
constraint. Fully-masked query rows return zeros (torch yields NaN there; the
reference never consumes those rows).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    causal: bool = True,
) -> jax.Array:
    """jnp attention. q,k,v: [B, H, L, Dh]; key_padding_mask: [B, L] True=pad."""
    _, _, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh**0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        row = jnp.arange(lq)[:, None]
        col = jnp.arange(lk)[None, :]
        scores = jnp.where((col > row)[None, None], _NEG_INF, scores)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, scores)
    # safe softmax: fully-masked rows -> zeros
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(m))
    e = jnp.where(scores <= _NEG_INF / 2, 0.0, e)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _flash_kernel(
    mask_ref,  # [1, 1, Lk] int32 (1 = masked)
    q_ref,  # [1, 1, block_q, Dh]
    k_ref,  # [1, 1, Lk, Dh]
    v_ref,  # [1, 1, Lk, Dh]
    o_ref,  # [1, 1, block_q, Dh]
    *,
    causal: bool,
    block_k: int,
    lk: int,
    scale: float,
):
    qi = pl.program_id(2)
    block_q = q_ref.shape[2]
    dh = q_ref.shape[3]
    # bf16 inputs (train.precision: bf16) keep bf16 MATMUL OPERANDS with f32
    # accumulation — the MXU's native mode, ~4x the f32-operand rate on v5e.
    # f32 inputs keep the original all-f32 arithmetic bit-for-bit (parity
    # tests). Softmax statistics are always f32 on the VPU.
    bf16 = q_ref.dtype == jnp.bfloat16
    if bf16:
        q = q_ref[0, 0]  # [bq, Dh] bf16; scale applied to f32 scores below
    else:
        q = q_ref[0, 0].astype(jnp.float32) * scale

    num_kb = lk // block_k
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kblk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        vblk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        if not bf16:
            kblk = kblk.astype(jnp.float32)
            vblk = vblk.astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk] f32
        if bf16:
            s = s * scale
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb * block_k
        pad = mask_ref[0, 0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        invalid = pad > 0
        if causal:
            invalid = jnp.logical_or(invalid, col_ids > row_ids)
        s = jnp.where(invalid, _NEG_INF, s)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        p = jnp.where(invalid, 0.0, p)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = p.astype(jnp.bfloat16) if bf16 else p
        acc = acc * alpha + jax.lax.dot_general(
            pv, vblk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((block_q, dh), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    if causal:
        # key blocks entirely above the causal diagonal of this q block are
        # fully masked — skip them (halves the S² work; round-5 MFU work).
        # fori_loop takes a traced upper bound (lowers to a while loop).
        last_row = qi * block_q + block_q - 1
        num_kb_eff = jnp.minimum(num_kb, last_row // block_k + 1)
    else:
        num_kb_eff = num_kb
    acc, _, l = jax.lax.fori_loop(0, num_kb_eff, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    causal: bool = True,
    block_q: int = 64,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused attention. q,k,v: [B, H, L, Dh]; mask [B, L] True=pad."""
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh**0.5)

    block_q = min(block_q, _ceil_to(lq, 8))
    block_k = min(block_k, _ceil_to(lk, 128))
    lq_p = _ceil_to(lq, block_q)
    lk_p = _ceil_to(lk, block_k)

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, lk), jnp.bool_)
    # pad: padded key positions are masked out, padded query rows are junk we slice off
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    maskp = jnp.pad(key_padding_mask.astype(jnp.int32), ((0, 0), (0, lk_p - lk)),
                    constant_values=1)[:, None, :]  # [B, 1, Lk]

    grid = (b, h, lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, causal=causal, block_k=block_k, lk=lk_p, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, lk_p), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk_p, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk_p, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, dh), q.dtype),
        interpret=interpret,
    )(maskp, qp, kp, vp)
    return out[:, :, :lq, :]


import numpy as np


def _flash_bwd_kernel(
    mask_ref,  # [1, 1, Lk] int32 (1 = masked)
    q_ref,  # [1, 1, Lq, Dh]
    k_ref,  # [1, 1, Lk, Dh]
    v_ref,  # [1, 1, Lk, Dh]
    o_ref,  # [1, 1, Lq, Dh]
    do_ref,  # [1, 1, Lq, Dh]
    dq_ref,  # [1, 1, Lq, Dh]
    dk_ref,  # [1, 1, Lk, Dh]
    dv_ref,  # [1, 1, Lk, Dh]
    *,
    causal: bool,
    block_q: int,
    scale: float,
):
    """Flash-attention backward for one (batch, head): recomputes the softmax
    per q-block in VMEM and accumulates dq/dk/dv — no [L, L] HBM tensor.

        p  = softmax(q kᵀ·scale  + masks)
        dv = pᵀ do
        ds = p ⊙ (do vᵀ − rowsum(do ⊙ o))
        dq = ds k·scale ;  dk = dsᵀ q·scale
    """
    lq = q_ref.shape[2]
    lk = k_ref.shape[2]
    dh = q_ref.shape[3]
    # same dtype policy as the forward kernel: bf16 inputs keep bf16 MXU
    # operands (f32 accumulate), f32 inputs keep the original all-f32 math.
    # dq/dk/dv output refs are ALWAYS f32 (out_shape below): dk/dv
    # accumulate across q-blocks, which would lose precision in bf16.
    bf16 = q_ref.dtype == jnp.bfloat16
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    if not bf16:
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
    pad = (mask_ref[0, 0, :].reshape(1, lk) > 0)

    dk_ref[0, 0] = jnp.zeros((lk, dh), dk_ref.dtype)
    dv_ref[0, 0] = jnp.zeros((lk, dh), dv_ref.dtype)

    num_qb = lq // block_q

    def body(qb, _):
        qs = qb * block_q
        q = q_ref[0, 0, pl.ds(qs, block_q), :]
        do = do_ref[0, 0, pl.ds(qs, block_q), :]
        o = o_ref[0, 0, pl.ds(qs, block_q), :].astype(jnp.float32)
        do_f32 = do.astype(jnp.float32)
        if not bf16:
            q = q.astype(jnp.float32)
            do = do_f32

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, Lk]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, lk), 0) + qs
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, lk), 1)
        invalid = pad
        if causal:
            invalid = jnp.logical_or(invalid, col_ids > row_ids)
        s = jnp.where(invalid, _NEG_INF, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        e = jnp.where(invalid, 0.0, e)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        p = e / denom  # [bq, Lk] f32
        pm = p.astype(jnp.bfloat16) if bf16 else p

        dv_ref[0, 0] += jax.lax.dot_general(
            pm, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, Lk] f32
        d_row = jnp.sum(do_f32 * o, axis=-1, keepdims=True)  # [bq, 1]
        ds = p * (dp - d_row)
        dsm = ds.astype(jnp.bfloat16) if bf16 else ds
        dq_ref[0, 0, pl.ds(qs, block_q), :] = (
            jax.lax.dot_general(
                dsm, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
        ).astype(dq_ref.dtype)
        dk_ref[0, 0] += (
            jax.lax.dot_general(
                dsm, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
        ).astype(dk_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_qb, body, 0)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "interpret"))
def flash_attention_bwd(
    q, k, v, o, do, key_padding_mask, causal=True, block_q=64, interpret=False
):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / (dh**0.5)
    block_q = min(block_q, _ceil_to(lq, 8))
    lq_p = _ceil_to(lq, block_q)
    lk_p = _ceil_to(lk, 128)

    pad_q = ((0, 0), (0, 0), (0, lq_p - lq), (0, 0))
    pad_k = ((0, 0), (0, 0), (0, lk_p - lk), (0, 0))
    qp, op, dop = (jnp.pad(x, pad_q) for x in (q, o, do))
    kp, vp = (jnp.pad(x, pad_k) for x in (k, v))
    maskp = jnp.pad(
        key_padding_mask.astype(jnp.int32), ((0, 0), (0, lk_p - lk)),
        constant_values=1,
    )[:, None, :]

    spec_q = pl.BlockSpec((1, 1, lq_p, dh), lambda bi, hi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, 1, lk_p, dh), lambda bi, hi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_kernel, causal=causal, block_q=block_q, scale=scale
        ),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, lk_p), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_q, spec_k, spec_k, spec_q, spec_q,
        ],
        out_specs=(spec_q, spec_k, spec_k),
        # f32 grads regardless of input dtype: dk/dv accumulate across
        # q-blocks inside the kernel (see _flash_bwd_kernel dtype policy)
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lq_p, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lk_p, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lk_p, dh), jnp.float32),
        ),
        interpret=interpret,
    )(maskp, qp, kp, vp, op, dop)
    return (dq[:, :, :lq].astype(q.dtype), dk[:, :, :lk].astype(k.dtype),
            dv[:, :, :lk].astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_diff(q, k, v, mask, causal):
    """Differentiable fused attention: Pallas forward AND backward kernels;
    only (q, k, v, o, mask) are saved — no [B,H,L,L] residual."""
    return flash_attention(q, k, v, mask, causal)


def _flash_diff_fwd(q, k, v, mask, causal):
    o = flash_attention(q, k, v, mask, causal)
    return o, (q, k, v, o, mask)


def _flash_diff_bwd(causal, res, g):
    q, k, v, o, mask = res
    dq, dk, dv = flash_attention_bwd(q, k, v, o, g, mask, causal)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


import contextlib
import contextvars

_FORCE_REFERENCE = contextvars.ContextVar("dr4sr_force_reference_attention",
                                          default=False)


@contextlib.contextmanager
def reference_attention():
    """Trace-time override: use the jnp attention path (fully differentiable
    in both modes). Needed wherever forward-mode autodiff runs through the
    model — custom_vjp Pallas kernels do not support jvp (e.g. the bilevel
    hypergradient's HVPs)."""
    token = _FORCE_REFERENCE.set(True)
    try:
        yield
    finally:
        _FORCE_REFERENCE.reset(token)


def multihead_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array] = None,
    causal: bool = True,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU backends, jnp reference elsewhere.

    When a context-parallel plan is installed (``model.context_parallel``,
    trainer-wired via ``ops.ring_attention.set_context_plan``), sequence-
    sharded encoder attention routes through the ppermute ring instead —
    shapes whose length does not divide the mesh axis (e.g. KV-cached
    decode steps) fall back to the local kernels below.
    """
    from dr4sr_tpu.ops import ring_attention as _ring

    ctx = _ring.get_context_plan()
    if ctx is not None:
        mesh, axis_name = ctx
        n = int(mesh.shape[axis_name])
        if n > 1 and q.shape[2] == k.shape[2] and q.shape[2] % n == 0:
            from dr4sr_tpu.parallel.mesh import DATA_AXIS

            batch_axis = DATA_AXIS if DATA_AXIS in mesh.shape else None
            return _ring.ring_attention(
                q, k, v, key_padding_mask=key_padding_mask, causal=causal,
                mesh=mesh, axis_name=axis_name, batch_axis=batch_axis,
                in_jit=True,
            )
    if _FORCE_REFERENCE.get():
        use_pallas = False
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        if key_padding_mask is None:
            key_padding_mask = jnp.zeros(k.shape[:1] + k.shape[2:3], jnp.bool_)
        return _flash_diff(q, k, v, key_padding_mask, causal)
    return mha_reference(q, k, v, key_padding_mask, causal)

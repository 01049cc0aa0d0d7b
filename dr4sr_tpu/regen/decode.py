"""Batched hybrid-inference decoding.

The reference regenerates the training set by greedy-decoding ONE sequence at
a time on GPU (``3.Hybrid_inference.py:185-263`` — ``batch=1``, a Python loop
over ~19k sequences × K conditions, manually sharded across processes with
``--begin/--end``). Here the whole thing is one jitted program over ``[B]``
lanes: a ``lax.fori_loop`` of decoder steps with fixed shapes, per-lane
done-flags, and the restrictive/generative masking expressed as boolean
catalog masks. K conditions run as K tiled lanes in the same batch.

Masking semantics (reference ``inference_mask``/``inference_mask_generative``):
* restrictive: only items present in the source and not yet emitted;
* generative: any item not yet emitted;
* both exclude PAD (the reference's unpadded src achieves this implicitly);
* mode choice per step: restrictive when ``step <= 1`` or with prob 1-γ
  (γ=0 as shipped ⇒ always restrictive).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from dr4sr_tpu.regen.generator import Generator, NEG


@functools.partial(
    jax.jit, static_argnames=("generator", "max_len", "gamma")
)
def greedy_decode_batch(
    generator: Generator,
    variables,
    src: jax.Array,  # [B, Ls] SOS/EOS-framed, 0-padded
    condition: jax.Array,  # [B] int condition index per lane
    rng: jax.Array,
    max_len: int = 25,
    gamma: float = 0.0,
) -> jax.Array:
    """Returns decoded token buffers [B, max_len] (SOS first, EOS-terminated,
    0 after termination)."""
    b = src.shape[0]
    vocab = generator.num_items + 2
    sos, eos = generator.sos, generator.eos

    memory = generator.apply(variables, src, False, method=Generator.encode)
    memory_k = generator.apply(variables, memory, method=Generator.conditioned_memory)
    src_pad = src == 0

    in_src = jnp.zeros((b, vocab), bool).at[
        jnp.arange(b)[:, None], src
    ].set(True)
    in_src = in_src.at[:, 0].set(False)  # PAD never allowed

    buf = jnp.zeros((b, max_len), jnp.int32).at[:, 0].set(sos)
    emitted = jnp.zeros((b, vocab), bool).at[:, sos].set(True)
    done = jnp.zeros(b, bool)

    def body(i, carry):
        buf, emitted, done, rng = carry
        logits = generator.apply(
            variables, buf, memory_k, src_pad, condition, i,
            method=Generator.decode_step,
        )  # [B, V]
        rng, r = jax.random.split(rng)
        use_generative = (
            (jax.random.uniform(r, (b,)) < gamma) & (i > 1)
            if gamma > 0.0
            else jnp.zeros(b, bool)
        )
        restr = in_src & ~emitted
        gen = ~emitted
        gen = gen.at[:, 0].set(False)
        allowed = jnp.where(use_generative[:, None], gen, restr)
        masked = jnp.where(allowed, logits, NEG)
        nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        # lanes with nothing allowed (or already done) emit EOS
        dead = ~jnp.any(allowed, axis=-1)
        nxt = jnp.where(done, 0, jnp.where(dead, eos, nxt))
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, nxt[:, None], i + 1, axis=1
        )
        emitted = emitted.at[jnp.arange(b), nxt].set(True)
        done = done | (nxt == eos)
        return buf, emitted, done, rng

    buf, _, _, _ = jax.lax.fori_loop(0, max_len - 1, body, (buf, emitted, done, rng))
    return buf


@functools.partial(
    jax.jit, static_argnames=("generator", "max_len", "gamma")
)
def greedy_decode_batch_cached(
    generator: Generator,
    variables,
    src: jax.Array,  # [B, Ls] SOS/EOS-framed, 0-padded
    condition: jax.Array,  # [B] int condition index per lane
    rng: jax.Array,
    max_len: int = 25,
    gamma: float = 0.0,
) -> jax.Array:
    """KV-cached greedy decode (VERDICT r1 #3 / SURVEY §3.4): identical
    outputs to :func:`greedy_decode_batch` (parity-tested), but each step is
    one incremental decoder position over per-layer self-attention caches with
    once-projected cross-attention K/V — O(T) per lane instead of O(T²)."""
    b = src.shape[0]
    vocab = generator.num_items + 2
    sos, eos = generator.sos, generator.eos

    mem_k, mem_v = generator.apply(
        variables, src, condition, method=Generator.decode_state
    )
    memory_valid = src != 0

    in_src = jnp.zeros((b, vocab), bool).at[
        jnp.arange(b)[:, None], src
    ].set(True)
    in_src = in_src.at[:, 0].set(False)  # PAD never allowed

    nl = generator.num_layers
    d = generator.embed_dim
    cache_k = jnp.zeros((nl, b, max_len, d), mem_k.dtype)
    cache_v = jnp.zeros_like(cache_k)

    buf = jnp.zeros((b, max_len), jnp.int32).at[:, 0].set(sos)
    emitted = jnp.zeros((b, vocab), bool).at[:, sos].set(True)
    done = jnp.zeros(b, bool)

    def body(i, carry):
        buf, emitted, done, rng, cache_k, cache_v = carry
        tok = jax.lax.dynamic_slice_in_dim(buf, i, 1, axis=1)[:, 0]
        logits, cache_k, cache_v = generator.apply(
            variables, tok, i, cache_k, cache_v, mem_k, mem_v, memory_valid,
            method=Generator.cached_decode_step,
        )  # [B, V]
        rng, r = jax.random.split(rng)
        use_generative = (
            (jax.random.uniform(r, (b,)) < gamma) & (i > 1)
            if gamma > 0.0
            else jnp.zeros(b, bool)
        )
        restr = in_src & ~emitted
        gen = ~emitted
        gen = gen.at[:, 0].set(False)
        allowed = jnp.where(use_generative[:, None], gen, restr)
        masked = jnp.where(allowed, logits, NEG)
        nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        dead = ~jnp.any(allowed, axis=-1)
        nxt = jnp.where(done, 0, jnp.where(dead, eos, nxt))
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, nxt[:, None], i + 1, axis=1
        )
        emitted = emitted.at[jnp.arange(b), nxt].set(True)
        done = done | (nxt == eos)
        return buf, emitted, done, rng, cache_k, cache_v

    buf, _, _, _, _, _ = jax.lax.fori_loop(
        0, max_len - 1, body, (buf, emitted, done, rng, cache_k, cache_v)
    )
    return buf


@functools.partial(
    jax.jit, static_argnames=("generator", "max_len", "gamma", "beam_width")
)
def beam_decode_batch_cached(
    generator: Generator,
    variables,
    src: jax.Array,  # [B, Ls] SOS/EOS-framed, 0-padded
    condition: jax.Array,  # [B] int condition index per lane
    rng: jax.Array,
    max_len: int = 25,
    gamma: float = 0.0,
    beam_width: int = 4,
) -> jax.Array:
    """Width-W batched beam search generalizing
    :func:`greedy_decode_batch_cached` (BASELINE north-star "batched hybrid
    inference (beam decode)"; the reference's loop it generalizes is the
    greedy ``3.Hybrid_inference.py:185-217``). Beams ride as W extra lanes
    per sequence through the SAME per-layer KV caches ([nl, B·W, T, D]);
    each step renormalizes log-probs over the allowed (restrictive/
    generative) catalog mask, expands W·V candidates, keeps the top W, and
    reorders caches by parent beam. ``beam_width=1`` is bit-identical to
    the greedy path (tests/test_beam_decode.py): same masked argmax, same
    per-step rng sequence, same dead→EOS / done→PAD forcing.

    Returns the best-scoring beam's buffer [B, max_len] (SOS first,
    EOS-terminated, 0 after termination)."""
    b = src.shape[0]
    w = beam_width
    vocab = generator.num_items + 2
    sos, eos = generator.sos, generator.eos
    nl = generator.num_layers
    d = generator.embed_dim

    mem_k, mem_v = generator.apply(
        variables, src, condition, method=Generator.decode_state
    )
    # tile the per-lane memory per beam: beams of lane i occupy flat rows
    # [i*w, (i+1)*w) so the cache layout matches buf.reshape(b*w, ...)
    mem_k = jnp.repeat(mem_k, w, axis=1)
    mem_v = jnp.repeat(mem_v, w, axis=1)
    memory_valid = jnp.repeat(src != 0, w, axis=0)

    in_src = jnp.zeros((b, vocab), bool).at[
        jnp.arange(b)[:, None], src
    ].set(True)
    in_src = in_src.at[:, 0].set(False)  # PAD never allowed

    cache_k = jnp.zeros((nl, b * w, max_len, d), mem_k.dtype)
    cache_v = jnp.zeros_like(cache_k)

    buf = jnp.zeros((b, w, max_len), jnp.int32).at[:, :, 0].set(sos)
    emitted = jnp.zeros((b, w, vocab), bool).at[:, :, sos].set(True)
    done = jnp.zeros((b, w), bool)
    # identical SOS prefixes: only beam 0 starts live, so the first
    # expansion yields W distinct continuations instead of W duplicates
    scores = jnp.where(jnp.arange(w) == 0, 0.0, NEG) * jnp.ones((b, 1))

    def body(i, carry):
        buf, emitted, done, scores, rng, cache_k, cache_v = carry
        tok = jax.lax.dynamic_slice_in_dim(buf, i, 1, axis=2)[:, :, 0]
        logits, cache_k, cache_v = generator.apply(
            variables, tok.reshape(b * w), i, cache_k, cache_v,
            mem_k, mem_v, memory_valid,
            method=Generator.cached_decode_step,
        )
        logits = logits.reshape(b, w, vocab)
        rng, r = jax.random.split(rng)
        use_generative = (
            (jax.random.uniform(r, (b,)) < gamma) & (i > 1)
            if gamma > 0.0
            else jnp.zeros(b, bool)
        )
        restr = in_src[:, None] & ~emitted
        gen = ~emitted
        gen = gen.at[:, :, 0].set(False)
        allowed = jnp.where(use_generative[:, None, None], gen, restr)
        dead = ~jnp.any(allowed, axis=-1)
        logp = jax.nn.log_softmax(
            jnp.where(allowed, logits.astype(jnp.float32), NEG), axis=-1
        )
        logp = jnp.where(allowed, logp, NEG)
        cand = scores[..., None] + logp  # [b, w, V]
        # done beams continue with PAD, dead (exhausted-mask) beams with
        # EOS — both carry their score unchanged, as the single forced
        # candidate of that beam (greedy's where(done, 0, where(dead, eos)))
        forced = done | dead
        forced_tok = jnp.where(done, 0, eos)
        forced_cand = jnp.where(
            jax.nn.one_hot(forced_tok, vocab, dtype=bool),
            scores[..., None], NEG,
        )
        cand = jnp.where(forced[..., None], forced_cand, cand)
        top_scores, top_idx = jax.lax.top_k(cand.reshape(b, w * vocab), w)
        parent = top_idx // vocab  # [b, w]
        nxt = (top_idx % vocab).astype(jnp.int32)

        def by_parent(x):
            idx = parent.reshape(parent.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, idx, axis=1)

        buf = by_parent(buf)
        emitted = by_parent(emitted)
        done = by_parent(done)
        ck = cache_k.reshape(nl, b, w, max_len, d)
        cv = cache_v.reshape(nl, b, w, max_len, d)
        pidx = parent[None, :, :, None, None]
        cache_k = jnp.take_along_axis(ck, pidx, axis=2).reshape(
            nl, b * w, max_len, d)
        cache_v = jnp.take_along_axis(cv, pidx, axis=2).reshape(
            nl, b * w, max_len, d)

        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, nxt[:, :, None], i + 1, axis=2
        )
        emitted = emitted.at[
            jnp.arange(b)[:, None], jnp.arange(w)[None, :], nxt
        ].set(True)
        done = done | (nxt == eos)
        return buf, emitted, done, top_scores, rng, cache_k, cache_v

    buf, _, _, scores, _, _, _ = jax.lax.fori_loop(
        0, max_len - 1, body, (buf, emitted, done, scores, rng, cache_k, cache_v)
    )
    best = jnp.argmax(scores, axis=1)
    return jnp.take_along_axis(buf, best[:, None, None], axis=1)[:, 0]


def decode_dataset(
    generator: Generator,
    variables,
    sequences: List[List[int]],  # raw item sequences (no SOS/EOS)
    k_conditions: int,
    batch_size: int = 1024,
    max_len: int = 25,
    max_src: int = 52,
    gamma: float = 0.0,
    seed: int = 0,
    mesh_plan=None,
    use_kv_cache: bool = True,
    precision: str = "fp32",
    beam_width: int = 1,
) -> List[List[int]]:
    """Decode every sequence under every condition; returns raw regenerated
    item lists (SOS/EOS stripped). Equivalent of the reference's
    ``for k in range(K): for seq in seqlist: translate(...)`` loop.

    ``precision='bf16'`` casts the generator weights to bfloat16 for the
    decode program (throughput knob — halves weight HBM traffic; greedy
    argmax may flip on near-tied logits, so it is opt-in, default fp32)."""
    if precision == "bf16":
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)
    sos, eos = generator.sos, generator.eos
    n = len(sequences)
    src_all = np.zeros((n, max_src), np.int32)
    for i, s in enumerate(sequences):
        framed = [sos] + list(s)[: max_src - 2] + [eos]
        src_all[i, : len(framed)] = framed

    def put(arr):
        # shard decode lanes over the data axis when a mesh is given
        if mesh_plan is not None and mesh_plan.mesh is not None:
            return jax.device_put(arr, mesh_plan.batch_sharding(np.ndim(arr)))
        return jnp.asarray(arr)

    rng = jax.random.PRNGKey(seed)
    outputs: List[List[int]] = []
    for cond in range(k_conditions):
        for start in range(0, n, batch_size):
            chunk = src_all[start : start + batch_size]
            pad_rows = batch_size - len(chunk)
            if pad_rows:
                chunk = np.concatenate([chunk, np.zeros((pad_rows, max_src), np.int32)])
            rng, r = jax.random.split(rng)
            if beam_width > 1:
                buf = beam_decode_batch_cached(
                    generator, variables, put(chunk),
                    put(np.full((batch_size,), cond, np.int32)), r,
                    max_len=max_len, gamma=gamma, beam_width=beam_width,
                )
            else:
                decode_fn = (greedy_decode_batch_cached if use_kv_cache
                             else greedy_decode_batch)
                buf = decode_fn(
                    generator,
                    variables,
                    put(chunk),
                    put(np.full((batch_size,), cond, np.int32)),
                    r,
                    max_len=max_len,
                    gamma=gamma,
                )
            buf = np.asarray(buf)[: batch_size - pad_rows if pad_rows else batch_size]
            body = buf[:, 1:]  # skip SOS
            stop = (body == eos) | (body == 0)
            # first stop position per row (body length when no stop)
            first = np.where(stop.any(1), stop.argmax(1), body.shape[1])
            outputs.extend(
                body[i, : first[i]].tolist() for i in range(len(body))
            )
    return outputs


def regenerated_rows(
    decoded: List[List[int]], max_seq_len: int = 50
) -> List[list]:
    """Dedup + pack decoded sequences into training rows
    (reference ``3.Hybrid_inference.py:265-290``): user_id=1, per-position
    targets = sequence shifted by one, label all-ones."""
    train_set = {tuple(seq) for seq in decoded if seq}
    rows = []
    for seq in sorted(train_set):
        seq = list(seq)
        hist = seq[:-1]
        seq_len = min(len(hist), max_seq_len)
        if seq_len == 0:
            continue

        def fit(s):
            s = list(s)
            return s[-max_seq_len:] if len(s) > max_seq_len else s + [0] * (max_seq_len - len(s))

        rows.append([
            1,
            fit(hist),
            fit(seq[1:]),
            seq_len,
            [1] * max_seq_len,
            [0] * max_seq_len,
        ])
    return rows

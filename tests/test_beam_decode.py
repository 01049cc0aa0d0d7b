"""Batched beam decode (VERDICT r4 next-#8, BASELINE north-star "batched
hybrid inference (beam decode)").

Contracts:
* ``beam_width=1`` is bit-identical to the KV-cached greedy path (same
  masked argmax, same per-step rng sequence, same dead→EOS/done→PAD
  forcing);
* wider beams return sequences whose renormalized log-probability is >= the
  greedy sequence's under the same masking (beam can only improve the
  search objective);
* every decoded sequence still satisfies the restrictive-mask semantics
  (only source items, no repeats).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr4sr_tpu.regen.decode import (
    beam_decode_batch_cached,
    greedy_decode_batch_cached,
)
from dr4sr_tpu.regen.generator import NEG, Generator

NUM_ITEMS = 40


@pytest.fixture(scope="module")
def world():
    gen = Generator(num_items=NUM_ITEMS, k=3, dropout=0.0)
    rng = jax.random.PRNGKey(11)
    b, ls = 12, 12
    host = np.random.default_rng(4)
    src = np.zeros((b, ls), np.int32)
    for i in range(b):
        n = host.integers(3, 9)
        items = host.choice(np.arange(1, NUM_ITEMS), size=n, replace=False)
        src[i, : n + 2] = [NUM_ITEMS, *items, NUM_ITEMS + 1]
    cond = host.integers(0, 3, size=b).astype(np.int32)
    variables = gen.init(
        {"params": rng, "dropout": rng, "gumbel": rng},
        jnp.asarray(src), jnp.asarray(src[:, :-1]),
        jnp.full((b,), 5), jnp.asarray(1.0),
    )
    return gen, variables, src, cond


def _seq_logprob(gen, variables, src_row, buf_row, cond, max_len):
    """Renormalized log-prob of a decoded buffer under restrictive masking —
    the objective beam search maximizes (teacher-forced replay)."""
    vocab = gen.num_items + 2
    eos = gen.eos
    src = jnp.asarray(src_row[None])
    mem_k, mem_v = gen.apply(variables, src, jnp.asarray([cond]),
                             method=Generator.decode_state)
    memory_valid = src != 0
    in_src = np.zeros(vocab, bool)
    in_src[src_row[src_row > 0]] = True
    in_src[0] = False
    emitted = np.zeros(vocab, bool)
    emitted[gen.sos] = True
    nl, d = gen.num_layers, gen.embed_dim
    ck = jnp.zeros((nl, 1, max_len, d), mem_k.dtype)
    cv = jnp.zeros_like(ck)
    total = 0.0
    for i in range(max_len - 1):
        tok = jnp.asarray([buf_row[i]], jnp.int32)
        logits, ck, cv = gen.apply(
            variables, tok, jnp.asarray(i), ck, cv, mem_k, mem_v,
            memory_valid, method=Generator.cached_decode_step,
        )
        allowed = in_src & ~emitted
        nxt = int(buf_row[i + 1])
        if nxt == 0:  # done padding
            break
        if not allowed.any():  # dead -> forced EOS, no score
            assert nxt == eos
            break
        logp = jax.nn.log_softmax(
            jnp.where(jnp.asarray(allowed), logits[0].astype(jnp.float32),
                      NEG))
        total += float(logp[nxt])
        emitted[nxt] = True
        if nxt == eos:
            break
    return total


def test_beam1_equals_greedy(world):
    gen, variables, src, cond = world
    for gamma in (0.0, 0.5):
        r = jax.random.PRNGKey(3)
        greedy = greedy_decode_batch_cached(
            gen, variables, jnp.asarray(src), jnp.asarray(cond), r,
            max_len=10, gamma=gamma,
        )
        beam1 = beam_decode_batch_cached(
            gen, variables, jnp.asarray(src), jnp.asarray(cond), r,
            max_len=10, gamma=gamma, beam_width=1,
        )
        np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_beam_improves_or_matches_greedy_logprob(world):
    gen, variables, src, cond = world
    max_len = 10
    r = jax.random.PRNGKey(3)
    greedy = np.asarray(greedy_decode_batch_cached(
        gen, variables, jnp.asarray(src), jnp.asarray(cond), r,
        max_len=max_len, gamma=0.0,
    ))
    beam = np.asarray(beam_decode_batch_cached(
        gen, variables, jnp.asarray(src), jnp.asarray(cond), r,
        max_len=max_len, gamma=0.0, beam_width=4,
    ))
    improved = 0
    for i in range(len(src)):
        lp_g = _seq_logprob(gen, variables, src[i], greedy[i], int(cond[i]),
                            max_len)
        lp_b = _seq_logprob(gen, variables, src[i], beam[i], int(cond[i]),
                            max_len)
        assert lp_b >= lp_g - 1e-4, (i, lp_b, lp_g)
        improved += lp_b > lp_g + 1e-4
    # on a random generator at least one lane should strictly improve
    assert improved >= 1


def test_beam_respects_restrictive_mask(world):
    gen, variables, src, cond = world
    beam = np.asarray(beam_decode_batch_cached(
        gen, variables, jnp.asarray(src), jnp.asarray(cond),
        jax.random.PRNGKey(0), max_len=10, gamma=0.0, beam_width=3,
    ))
    eos = gen.eos
    for i, row in enumerate(beam):
        body = row[1:]
        stop = np.where((body == eos) | (body == 0))[0]
        items = body[: stop[0]] if len(stop) else body
        src_items = set(src[i][src[i] > 0].tolist()) - {gen.sos, eos}
        assert set(items.tolist()) <= src_items
        assert len(set(items.tolist())) == len(items)  # no repeats

"""C++ pattern miner vs the brute-force oracle; pair matcher semantics."""

import numpy as np
import pytest

from dr4sr_tpu.regen.miner import (
    brute_force_patterns,
    is_sublist,
    match_pairs,
    mine_patterns,
)


@pytest.fixture(scope="module")
def toy_sequences(   ):
    rng = np.random.default_rng(7)
    return [list(rng.integers(1, 12, size=rng.integers(3, 12))) for _ in range(60)]


def test_miner_matches_brute_force(toy_sequences):
    patterns, freqs = mine_patterns(toy_sequences, max_span=4, min_frequency=3)
    oracle = brute_force_patterns(toy_sequences, max_span=4, min_frequency=3)
    got = {tuple(p): f for p, f in zip(patterns, freqs)}
    assert got == oracle
    # ordered by frequency desc
    assert all(freqs[i] >= freqs[i + 1] for i in range(len(freqs) - 1))


def test_miner_span_constraint():
    # pattern (1, 9) co-occurs in both sequences but 9 is always >4 away
    seqs = [[1, 2, 3, 4, 5, 9], [1, 7, 6, 5, 4, 9]]
    patterns, _ = mine_patterns(seqs, max_span=4, min_frequency=2)
    assert [1, 9] not in patterns
    assert [1] not in patterns  # length >= 2 only
    # (4, 9) is within span 4 in the first (dist 2) and second (dist 2)
    assert [4, 9] in patterns


def test_miner_min_frequency():
    seqs = [[1, 2, 3]] * 5 + [[7, 8]]
    patterns, freqs = mine_patterns(seqs, max_span=3, min_frequency=5)
    got = {tuple(p): f for p, f in zip(patterns, freqs)}
    assert got == {(1, 2): 5, (1, 3): 5, (2, 3): 5, (1, 2, 3): 5}


def test_match_pairs(toy_sequences):
    patterns, _ = mine_patterns(toy_sequences, max_span=4, min_frequency=3)
    matches = match_pairs(toy_sequences, patterns, max_matches=5, seed=1)
    assert len(matches) == len(toy_sequences)
    for seq, idxs in zip(toy_sequences, matches):
        assert len(idxs) <= 5
        assert len(set(idxs)) == len(idxs)
        for p in idxs:
            assert is_sublist(patterns[p], seq)


def test_match_pairs_finds_all_when_under_cap():
    seqs = [[1, 2, 3, 4]]
    patterns = [[1, 2], [2, 4], [1, 3, 4], [4, 1], [5, 6]]
    matches = match_pairs(seqs, patterns, max_matches=10, seed=0)
    assert sorted(matches[0]) == [0, 1, 2]

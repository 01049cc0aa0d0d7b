"""Pattern mining — Python API over the first-party C++ miner.

Replaces Seq2Pat (reference ``1.Build_pretraining_dataset.py:24-28``): mines
frequent ordered subsequences whose occurrences fit in a ``max_span`` window,
with support counted per sequence, keeping ``support >= min_frequency``.
Also exposes the pair matcher replacing the reference's Python
``is_sublist`` scan (``:70-89``).

The shared library builds on demand from ``dr4sr_tpu/cpp/seqminer.cpp``
(g++ -O3 -fopenmp). :func:`brute_force_patterns` is the test oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Sequence, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cpp")
_SRC = os.path.join(_CPP_DIR, "seqminer.cpp")
_LIB = os.path.join(_CPP_DIR, "libseqminer.so")

_lib = None


def _build_lib() -> None:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build_lib()
    lib = ctypes.CDLL(_LIB)
    i64 = ctypes.c_int64
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.mine_patterns.restype = i64
    lib.mine_patterns.argtypes = [p_i32, p_i64, i64, i64, i64, i64]
    lib.patterns_total_len.restype = i64
    lib.get_patterns.argtypes = [p_i32, p_i64, p_i64]
    lib.match_pairs.restype = i64
    lib.match_pairs.argtypes = [p_i32, p_i64, i64, p_i32, p_i64, i64, i64,
                                ctypes.c_uint64, i64]
    lib.get_matches.argtypes = [p_i64, p_i64]
    _lib = lib
    return lib


def _to_csr(seqs: Sequence[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.empty(offsets[-1], np.int32)
    for i, s in enumerate(seqs):
        flat[offsets[i] : offsets[i + 1]] = s
    return flat, offsets


def mine_patterns(
    sequences: Sequence[Sequence[int]],
    max_span: int = 5,
    min_frequency: int = 2,
    n_jobs: int = 0,
) -> Tuple[List[List[int]], List[int]]:
    """Returns (patterns, frequencies), ordered by frequency desc."""
    lib = _load_lib()
    flat, offsets = _to_csr(sequences)
    n = lib.mine_patterns(flat, offsets, len(sequences), max_span, min_frequency, n_jobs)
    total = lib.patterns_total_len()
    pat_flat = np.empty(total, np.int32)
    pat_offsets = np.empty(n + 1, np.int64)
    freqs = np.empty(n, np.int64)
    lib.get_patterns(pat_flat, pat_offsets, freqs)
    patterns = [
        pat_flat[pat_offsets[i] : pat_offsets[i + 1]].tolist() for i in range(n)
    ]
    return patterns, freqs.tolist()


def match_pairs(
    sequences: Sequence[Sequence[int]],
    patterns: Sequence[Sequence[int]],
    max_matches: int = 10,
    seed: int = 2024,
    n_jobs: int = 0,
) -> List[List[int]]:
    """Per sequence, indices of up to ``max_matches`` matching patterns."""
    lib = _load_lib()
    seq_flat, seq_offsets = _to_csr(sequences)
    pat_flat, pat_offsets = _to_csr(patterns)
    total = lib.match_pairs(
        seq_flat, seq_offsets, len(sequences), pat_flat, pat_offsets,
        len(patterns), max_matches, seed, n_jobs,
    )
    flat = np.empty(max(total, 1), np.int64)
    offsets = np.empty(len(sequences) + 1, np.int64)
    lib.get_matches(flat, offsets)
    return [flat[offsets[i] : offsets[i + 1]].tolist() for i in range(len(sequences))]


# ---------------------------------------------------------------------------
# brute-force oracle (tests only)
# ---------------------------------------------------------------------------


def brute_force_patterns(
    sequences: Sequence[Sequence[int]], max_span: int = 5, min_frequency: int = 2
) -> Dict[tuple, int]:
    """Exhaustive window-subsequence enumeration; O(N·L·2^span)."""
    from itertools import combinations

    counts: Dict[tuple, int] = {}
    for seq in sequences:
        seen = set()
        n = len(seq)
        for i in range(n - 1):
            w = min(max_span, n - i)
            tail = list(range(i + 1, i + w))
            for r in range(1, w):
                for combo in combinations(tail, r):
                    seen.add((seq[i],) + tuple(seq[j] for j in combo))
        for p in seen:
            counts[p] = counts.get(p, 0) + 1
    return {p: c for p, c in counts.items() if c >= min_frequency}


def is_sublist(sub: Sequence[int], lst: Sequence[int]) -> bool:
    """Greedy subsequence check (reference ``is_sublist``)."""
    it = iter(lst)
    return all(any(x == y for y in it) for x in sub)

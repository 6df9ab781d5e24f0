"""Edit-based string similarity scorers (rapidfuzz-compatible semantics).

The reference's ``fuzzy`` deduper scores all O(n^2) pairs with a rapidfuzz
scorer and links when ``score > 100*threshold``
(src/liken/dedupers/fuzzy.py:62-83). rapidfuzz is a C++ library; its scoring
*definitions* are public and simple:

- ``ratio``      : normalized Indel similarity = 100 * 2*LCS / (len1+len2)
- ``partial_ratio``: best ``ratio`` of the shorter string against the
  optimal alignment window of the longer (windows of len(shorter) plus the
  partial windows hanging off either edge — mirroring rapidfuzz's pure-
  Python fallback ``fuzz_py.partial_ratio``)
- ``token_sort_ratio``: ratio of whitespace-token-sorted strings
- ``token_set_ratio`` : fuzzywuzzy-style set decomposition
- ``QRatio``     : ratio (no processor configured in the reference)
- ``WRatio``     : weighted combination of ratio/partial variants

``ratio`` and ``partial_ratio`` are golden-tested against the reference's
vectors (test_matrix_dedupers.py fuzzy sweeps); the token/W/Q variants are
best-effort reimplementations of the published algorithm.

These kernels run inside applyInPandas blocks — numpy DP, not per-pair
Python character loops.
"""

from __future__ import annotations

import numpy as np


def _lcs_len(s1: str, s2: str) -> int:
    """Longest common subsequence length, numpy row-DP: O(len1) python
    iterations, each an O(len2) vector op."""
    if not s1 or not s2:
        return 0
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(b.size + 1, dtype=np.int32)
    for ch in a:
        match = prev[:-1] + (b == ch)
        cur = np.maximum.accumulate(np.concatenate(([0], match)))
        cur = np.maximum(cur, prev)
        # running max must also propagate within cur itself
        cur = np.maximum.accumulate(cur)
        prev = cur
    return int(prev[-1])


def ratio(s1: str, s2: str) -> float:
    """rapidfuzz fuzz.ratio: 100 * (1 - indel_dist / (len1+len2))."""
    l1, l2 = len(s1), len(s2)
    if l1 + l2 == 0:
        return 100.0
    lcs = _lcs_len(s1, s2)
    return 100.0 * (2.0 * lcs) / (l1 + l2)


def _partial_ratio_one_way(shorter: str, longer: str) -> float:
    """Max ratio of ``shorter`` against every alignment window of
    ``longer``: left-edge prefixes, full-length windows, right-edge
    suffixes — the window set rapidfuzz's partial_ratio scans."""
    l1, l2 = len(shorter), len(longer)
    if l1 == 0:
        return 100.0
    best = 0.0
    # left-edge partial windows longer[:i], i < l1
    for i in range(1, l1):
        best = max(best, ratio(shorter, longer[:i]))
        if best == 100.0:
            return best
    # full windows
    for i in range(0, l2 - l1 + 1):
        best = max(best, ratio(shorter, longer[i : i + l1]))
        if best == 100.0:
            return best
    # right-edge partial windows
    for i in range(max(l2 - l1 + 1, 1), l2):
        best = max(best, ratio(shorter, longer[i:]))
        if best == 100.0:
            return best
    return best


def partial_ratio(s1: str, s2: str) -> float:
    if len(s1) <= len(s2):
        res = _partial_ratio_one_way(s1, s2)
        if res != 100.0 and len(s1) == len(s2):
            res = max(res, _partial_ratio_one_way(s2, s1))
        return res
    return _partial_ratio_one_way(s2, s1)


def _token_sorted(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(s1: str, s2: str) -> float:
    return ratio(_token_sorted(s1), _token_sorted(s2))


def token_set_ratio(s1: str, s2: str) -> float:
    t1, t2 = set(s1.split()), set(s2.split())
    if not t1 and not t2:
        return 100.0
    sect = t1 & t2
    d12, d21 = t1 - t2, t2 - t1
    if sect and (not d12 or not d21):
        return 100.0
    sect_str = " ".join(sorted(sect))
    s12 = (sect_str + " " + " ".join(sorted(d12))).strip()
    s21 = (sect_str + " " + " ".join(sorted(d21))).strip()
    return max(ratio(s12, s21), ratio(sect_str, s12), ratio(sect_str, s21))


def qratio(s1: str, s2: str) -> float:
    return ratio(s1, s2)


def _levenshtein(s1: str, s2: str) -> int:
    """Unit-cost edit distance (insert/delete/substitute all cost 1),
    numpy row-DP — bit-compatible with SQL ``levenshtein()`` (DuckDB /
    Spark ``F.levenshtein``), which is what makes ``lev_ratio`` the one
    scorer a SQL oracle can recompute exactly."""
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    n = b.size
    idx = np.arange(n + 1, dtype=np.int32)
    prev = idx.copy()
    for i, ch in enumerate(a, start=1):
        # candidate row before intra-row deletions: boundary + sub/ins mins
        c0 = np.empty(n + 1, dtype=np.int32)
        c0[0] = i
        c0[1:] = np.minimum(prev[:-1] + (b != ch), prev[1:] + 1)
        # deletions (cur[j-1] + 1 chains) = min over k<=j of c0[k] + (j - k):
        # running min of (c0 - j), re-add j
        prev = np.minimum.accumulate(c0 - idx) + idx
    return int(prev[-1])


def lev_ratio(s1: str, s2: str) -> float:
    """Normalized Levenshtein similarity: 100 * (1 - lev / max(len1, len2)).
    SQL-oracle-recomputable (levenshtein() is built into DuckDB and Spark)."""
    m = max(len(s1), len(s2))
    if m == 0:
        return 100.0
    return 100.0 * (1.0 - _levenshtein(s1, s2) / m)


def wratio(s1: str, s2: str) -> float:
    """rapidfuzz fuzz.WRatio (published weighting scheme)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    len_ratio = max(l1, l2) / min(l1, l2)
    base = ratio(s1, s2)
    if len_ratio < 1.5:
        return max(base, token_sort_ratio(s1, s2) * 0.95, token_set_ratio(s1, s2) * 0.95)
    partial_scale = 0.9 if len_ratio < 8.0 else 0.6
    return max(
        base,
        partial_ratio(s1, s2) * partial_scale,
        token_sort_ratio(s1, s2) * 0.95 * partial_scale,
        token_set_ratio(s1, s2) * 0.95 * partial_scale,
    )


SCORERS = {
    "simple_ratio": ratio,
    "partial_ratio": partial_ratio,
    "token_sort_ratio": token_sort_ratio,
    "token_set_ratio": token_set_ratio,
    "weighted_ratio": wratio,
    "quick_ratio": qratio,
    "lev_ratio": lev_ratio,
}


_PAD = np.uint32(0xFFFFFFFF)  # not a valid code point -> never matches


def _encode_block(others: list[str]) -> tuple[np.ndarray, np.ndarray]:
    lens = np.array([len(o) for o in others], dtype=np.int64)
    L = int(lens.max()) if len(others) else 0
    mat = np.full((len(others), max(L, 1)), _PAD, dtype=np.uint32)
    for k, o in enumerate(others):
        if o:
            mat[k, : len(o)] = np.frombuffer(o.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


def _lcs_len_block(s: str, others: list[str]) -> np.ndarray:
    """LCS length of ``s`` against every string in ``others`` at once —
    the scalar ``_lcs_len`` recurrence vectorized across the block (one
    numpy op over (B, L) per character of ``s`` instead of B python DPs)."""
    B = len(others)
    if B == 0:
        return np.zeros(0, dtype=np.int64)
    a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    mat, lens = _encode_block(others)
    prev = np.zeros((B, mat.shape[1] + 1), dtype=np.int32)
    if a.size == 0:
        return np.zeros(B, dtype=np.int64)
    zero = np.zeros((B, 1), dtype=np.int32)
    for ch in a:
        match = prev[:, :-1] + (mat == ch)
        cur = np.maximum.accumulate(np.concatenate([zero, match], axis=1), axis=1)
        cur = np.maximum(cur, prev)
        cur = np.maximum.accumulate(cur, axis=1)
        prev = cur
    return prev[np.arange(B), lens].astype(np.int64)


def _ratio_block(s: str, others: list[str]) -> np.ndarray:
    lens = np.array([len(o) for o in others], dtype=np.float64)
    denom = len(s) + lens
    lcs = _lcs_len_block(s, others).astype(np.float64)
    out = np.where(denom == 0, 100.0, 100.0 * 2.0 * lcs / np.where(denom == 0, 1, denom))
    return out


def _levenshtein_block(s: str, others: list[str]) -> np.ndarray:
    """Unit-cost edit distance of ``s`` vs every string in the block —
    the scalar ``_levenshtein`` recurrence vectorized across (B, L)."""
    B = len(others)
    if B == 0:
        return np.zeros(0, dtype=np.int64)
    mat, lens = _encode_block(others)
    a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    if a.size == 0:
        return lens.copy()
    n = mat.shape[1]
    idx = np.arange(n + 1, dtype=np.int32)
    prev = np.tile(idx, (B, 1))
    for i, ch in enumerate(a, start=1):
        c0 = np.empty((B, n + 1), dtype=np.int32)
        c0[:, 0] = i
        c0[:, 1:] = np.minimum(prev[:, :-1] + (mat != ch), prev[:, 1:] + 1)
        prev = np.minimum.accumulate(c0 - idx, axis=1) + idx
    return prev[np.arange(B), lens].astype(np.int64)


def _lev_ratio_block(s: str, others: list[str]) -> np.ndarray:
    lens = np.array([len(o) for o in others], dtype=np.float64)
    m = np.maximum(len(s), lens)
    lev = _levenshtein_block(s, others).astype(np.float64)
    return np.where(m == 0, 100.0, 100.0 * (1.0 - lev / np.where(m == 0, 1, m)))


_BLOCK_SCORERS = {
    "simple_ratio": _ratio_block,
    "quick_ratio": _ratio_block,
    "lev_ratio": _lev_ratio_block,
}


def pairwise_scores(values: list[str], scorer_name: str) -> "np.ndarray":
    """Dense upper-triangular score matrix for a block of strings.

    Ratio-family scorers run the row-vs-rest DP vectorized across the block
    (numpy ops over (B, L) slabs — ~50x over per-pair python DP); the
    token/partial/weighted variants fall back to per-pair kernels."""
    n = len(values)
    out = np.zeros((n, n), dtype=np.float64)
    block_fn = _BLOCK_SCORERS.get(scorer_name)
    if block_fn is not None:
        for i in range(n - 1):
            out[i, i + 1 :] = block_fn(values[i], values[i + 1 :])
        return out
    scorer = SCORERS.get(scorer_name, ratio)
    for i in range(n):
        for j in range(i + 1, n):
            out[i, j] = scorer(values[i], values[j])
    return out

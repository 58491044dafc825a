"""Pairwise string-similarity kernels: Jaro-Winkler and token Jaccard.

These are the "cheap prefilters" of the scoring stage (north rule).  Both
operate on *arrays of candidate pairs* at once:

- :func:`jaro_winkler_pairs` vectorizes over pairs with NumPy: the only Python
  loop is over character *positions* (bounded by ``max_len``), never over
  pairs.  Intended for post-blocking candidate sets (thousands of pairs per
  batch), not for the full cross product.
- :func:`jaccard_pairs` estimates token/char-gram Jaccard from MinHash
  signature agreement — O(pairs × num_perms) with pure ufuncs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import flat_utf8

__all__ = ["pad_codes", "jaro_winkler_pairs", "jaro_winkler", "jaccard_pairs", "levenshtein_pairs"]


def pad_codes(strings: pa.Array | pa.ChunkedArray, max_len: int = 32) -> tuple[np.ndarray, np.ndarray]:
    """(n, max_len) uint8 zero-padded byte matrix + (n,) true lengths (clipped)."""
    data, offsets = flat_utf8(strings)
    n = len(offsets) - 1
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    clipped = np.minimum(lengths, max_len)
    mat = np.zeros((n, max_len), dtype=np.uint8)
    if len(data):
        # Gather: position j of row i = data[offsets[i] + j] where j < len_i.
        for j in range(int(clipped.max(initial=0))):
            m = j < clipped
            mat[m, j] = data[offsets[:-1][m] + j]
    return mat, clipped


def jaro_winkler_pairs(
    a: np.ndarray, la: np.ndarray, b: np.ndarray, lb: np.ndarray, prefix_weight: float = 0.1
) -> np.ndarray:
    """Jaro-Winkler similarity for P pairs of padded byte rows.

    ``a``/``b``: (P, L) uint8 matrices from :func:`pad_codes`; ``la``/``lb``
    their lengths.  Returns (P,) float64 in [0, 1].
    """
    P, L = a.shape
    if P == 0:
        return np.zeros(0, dtype=np.float64)
    la = la.astype(np.int64)
    lb = lb.astype(np.int64)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    pos = np.arange(L, dtype=np.int64)
    valid_a = pos[None, :] < la[:, None]
    valid_b = pos[None, :] < lb[:, None]
    # eq[p, i, j]: a[p,i] == b[p,j], both positions valid, |i-j| <= window.
    eq = (a[:, :, None] == b[:, None, :]) & valid_a[:, :, None] & valid_b[:, None, :]
    dist_ok = np.abs(pos[None, :, None] - pos[None, None, :]) <= window[:, None, None]
    eq &= dist_ok

    # Greedy matching in i-order, each i takes the lowest unused j in window.
    b_used = np.zeros((P, L), dtype=bool)
    a_match = np.full((P, L), -1, dtype=np.int64)
    for i in range(L):
        cand = eq[:, i, :] & ~b_used
        has = cand.any(axis=1)
        j = cand.argmax(axis=1)
        a_match[has, i] = j[has]
        b_used[has, j[has]] = True

    m = (a_match >= 0).sum(axis=1).astype(np.float64)

    # Transpositions: compare matched a-chars (in i order) with matched
    # b-chars (in j order); half the mismatches.
    matched_mask = a_match >= 0
    a_chars = np.where(matched_mask, a, 0)
    b_matched = np.where(b_used, b, 0)
    # Compact matched chars to the left, preserving order, via argsort on ~mask.
    order_a = np.argsort(~matched_mask, axis=1, kind="stable")
    order_b = np.argsort(~b_used, axis=1, kind="stable")
    a_seq = np.take_along_axis(a_chars, order_a, axis=1)
    b_seq = np.take_along_axis(b_matched, order_b, axis=1)
    t = ((a_seq != b_seq) & (np.arange(L)[None, :] < m[:, None])).sum(axis=1) / 2.0

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - t) / np.maximum(m, 1)) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)
    jaro = np.where((la == 0) & (lb == 0), 1.0, jaro)

    # Winkler prefix boost (common prefix up to 4).
    pl = min(4, L)
    prefix_eq = (a[:, :pl] == b[:, :pl]) & (np.arange(pl)[None, :] < np.minimum(la, lb)[:, None])
    ell = np.cumprod(prefix_eq, axis=1).sum(axis=1).astype(np.float64)
    return jaro + ell * prefix_weight * (1.0 - jaro)


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Scalar convenience wrapper (tests / reports only — not a hot path)."""
    arr = pa.array([s1, s2])
    mat, lens = pad_codes(arr, max_len=max(len(s1.encode()), len(s2.encode()), 1))
    return float(
        jaro_winkler_pairs(mat[:1], lens[:1], mat[1:], lens[1:], prefix_weight)[0]
    )


def jaccard_pairs(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard from MinHash signature agreement.

    ``sig_a``/``sig_b``: (P, num_perms) uint64 signatures of the two sides of
    P candidate pairs.  Returns (P,) float64 estimates.
    """
    if sig_a.shape[0] == 0:
        return np.zeros(0, dtype=np.float64)
    return (sig_a == sig_b).mean(axis=1)


def levenshtein_pairs(
    am: np.ndarray, la: np.ndarray, bm: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein (unit-cost) distance per row pair, vectorized ACROSS
    pairs: the classic rolling-row DP where each DP cell is an (n_pairs,)
    vector — O(max_len²) numpy ops total, never a Python loop over pairs.
    Inputs are the ``pad_codes`` byte matrices + true lengths (byte-level
    distance; identical to character distance for ASCII keys).  Integer-exact,
    so results hash-match DuckDB's ``levenshtein`` on the same strings.

    Correctness with padding: row ``i`` of the DP is captured for exactly the
    pairs whose ``la == i`` (the final answer ``dp[la][lb]``); cells at
    ``j > lb`` are never read, and cell ``(i, j)`` only depends on prefixes
    ``≤ i, ≤ j``, so the zero padding never leaks into a captured value.
    """
    n = am.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    max_a = int(la.max(initial=0))
    max_b = int(lb.max(initial=0))
    dp = np.tile(np.arange(max_b + 1, dtype=np.int64), (n, 1))
    res = np.where(la == 0, lb, 0).astype(np.int64)
    rows = np.arange(n)
    for i in range(1, max_a + 1):
        prev_diag = dp[:, 0].copy()
        dp[:, 0] = i
        ai = am[:, i - 1]
        for j in range(1, max_b + 1):
            tmp = dp[:, j].copy()
            cost = (ai != bm[:, j - 1]).astype(np.int64)
            dp[:, j] = np.minimum(np.minimum(tmp + 1, dp[:, j - 1] + 1), prev_diag + cost)
            prev_diag = tmp
        done = la == i
        if done.any():
            res[done] = dp[rows[done], lb[done]]
    return res

"""Dense similarity measures + deterministic top-k.

Measures mirror the reference's ``measure ∈ {ip, cos, l2}`` choice
(``mix_blink/argparser.py:42``, ``mix_blink/retriever/dense.py:41-46``) with
one deliberate fix: the engine scores ``l2`` as *negative* L2 distance so
"higher is better" holds for every measure.  (The reference's training path
scores raw ``torch.cdist`` without negation — ``mix_blink/training/
trainer.py:235`` — which inverts the ranking; SURVEY.md §2.11 item 1.)

Top-k tie-breaking is deterministic: ``(score desc, candidate index asc)`` —
required for byte-identical reruns (FIXTURES.md "Determinism requirements").
"""

from __future__ import annotations

import numpy as np

MEASURES = ("ip", "cos", "l2")

__all__ = ["MEASURES", "score_matrix", "topk_indices", "l2_normalize"]


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    out = mat.astype(np.float32, copy=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def score_matrix(queries: np.ndarray, catalog: np.ndarray, measure: str = "ip") -> np.ndarray:
    """(Q, V) score matrix; higher = more similar for every measure.

    ``cos`` assumes both sides are already L2-normalized (the caller
    normalizes once, not per batch — reference normalizes at index-build/query
    time: ``dense.py:81-82, 92-93``).
    """
    if measure in ("ip", "cos"):
        return queries @ catalog.T
    if measure == "l2":
        # -||q - c||^2 expanded; monotone in -L2, cheaper than cdist.
        q2 = (queries * queries).sum(axis=1, keepdims=True)
        c2 = (catalog * catalog).sum(axis=1)
        return 2.0 * (queries @ catalog.T) - q2 - c2[None, :]
    raise ValueError(f"measure must be one of {MEASURES}, got {measure!r}")


_ROW_TILE = 16384  # rows per top-k tile; see topk_indices


def topk_indices(scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic top-k per row: ``(indices (Q,k), scores (Q,k))``.

    k is clamped to the number of candidates (reference clamps with a warning,
    ``mix_blink/retriever/dense.py:89-91``); k <= 0 raises (reference
    ``dense.py:87-88`` semantics).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    q, v = scores.shape
    k = min(k, v)
    if q > _ROW_TILE and k < v:
        # Row tiling: the general path's np.argpartition materializes a
        # FULL-width int64 permutation — multi-GB for a (300k, 1500) score
        # matrix — and becomes memory-traffic-bound (measured 7× slower than
        # 16k-row tiles at k=15).  Tiles keep the working set cache-sized;
        # results are row-independent so concatenation is exact.
        parts = [
            topk_indices(scores[lo : lo + _ROW_TILE], k)
            for lo in range(0, q, _ROW_TILE)
        ]
        return (
            np.concatenate([p[0] for p in parts], axis=0),
            np.concatenate([p[1] for p in parts], axis=0),
        )
    if k == v:
        part = np.broadcast_to(np.arange(v), (q, v)).copy()
    elif k <= 8:
        # Small-k fast path: k argmax sweeps.  np.argpartition materializes a
        # FULL-width int64 permutation — ~4 GB for a (300k, 1500) score
        # matrix — and its tie repair re-scans everything; k linear argmax
        # passes touch only the float matrix and are exactly lexicographic
        # already (np.argmax returns the FIRST maximum ⇒ score desc, index
        # asc — the same contract as the general path below).
        s = scores.copy()
        idx = np.empty((q, k), dtype=np.int64)
        out = np.empty((q, k), dtype=scores.dtype)
        rows = np.arange(q)
        for j in range(k):
            i = np.argmax(s, axis=1)
            idx[:, j] = i
            out[:, j] = s[rows, i]
            if j + 1 < k:
                s[rows, i] = -np.inf
        return idx, out
    else:
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        # argpartition picks ARBITRARY members of a tie straddling the k-th
        # boundary; rows with such ties get an exact (lexicographic) re-pick.
        kth = np.take_along_axis(scores, part, axis=1).min(axis=1)
        tie_rows = np.flatnonzero((scores >= kth[:, None]).sum(axis=1) > k)
        if len(tie_rows):
            full = np.lexsort(
                (np.broadcast_to(np.arange(v), (len(tie_rows), v)), -scores[tie_rows]),
                axis=1,
            )[:, :k]
            part[tie_rows] = full
    part_scores = np.take_along_axis(scores, part, axis=1)
    # Stable order: score desc, then candidate index asc.
    order = np.lexsort((part, -part_scores), axis=1)
    idx = np.take_along_axis(part, order, axis=1)[:, :k]
    out_scores = np.take_along_axis(part_scores, order, axis=1)[:, :k]
    return idx, out_scores

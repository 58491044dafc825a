"""Exact integer grouped reductions for map-side partials.

The engine's bit-exactness contract (integer moments replayed by BIGINT
oracles) requires every per-batch partial sum to be EXACT int64.  A
``np.bincount(idx, weights=v.astype(np.float64))`` partial silently rounds
once a group's per-batch sum crosses 2⁵³ — sums of cents² (~1e10/row) get
there around ~1e6 rows per group per batch (round-3 ADVICE item 1), and the
DuckDB side would instead RAISE on BIGINT overflow, so parity diverges
either way.  :func:`group_sums_int64` keeps the accumulation in int64 end to
end via a segment reduce (argsort + ``np.add.reduceat``) — same vectorized
cost class as bincount, no float path.

int64 itself overflows past ~9.2e18; with cents² elements (~1e14) that is
~90k rows per (group, batch) at the worst — far above the engine's batch
sizes — and the cross-batch merge runs through Ray's int64 ``Sum``, which
matches BIGINT width, so engine and oracle overflow (or don't) together.
"""

from __future__ import annotations

import numpy as np

__all__ = ["group_sums_int64"]


def group_sums_int64(idx: np.ndarray, n_groups: int, *vals: np.ndarray) -> list[np.ndarray]:
    """Exact int64 grouped sums: one output array of length ``n_groups`` per
    entry of ``vals``, where ``out[g] = Σ v[i] for idx[i] == g``.

    ``idx`` must be int group indices in ``[0, n_groups)``; every ``v`` is
    coerced to int64 before summation (callers pass integer-valued arrays —
    cents, counts, products of the two)."""
    if len(idx) == 0:
        return [np.zeros(n_groups, dtype=np.int64) for _ in vals]
    order = np.argsort(idx, kind="stable")
    si = idx[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    gids = si[starts]
    outs = []
    for v in vals:
        seg = np.add.reduceat(np.asarray(v, dtype=np.int64)[order], starts)
        out = np.zeros(n_groups, dtype=np.int64)
        out[gids] = seg
        outs.append(out)
    return outs

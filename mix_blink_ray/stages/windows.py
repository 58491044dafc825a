"""Bucketed ordered-run exchange for per-key ORDERED window operators
(sessionize / lag / sliding frames / as-of / LOCF / funnel / paths).

``groupby(user).map_groups(fn)`` pays one Python callback + table slice per
key — at tens of millions of users that per-key Python dominates wall time
(the same hotspot class the pair generators had before
``stages.dedup.grouped_run_pairs``; round-4 VERDICT item 1).  Here keys hash
to a BOUNDED set of coarse buckets (a key's rows always co-locate), ONE
``groupby(bucket)`` shuffle runs, each bucket is sorted by
``(key, *order_cols)`` with an Arrow kernel, run boundaries come from one
vectorized not-equal, and the caller's kernel is invoked ONCE PER BUCKET over
the segment arrays — so every per-run computation must be (and in this repo
is) a segmented numpy kernel (``reduceat`` / offset-``searchsorted`` /
``maximum.accumulate`` with run-base masking), never a per-key loop.

Partitioning assumption (unchanged from the map_groups versions, now pooled):
one BUCKET of keys fits one worker.  Bucket count scales with cluster size
(and can be raised explicitly for bigger corpora), so per-task volume is
``rows / n_buckets`` regardless of key skew beyond a single key.

The reference has no windowed operators (SURVEY §2.9 — batch-only); these
serve the engine's events suite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

__all__ = [
    "all_pairs_within_runs",
    "grouped_ordered_runs",
    "grouped_weighted_mode",
    "run_index",
    "segment_offset_ts",
]


def _default_buckets() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(256, 2 * cpus)


def run_index(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Per-row run id for segment arrays (``np.repeat`` over run lengths)."""
    return np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)


def all_pairs_within_runs(
    starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All unordered index pairs (i < j) WITHIN each run, fully vectorized.

    Unlike :func:`mix_blink_ray.stages.dedup.grouped_run_pairs` — whose
    ``pair_fn`` fires a Python call per COLLIDING key, fine when collisions
    are rare (LSH bands) but the measured hotspot class when EVERY key
    collides (market baskets: every order has ≥ 2 items) — this emits the
    triangular expansion for every run in one shot: each row ``g`` in a run
    ending at ``e`` appears ``e − 1 − g`` times on the left, and its right
    partners are the consecutive rows ``g+1 … e−1`` recovered by one global
    ``arange`` minus per-left-block offsets.  No Python per run, no Python
    per pair.  Returns ``(left, right)`` global row indices; output size is
    ``Σ len·(len−1)/2`` — the caller guards run length (pair emission is
    inherently quadratic per key)."""
    n = int(ends[-1]) if len(ends) else 0
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z
    g = np.arange(n, dtype=np.int64)
    # per-row left-appearance count: rows until the end of the row's own run
    cnt = np.repeat(ends, ends - starts) - 1 - g
    total = int(cnt.sum())
    if total == 0:
        z = np.empty(0, np.int64)
        return z, z
    left = np.repeat(g, cnt)
    block_start = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    right = left + 1 + (np.arange(total, dtype=np.int64) - np.repeat(block_start, cnt))
    return left, right


def segment_offset_ts(
    ts: np.ndarray, starts: np.ndarray, ends: np.ndarray, pad: int
) -> tuple[np.ndarray, np.ndarray]:
    """Lift per-run-sorted timestamps into ONE globally sorted axis by adding
    ``run_id * BIG`` where ``BIG > global span + pad`` — after which a single
    ``np.searchsorted`` answers every run's range queries at once (a window
    of width ≤ ``pad`` can never cross a run boundary).  Returns
    ``(ts_adj, rid)``.  The standard segmented-searchsorted trick; overflow
    is impossible for any realistic bucket (runs ≤ rows ≤ 2^31, span in µs ≤
    2^45 ⇒ products < 2^63 — asserted)."""
    rid = run_index(starts, ends)
    if len(ts) == 0:
        return ts.astype(np.int64), rid
    lo = int(ts.min())
    big = int(ts.max()) - lo + int(pad) + 2
    if big * len(starts) >= 2**63:
        raise ValueError("segment_offset_ts: span × runs exceeds int64")
    return (ts.astype(np.int64) - lo) + rid * big, rid


def grouped_weighted_mode(
    cells: Dataset,
    key_col: str,
    value_col: str,
    weight_col: str,
    min_col: str | None = None,
    n_buckets: int | None = None,
) -> Dataset:
    """Per-key WEIGHTED MODE over pre-contracted (key, value, weight[, min])
    cells: one row per key with the value of maximum total weight (ties →
    smallest value), the key's total weight, and (optionally) the min over
    ``min_col`` — the survivorship / most-frequent-attribute primitive
    (golden records, per-user primary type).  Callers contract raw rows to
    cells map-side first, so the exchange is distinct-cell bounded; the
    consolidation itself is ONE ``grouped_ordered_runs`` pass: sub-segment
    ``reduceat`` sums per (key, value), per-key first-max pick via
    ``minimum.reduceat`` on masked indices — no per-key Python, no second
    aggregate, no final join.  Output columns: ``key_col``,
    ``mode_<value_col>``, ``total_<weight_col>`` (+ ``min_<min_col>``)."""
    out_mode = f"mode_{value_col}"
    out_total = f"total_{weight_col}"
    out_min = f"min_{min_col}" if min_col else None

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        if n == 0:
            cols = {
                key_col: g[key_col],
                out_mode: g[value_col],
                out_total: pa.array([], pa.int64()),
            }
            if min_col:
                cols[out_min] = pa.array([], pa.int64())
            return pa.table(cols)
        vals = g[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        w = np.asarray(g[weight_col], dtype=np.int64)
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)
        # sub-segments: (key run, value) — rows are value-sorted per run
        val_neq = np.asarray(pc.not_equal(vals.slice(1), vals.slice(0, n - 1)), dtype=bool)
        sub_starts = np.flatnonzero(np.r_[True, (rid[1:] != rid[:-1]) | val_neq]).astype(np.int64)
        sums = np.add.reduceat(w, sub_starts)
        sub_key = rid[sub_starts]
        key_starts = np.flatnonzero(np.r_[True, sub_key[1:] != sub_key[:-1]]).astype(np.int64)
        seg_len = np.diff(np.r_[key_starts, len(sub_key)])
        max_rep = np.repeat(np.maximum.reduceat(sums, key_starts), seg_len)
        idx = np.arange(len(sums), dtype=np.int64)
        cand = np.where(sums == max_rep, idx, len(sums))
        firsts = np.minimum.reduceat(cand, key_starts)  # first max = smallest value
        cols = {
            key_col: g[key_col].take(pa.array(starts)),
            out_mode: vals.take(pa.array(sub_starts[firsts])),
            out_total: pa.array(np.add.reduceat(w, starts)),
        }
        if min_col:
            cols[out_min] = pa.array(
                np.minimum.reduceat(np.asarray(g[min_col], dtype=np.int64), starts)
            )
        return pa.table(cols)

    return grouped_ordered_runs(cells, key_col, (value_col,), kernel, n_buckets=n_buckets)


def grouped_ordered_runs(
    rows: Dataset,
    key_col: str,
    order_cols: tuple[str, ...],
    kernel,
    n_buckets: int | None = None,
) -> Dataset:
    """Run ``kernel(group, starts, ends)`` over key-runs with ONE shuffle and
    Python callbacks ∝ n_buckets (never ∝ n_keys).

    ``kernel`` receives the whole bucket as a ``pa.Table`` sorted by
    ``(key_col, *order_cols)`` plus the run boundary arrays (``starts[i]`` /
    ``ends[i]`` delimit key i's rows) and returns a ``pa.Table``; it MUST be
    vectorized across runs and must handle the empty table (schema probe).
    """
    from ..functions.hashing import _SEED_MIX, flat_utf8, hash_strings

    if n_buckets is None:
        n_buckets = _default_buckets()

    def add_bucket(b: pa.Table) -> pa.Table:
        col = b[key_col].combine_chunks() if isinstance(b[key_col], pa.ChunkedArray) else b[key_col]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_strings(*flat_utf8(col))
        else:
            h = np.asarray(col, dtype=np.int64).view(np.uint64) * _SEED_MIX
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    sort_keys = [(key_col, "ascending")] + [(c, "ascending") for c in order_cols]

    def bucket_fn(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_bucket"]).combine_chunks()
        n = g.num_rows
        if n == 0:
            return kernel(g, np.empty(0, np.int64), np.empty(0, np.int64))
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        keys = g[key_col].combine_chunks() if isinstance(g[key_col], pa.ChunkedArray) else g[key_col]
        neq = np.asarray(pc.not_equal(keys.slice(1), keys.slice(0, n - 1)), dtype=bool)
        starts = np.flatnonzero(np.r_[True, neq]).astype(np.int64)
        ends = np.r_[starts[1:], n].astype(np.int64)
        return kernel(g, starts, ends)

    return (
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_fn, batch_format="pyarrow")
    )

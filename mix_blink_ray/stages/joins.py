"""Skew-safe (salted) partitioned join.

A hash join partitions both sides by ``hash(key) % P``.  When the probe side
is skewed — a handful of hot keys carrying most rows (power-law user ids,
low-cardinality event types, the head of any web corpus) — every row of a hot
key lands in ONE partition: that join task gets the whole key's data while
the other P−1 idle, and at 100 TB the hot partition OOMs long before the
cluster is busy.  The standard fix (the brief's "salt hot keys"): widen the
join key with a salt.  The big side gets a deterministic per-row salt in
``[0, n_salts)``; the small side is replicated once per salt value; the join
runs on ``(key, salt)``, so a hot key's rows spread over ``n_salts``
partitions.  The result multiset is IDENTICAL to the unsalted join (every
big row still meets every matching small row exactly once — at exactly one
salt), verified by the parity tests in ``tests/test_salted_join.py``.

Cost model: small side is shipped ``n_salts`` times (it is small — that is
the precondition; above a broadcast threshold you'd range-partition the hot
keys instead), big side is shipped once, and maximum partition size drops by
``n_salts`` for the hottest key.  The salt derives from a row-stable column
via splitmix64, not RNG or batch position, so task retries and re-blocking
reproduce identical block contents (Ray may recompute any block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .sketches import splitmix64

__all__ = ["salted_join", "interval_join"]


def salted_join(
    big: Dataset,
    small: Dataset,
    on: str,
    right_on: str,
    salt_from: str,
    n_salts: int = 16,
    num_partitions: int = 16,
    join_type: str = "inner",
) -> Dataset:
    """Inner/left join ``big ⋈ small`` on ``big[on] == small[right_on]``,
    hot-key-safe.

    ``salt_from`` names a row-stable int64 column on the big side (a unique
    id is ideal; any column uncorrelated with ``on`` works) — the salt is
    ``splitmix64(salt_from) % n_salts``, so the same row always routes to the
    same salt regardless of batch boundaries or retries.  ``right_on`` must
    differ from ``on`` (guards against silently joining a column to itself).
    Ray's join emits left columns + right NON-key columns (``right_on`` and
    the replicated salt are consumed by the join); the left salt helper is
    dropped, so no helper column escapes.
    """
    if on == right_on:
        raise ValueError("right_on must differ from on (join keeps both columns)")

    def add_salt(b: pa.Table) -> pa.Table:
        s = (
            splitmix64(np.asarray(b[salt_from], dtype=np.int64).view(np.uint64))
            % np.uint64(n_salts)
        ).astype(np.int64)
        return b.append_column("__salt", pa.array(s, pa.int64()))

    def replicate(b: pa.Table) -> pa.Table:
        idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), n_salts)
        rep = b.take(pa.array(idx, pa.int64()))
        salts = np.tile(np.arange(n_salts, dtype=np.int64), b.num_rows)
        return rep.append_column("__rsalt", pa.array(salts, pa.int64()))

    joined = big.map_batches(add_salt, batch_format="pyarrow").join(
        small.map_batches(replicate, batch_format="pyarrow"),
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on, "__salt"),
        right_on=(right_on, "__rsalt"),
    )
    return joined.drop_columns(["__salt"])


def interval_join(
    points: Dataset,
    intervals: Dataset,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_us: int = 3_600_000_000,
    num_partitions: int = 16,
) -> Dataset:
    """Partitioned interval-overlap join: every (point, interval) pair with
    ``start <= ts < end``, as a HASH join — the operator Ray Data lacks and a
    plain equi-join can't express.

    Mechanism (the standard bucketing reduction): intervals flat-map to one
    row per covered time bucket of width ``bucket_us`` (vectorized range
    expansion — repeat + cumulative offsets, no Python loop); points key by
    ``ts // bucket_us``; an equi-join on the bucket id co-locates exactly the
    candidate pairs; a post-filter applies the true ``[start, end)`` test.
    Each matching pair meets EXACTLY once — the pair's only candidate bucket
    is the point's own, which appears at most once in the interval's exploded
    list — so no dedup pass is needed (asserted by the brute-force parity
    test).  Both sides shuffle by bucket; neither broadcasts, so both may be
    arbitrarily large.  Cost: interval replication ∝ duration/bucket_us
    (pick the bucket near the median interval length); a bucket hot with
    points can additionally be salted via :func:`salted_join`'s pattern.

    Timestamp columns must be Arrow ``timestamp[us]`` (``ts_col``) /
    ``timestamp[us]`` or int64 microseconds (``start_col``/``end_col``).
    Output: point columns + interval non-key columns, bucket helpers dropped.
    """

    def _us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        return np.asarray(col, dtype=np.int64)

    def explode(b: pa.Table) -> pa.Table:
        s, e = _us(b[start_col]), _us(b[end_col])
        first = s // bucket_us
        last = (e - 1) // bucket_us  # end exclusive: last covered us is e-1
        counts = np.maximum(last - first + 1, 0)
        idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), counts)
        cum = np.concatenate([[0], np.cumsum(counts)])[:-1]
        bucket = first[idx] + (np.arange(int(counts.sum()), dtype=np.int64) - cum[idx])
        rep = b.take(pa.array(idx, pa.int64()))
        return rep.append_column("__ibucket", pa.array(bucket, pa.int64()))

    def bucket_points(b: pa.Table) -> pa.Table:
        bucket = _us(b[ts_col]) // bucket_us
        return b.append_column("__bucket", pa.array(bucket, pa.int64()))

    joined = points.map_batches(bucket_points, batch_format="pyarrow").join(
        intervals.map_batches(explode, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("__bucket",),
        right_on=("__ibucket",),
    )

    def in_range(b: pa.Table) -> pa.Table:
        ts = _us(b[ts_col])
        s, e = _us(b[start_col]), _us(b[end_col])
        return b.filter(pa.array((ts >= s) & (ts < e))).drop_columns(["__bucket"])

    return joined.map_batches(in_range, batch_format="pyarrow")

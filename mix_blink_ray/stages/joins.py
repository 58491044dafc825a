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

__all__ = ["salted_join"]


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

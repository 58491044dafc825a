"""Distributed prefix scan (global running aggregate over a total order).

``SUM(...) OVER (ORDER BY ...)`` has a sequential data dependency that no
``map_batches``/``groupby`` composition expresses, so this is one of the few
operators that drops to raw Ray tasks — the textbook two-phase scan:

1. ``ds.sort(order_keys)`` range-shuffles once; the output blocks are
   globally range-ordered (block *i* holds key range *i*, sorted within).
2. Phase 1: one tiny task per block computes (row_count, value_total) —
   the driver sees ``n_blocks`` scalars, nothing else.
3. The driver computes the exclusive prefix of those totals (an
   ``n_blocks``-long cumsum — microseconds at any scale).
4. Phase 2: one task per block adds its scalar offsets to a local
   vectorized cumsum; results come back as a block-ordered ``Dataset``
   via ``from_arrow_refs`` (refs only — no table touches the driver).

Values are summed as int64 (callers pass integer-scaled money, e.g. cents)
so the running total is exact and association-free — the distributed
result is bit-identical to a sequential scan regardless of block layout,
which is what makes the DuckDB window-SQL oracle exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

__all__ = ["prefix_scan", "grouped_prefix_scan", "budget_mix"]


@ray.remote
def _block_totals(tbl: pa.Table, value_col: str) -> tuple[int, int]:
    v = np.asarray(tbl[value_col], dtype=np.int64) if tbl.num_rows else np.zeros(0, np.int64)
    return tbl.num_rows, int(v.sum())


@ray.remote
def _block_scan(
    tbl: pa.Table, value_col: str, row_offset: int, sum_offset: int, out_col: str, row_col: str
) -> pa.Table:
    v = np.asarray(tbl[value_col], dtype=np.int64) if tbl.num_rows else np.zeros(0, np.int64)
    running = np.cumsum(v) + sum_offset
    rows = np.arange(1, tbl.num_rows + 1, dtype=np.int64) + row_offset
    return tbl.append_column(out_col, pa.array(running, pa.int64())).append_column(
        row_col, pa.array(rows, pa.int64())
    )


def prefix_scan(
    ds: Dataset,
    order_keys: list[str],
    value_col: str,
    out_col: str = "running_sum",
    row_col: str = "row_num",
) -> Dataset:
    """Append exact global ``out_col`` (running int64 sum of ``value_col``)
    and ``row_col`` (1-based global row number) in ``order_keys`` order.

    ``order_keys`` must be a total order (append a unique id last) and
    ``value_col`` must be int64 (integer-scale floats first for exactness).
    """
    ordered = ds.sort(order_keys).materialize()
    refs = ordered.to_arrow_refs()
    totals = ray.get([_block_totals.remote(r, value_col) for r in refs])
    counts = np.array([t[0] for t in totals], dtype=np.int64)
    sums = np.array([t[1] for t in totals], dtype=np.int64)
    row_offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    sum_offs = np.concatenate([[0], np.cumsum(sums)[:-1]])
    out_refs = [
        _block_scan.remote(r, value_col, int(ro), int(so), out_col, row_col)
        for r, ro, so in zip(refs, row_offs, sum_offs)
    ]
    return ray.data.from_arrow_refs(out_refs)


@ray.remote
def _block_group_totals(tbl: pa.Table, group_col: str, value_col: str) -> list[tuple]:
    """Per-group (rows, sum) partials for one block — groups are contiguous
    after the (group, order) sort, so this is a segmented reduce."""
    if tbl.num_rows == 0:
        return []
    g = tbl[group_col].to_numpy(zero_copy_only=False)
    v = np.asarray(tbl[value_col], dtype=np.int64)
    starts = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1])
    ends = np.append(starts[1:], len(g))
    return [(g[s], int(e - s), int(v[s:e].sum())) for s, e in zip(starts, ends)]


@ray.remote
def _block_group_scan(
    tbl: pa.Table,
    group_col: str,
    value_col: str,
    offsets: dict,
    out_col: str,
    row_col: str,
) -> pa.Table:
    """Add per-group scalar offsets to a segmented local cumsum."""
    if tbl.num_rows == 0:
        return tbl.append_column(out_col, pa.array([], pa.int64())).append_column(
            row_col, pa.array([], pa.int64())
        )
    g = tbl[group_col].to_numpy(zero_copy_only=False)
    v = np.asarray(tbl[value_col], dtype=np.int64)
    starts = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1])
    seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(g))))
    # segment-local cumsum: global cumsum minus the running total at each
    # segment start (exact int64, association-free)
    c = np.cumsum(v)
    base = np.concatenate([[0], c[:-1]])[starts]
    local = c - base[seg_of]
    rows_local = np.arange(len(g), dtype=np.int64) - starts[seg_of] + 1
    sum_off = np.array([offsets[g[s]][1] for s in starts], dtype=np.int64)
    row_off = np.array([offsets[g[s]][0] for s in starts], dtype=np.int64)
    return tbl.append_column(out_col, pa.array(local + sum_off[seg_of], pa.int64())).append_column(
        row_col, pa.array(rows_local + row_off[seg_of], pa.int64())
    )


def grouped_prefix_scan(
    ds: Dataset,
    group_col: str,
    order_keys: list[str],
    value_col: str,
    out_col: str = "running_sum",
    row_col: str = "row_num",
) -> Dataset:
    """Per-group exact running int64 sum + 1-based per-group row number in
    ``order_keys`` order — ``SUM(v) OVER (PARTITION BY g ORDER BY ...)``.

    Same two-phase scan as :func:`prefix_scan`, with vector offsets: one
    ``sort([group] + order_keys)`` range-shuffle, then per-block per-group
    partials (the driver sees ``n_blocks × groups_per_block_boundary`` tiny
    tuples, not rows — block boundaries cut at most one group each, so this
    is O(n_blocks + n_groups) driver state; for n_groups beyond driver
    memory, shard the scan by hash(group) first and run one scan per shard).
    """
    ordered = ds.sort([group_col, *order_keys]).materialize()
    refs = ordered.to_arrow_refs()
    partials = ray.get([_block_group_totals.remote(r, group_col, value_col) for r in refs])
    running: dict = {}
    offsets_per_block: list[dict] = []
    for block in partials:
        offs = {}
        for grp, nrows, vsum in block:
            offs[grp] = running.get(grp, (0, 0))
            prev = running.get(grp, (0, 0))
            running[grp] = (prev[0] + nrows, prev[1] + vsum)
        offsets_per_block.append(offs)
    out_refs = [
        _block_group_scan.remote(r, group_col, value_col, offs, out_col, row_col)
        for r, offs in zip(refs, offsets_per_block)
    ]
    return ray.data.from_arrow_refs(out_refs)


def budget_mix(
    ds: Dataset,
    group_col: str,
    order_keys: list[str],
    value_col: str,
    budget: int,
    out_col: str = "cum",
) -> Dataset:
    """Deterministic mixture building: keep each group's rows in
    ``order_keys`` order while the group's running ``value_col`` total stays
    ≤ ``budget`` (inclusive) — the per-source token-quota sampler of a
    training-data mix.  Exact, order-stable, and a pure composition of
    :func:`grouped_prefix_scan` + a map-side filter."""
    scanned = grouped_prefix_scan(ds, group_col, order_keys, value_col, out_col=out_col)

    def gate(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.drop_columns(["row_num"]).filter(
            pc.less_equal(b[out_col], pa.scalar(budget, pa.int64()))
        )

    return scanned.map_batches(gate, batch_format="pyarrow")

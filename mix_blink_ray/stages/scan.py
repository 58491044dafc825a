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

__all__ = ["prefix_scan"]


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

"""Exact distributed quantiles over a bounded-resolution numeric column.

A naive exact quantile needs a global sort (all-to-all shuffle of every row).
For money-like columns the value domain at fixed resolution is SMALL even
when the row count is astronomical — 100 TB of events with values in
[0, 10^6) at cent resolution is only 10^8 distinct cells.  So: quantize each
value to an integer cell (``round(value * scale)``), build per-batch
``(group, cell) → count`` partials with ``np.bincount`` (map-side combine —
only distinct-cell rows enter the exchange), sum the partials with a small
``groupby``, and read the quantiles off the merged weighted histogram.  The
result is EXACT at the chosen resolution (bit-identical to DuckDB's
``quantile_disc`` over the same quantized ints), not a sketch; for
UNBOUNDED-cardinality domains use the log-histogram quantile sketch
(``stages/sketches.dd_registers`` / ``dd_quantiles`` and the grouped
``dd_group_quantiles``): register count bounded by octave span × 2^sub_bits
regardless of distinct values, merge = counter addition (partition
invariant), relative error ≤ 2^-sub_bits, registers replayed bit-exact by
the DuckDB oracle.

Shuffle volume: ``n_groups × n_distinct_cells`` rows of 24 bytes —
independent of row count.  Driver holds the merged histogram only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = ["grouped_exact_quantiles", "grouped_cell_histogram"]


def grouped_cell_histogram(
    ds: Dataset,
    group_col: str,
    value_col: str,
    scale: float = 100.0,
) -> pa.Table:
    """Per-group integer-cell histogram of ``round(value * scale)``: the
    map-side-combined building block shared by every exact order statistic
    here (quantiles, interpolated median, mode).  Shuffle ∝ distinct
    (group, cell) pairs, never rows; returns the merged (group, cell, n)
    table (small: groups × distinct cells)."""

    def partial(b: pa.Table) -> pa.Table:
        cells = np.rint(np.asarray(b[value_col], dtype=np.float64) * scale).astype(np.int64)
        groups = b[group_col].to_numpy(zero_copy_only=False)
        out_g, out_c, out_n = [], [], []
        # few groups per batch in practice; bincount per group stays vectorized
        for g in np.unique(groups):
            gc = cells[groups == g]
            lo, hi = gc.min(), gc.max()
            if hi - lo < 1 << 24:  # dense domain: O(range) bincount
                counts = np.bincount(gc - lo)
                nz = np.flatnonzero(counts)
                uniq, cnt = nz + lo, counts[nz].astype(np.int64)
            else:  # outlier-wide domain: O(n log n) unique, never O(range) memory
                uniq, cnt = np.unique(gc, return_counts=True)
                cnt = cnt.astype(np.int64)
            out_g.append(np.full(len(uniq), g, dtype=object))
            out_c.append(uniq)
            out_n.append(cnt)
        if not out_g:
            return pa.table(
                {group_col: pa.array([], b[group_col].type), "cell": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                group_col: pa.array(np.concatenate(out_g)),
                "cell": pa.array(np.concatenate(out_c)),
                "n_partial": pa.array(np.concatenate(out_n)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "cell"])
        .aggregate(Sum("n_partial", alias_name="n"))
    )
    return pa.Table.from_pandas(hist.to_pandas(), preserve_index=False)


def grouped_exact_quantiles(
    ds: Dataset,
    group_col: str,
    value_col: str,
    qs: list[float],
    scale: float = 100.0,
) -> pa.Table:
    """Per-group exact quantiles of ``round(value * scale) / scale``.

    ``quantile_disc`` semantics (rank ``ceil(q * n)``, 1-based — calibrated
    against DuckDB): always returns an actual data cell, no interpolation,
    so the float division by ``scale`` is the only arithmetic and matches
    SQL bit-for-bit.  Output columns: ``group_col`` then one ``p{q}`` per
    requested quantile (``0.5 → p50``, ``0.99 → p99``).
    """
    tbl = grouped_cell_histogram(ds, group_col, value_col, scale)

    groups = tbl[group_col].to_numpy(zero_copy_only=False)
    cells = np.asarray(tbl["cell"], dtype=np.int64)
    ns = np.asarray(tbl["n"], dtype=np.int64)
    out: dict[str, list] = {group_col: []}
    qcols = [f"p{int(q * 100) if (q * 100) == int(q * 100) else q}" for q in qs]
    for c in qcols:
        out[c] = []
    for g in sorted(set(groups)):
        m = groups == g
        order = np.argsort(cells[m], kind="stable")
        gc, gn = cells[m][order], ns[m][order]
        cum = np.cumsum(gn)
        total = int(cum[-1])
        out[group_col].append(g)
        for q, c in zip(qs, qcols):
            rank = int(np.ceil(q * total))  # 1-based, quantile_disc
            idx = int(np.searchsorted(cum, max(rank, 1)))
            out[c].append(gc[idx] / scale)
    return pa.table(out)

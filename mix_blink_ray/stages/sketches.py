"""Distributed cardinality sketch (HyperLogLog) with map-side register merge.

Exact ``COUNT(DISTINCT)`` needs every distinct key to cross the exchange
(see ``queries.events_distinct_users``).  At 100 TB the distinct set itself
can be too large to shuffle; the standard answer is a mergeable sketch whose
size is FIXED (``m = 2**p`` one-byte registers per group) no matter how many
rows or distinct values stream through.  HyperLogLog register merge is
element-wise ``max`` — associative, commutative, idempotent — so the Ray
plan is: per-batch registers (vectorized numpy), emit only the nonzero
``(group, register, rho)`` rows, one small ``groupby(...).max()`` to merge,
and a driver-side estimate over ``groups × m`` rows.  Shuffle volume is
bounded by ``groups × m`` after combine — row-count free.

Determinism: the value hash is splitmix64 (a fixed public mixing constant
set), so estimates are bit-stable across runs, batch sizes, and partition
layouts (max-merge is order-free) — asserted by the partition-invariance
test.  Relative error ≈ 1.04/sqrt(m) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Max, Sum

__all__ = [
    "cms_counts",
    "hll_distinct",
    "heavy_hitters",
    "splitmix64",
    "CMS_SEEDS",
    "dd_registers",
    "dd_quantiles",
    "dd_estimate",
    "dd_group_registers",
    "dd_group_quantiles",
    "kmv_group_registers",
    "kmv_estimate",
]


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (public-domain constants)."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (binary-search shifts; no
    float log2 — uint64 → f64 is lossy above 2**53 and misrounds near powers
    of two)."""
    x = w.copy()
    n = np.zeros(len(w), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        thresh = np.uint64(1) << np.uint64(64 - s)
        m = x < thresh  # top s bits are zero
        n[m] += s
        x[m] <<= np.uint64(s)
    return n  # w == 0 → 63 (callers mask the all-zero case explicitly)


def _register_partials(b: pa.Table, group_col: str, value_col: str, p: int) -> pa.Table:
    m = 1 << p
    vals = np.asarray(b[value_col], dtype=np.int64).view(np.uint64)
    h = splitmix64(vals)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)  # register index: top p bits
    w = h << np.uint64(p)  # suffix bits, left-aligned
    rho = np.where(w == 0, np.int64(64 - p + 1), _clz64(w) + 1).astype(np.int64)
    groups = b[group_col].to_numpy(zero_copy_only=False)
    out_g, out_r, out_v = [], [], []
    for g in np.unique(groups):  # few groups per batch; inner ops vectorized
        gm = groups == g
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, idx[gm], rho[gm])
        nz = np.flatnonzero(regs)
        out_g.append(np.full(len(nz), g, dtype=object))
        out_r.append(nz.astype(np.int64))
        out_v.append(regs[nz])
    if not out_g:
        return pa.table(
            {
                group_col: pa.array([], b[group_col].type),
                "reg": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            group_col: pa.array(np.concatenate(out_g)),
            "reg": pa.array(np.concatenate(out_r)),
            "rho": pa.array(np.concatenate(out_v)),
        }
    )


def _estimate(regs: np.ndarray, p: int) -> float:
    """Standard HLL estimator with the small-range linear-counting correction
    (Flajolet et al. 2007).  64-bit hashes need no large-range correction."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return float(raw)


def hll_distinct(ds: Dataset, group_col: str, value_col: str, p: int = 12) -> pa.Table:
    """Approximate per-group distinct count of an int64 column.

    Returns ``(group_col, approx_distinct)`` with the estimate rounded to
    int64.  The merged register table (≤ groups × 2**p rows) is the only
    driver-side materialization.
    """
    merged = (
        ds.map_batches(
            lambda b: _register_partials(b, group_col, value_col, p),
            batch_format="pyarrow",
        )
        .groupby([group_col, "reg"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    m = 1 << p
    out_g, out_n = [], []
    for g, sub in merged.groupby(group_col, sort=True):
        regs = np.zeros(m, dtype=np.int64)
        regs[sub["reg"].to_numpy()] = sub["rho"].to_numpy()
        out_g.append(g)
        out_n.append(int(round(_estimate(regs, p))))
    return pa.table({group_col: pa.array(out_g), "approx_distinct": pa.array(out_n, pa.int64())})


def _mg_compress(items: pa.Array, counts: np.ndarray, k: int):
    """Misra-Gries compression of an exact (item, count) table to ≤ k entries.

    Returns ``(items, counts, decrement)`` where ``decrement`` is the amount
    subtracted from EVERY count (0 when the table already fits).  Any item's
    true in-scope count exceeds its kept count by at most ``decrement``."""
    if len(counts) <= k:
        return items, counts, 0
    # (k+1)-th largest count is the uniform decrement
    dec = int(np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)])
    keep = counts > dec
    return items.filter(pa.array(keep)), counts[keep] - dec, dec


def heavy_hitters(
    ds: Dataset,
    value_col: str,
    min_frac: float,
    k: int | None = None,
) -> pa.Table:
    """EXACT frequent items at bounded memory: all values whose count is
    ≥ ``min_frac`` of total rows, with their exact counts.

    Two passes, both shuffle-bounded by the summary size (never the row or
    distinct-value count):

    1. **Misra-Gries candidate pass** — per batch, exact in-batch counts
       (``pc.value_counts``) compressed to ≤ k entries plus the batch's
       actual decrement (a sentinel row), then a ``groupby(value).sum``
       whose input is ≤ (k+1) × blocks rows.  Mergeable-summaries bound
       (Agarwal et al. 2012): any value with true count > Σ decrements
       survives with estimate ≥ true − Σ decrements, so with
       ``k ≥ 1/min_frac`` every true heavy hitter is a candidate.  The
       tracked Σ decrements makes the bound *measured*, not assumed.
    2. **Exact verify pass** — the candidate set (≤ k × blocks values, in
       practice ~k) broadcasts via ``ray.put``; per-batch filtered exact
       counts re-aggregate to exact totals; threshold applied at the end.

    False positives are filtered by pass 2; false negatives are impossible
    while ``Σ decrements < threshold`` — asserted at runtime (raises, never
    silently wrong, if ``k`` was set too small for the distribution).
    """
    if k is None:
        k = max(int(np.ceil(2.0 / min_frac)), 8)
    if k + 1 < 1.0 / min_frac:
        raise ValueError(f"k={k} too small for min_frac={min_frac} (need ≥ {1.0/min_frac:.0f})")

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"item": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
                 "dec": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(b[value_col].combine_chunks() if isinstance(b[value_col], pa.ChunkedArray) else b[value_col])
        items, counts = vc.field("values"), np.asarray(vc.field("counts"), dtype=np.int64)
        items, counts, dec = _mg_compress(items, counts, k)
        n = len(counts)
        # "v:" prefixes real values, "m:" the per-batch metadata row — never
        # a null group key (Ray's sort-based aggregate can't order null vs str)
        tagged = pc.binary_join_element_wise(
            pa.array(["v"] * n, pa.string()), items.cast(pa.string()), ":"
        )
        return pa.table(
            {
                "item": pa.concat_arrays([tagged.combine_chunks() if isinstance(tagged, pa.ChunkedArray) else tagged, pa.array(["m:"], pa.string())]),
                "cnt": pa.array(np.concatenate([counts, [0]]), pa.int64()),
                "dec": pa.array([0] * n + [dec], pa.int64()),
                "rows": pa.array([0] * n + [b.num_rows], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("dec", alias_name="dec"), Sum("rows", alias_name="rows"))
        .to_pandas()
    )
    if merged.empty or "item" not in merged.columns:
        return pa.table({value_col: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    sentinel = merged["item"] == "m:"
    err = int(merged.loc[sentinel, "dec"].sum())
    total = int(merged.loc[sentinel, "rows"].sum())
    if total == 0:
        return pa.table({value_col: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    threshold = min_frac * total
    if err >= threshold:
        raise ValueError(
            f"Misra-Gries error bound {err} ≥ threshold {threshold:.1f}; increase k (k={k})"
        )
    cand = merged.loc[~sentinel & (merged["cnt"] + err >= threshold), "item"].str[2:]
    if not len(cand):
        return pa.table({value_col: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    cand_ref = ray.put(pa.array(sorted(cand), pa.string()))

    def exact_partial(b: pa.Table) -> pa.Table:
        col = b[value_col].combine_chunks() if isinstance(b[value_col], pa.ChunkedArray) else b[value_col]
        col = col.cast(pa.string())
        mask = pc.is_in(col, value_set=ray.get(cand_ref))
        vc = pc.value_counts(col.filter(mask))
        return pa.table(
            {value_col: vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby(value_col)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out = exact[exact["cnt"] >= threshold].sort_values(value_col)
    return pa.table(
        {value_col: pa.array(out[value_col], pa.string()), "cnt": pa.array(out["cnt"], pa.int64())}
    )


# Fixed public row seeds for the Count-Min hash family (digits of pi/e/phi/
# sqrt2 in hex — nothing-up-my-sleeve constants; the SQL oracle embeds the
# same literals so the two sides cannot drift).
CMS_SEEDS = (
    0x243F6A8885A308D3,  # pi
    0xB7E151628AED2A6A,  # e
    0x9E3779B97F4A7C15,  # phi
    0x6A09E667F3BCC908,  # sqrt2
)


def _cms_partials(b: pa.Table, key_col: str, depth: int, width: int) -> pa.Table:
    """Per-batch Count-Min counter partials: the batch's exact per-key counts
    (one ``np.unique`` — keys never leave the batch) scattered into the
    ``depth × width`` counter grid; only NONZERO cells are emitted, so the
    exchange carries ≤ depth × min(width, distinct-in-batch) rows per batch
    regardless of row count."""
    keys = np.asarray(b[key_col], dtype=np.int64).view(np.uint64)
    uniq, cnt = np.unique(keys, return_counts=True)
    cnt = cnt.astype(np.int64)
    out_r, out_i, out_c = [], [], []
    for r in range(depth):
        idx = (splitmix64(uniq ^ np.uint64(CMS_SEEDS[r])) % np.uint64(width)).astype(np.int64)
        cells = np.zeros(width, dtype=np.int64)
        np.add.at(cells, idx, cnt)
        nz = np.flatnonzero(cells)
        out_r.append(np.full(len(nz), r, dtype=np.int64))
        out_i.append(nz)
        out_c.append(cells[nz])
    return pa.table(
        {
            "r": pa.array(np.concatenate(out_r), pa.int64()),
            "idx": pa.array(np.concatenate(out_i), pa.int64()),
            "c_partial": pa.array(np.concatenate(out_c), pa.int64()),
        }
    )


def cms_counts(
    ds: Dataset,
    key_col: str,
    probe_keys: "list[int]",
    depth: int = 4,
    width: int = 2048,
) -> pa.Table:
    """Count-Min point-count estimates for ``probe_keys`` over an int64 key
    column.

    The sketch is the counter-merge dual of :func:`hll_distinct`: per-batch
    counter grids (vectorized, batch-local ``np.unique`` contraction first so
    a cell partial costs one scatter-add, not one row), merged by ONE
    ``groupby(r, idx).sum`` whose input is ≤ depth × width × blocks rows and
    whose output is ≤ depth × width rows — row-count free, key-cardinality
    free.  The estimate for a key is ``min`` over the depth rows of its
    counter (Cormode–Muthukrishnan 2005): always ≥ the true count, within
    ``ε·N`` of it with probability ``1 − (1/2)^depth`` for ``width ≥ 2/ε``.

    Determinism: splitmix64 over fixed public seeds — estimates are
    bit-stable across batch sizes and partition layouts (sum-merge is
    order-free), so the whole sketch replays exactly in DuckDB HUGEINT SQL
    (see ``queries._build_cms_oracle``).

    Returns ``(key_col, est_count)`` sorted by key; absent keys estimate 0
    unless a collision inflates them (the overestimate-only guarantee —
    asserted as a property test with a deliberately narrow grid).
    """
    merged = (
        ds.map_batches(
            lambda b: _cms_partials(b, key_col, depth, width),
            batch_format="pyarrow",
        )
        .groupby(["r", "idx"])
        .aggregate(Sum("c_partial", alias_name="c"))
        .to_pandas()
    )
    grid = np.zeros((depth, width), dtype=np.int64)
    if len(merged):
        grid[merged["r"].to_numpy(), merged["idx"].to_numpy()] = merged["c"].to_numpy()
    probes = np.asarray(sorted(probe_keys), dtype=np.int64)
    est = np.full(len(probes), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        idx = (
            splitmix64(probes.view(np.uint64) ^ np.uint64(CMS_SEEDS[r])) % np.uint64(width)
        ).astype(np.int64)
        est = np.minimum(est, grid[r, idx])
    return pa.table(
        {key_col: pa.array(probes, pa.int64()), "est_count": pa.array(est, pa.int64())}
    )


def _dd_cells(x: np.ndarray, sub_bits: int) -> np.ndarray:
    """Pack each float into its integer log-histogram cell — the quantile
    sketch's register key.  Cell = ``sign · ((e + 1100) · 2^b + m)`` where
    ``|x| = 2^e · (1 + m/2^b + ε)``, ``0 ≤ ε < 2^-b`` — i.e. base-2
    DDSketch-style buckets with 2^b linear sub-buckets per octave, so the
    bucket's lower bound is within relative ``2^-b`` of every member.

    EVERY operation is exact in IEEE double — ``frexp`` is bit extraction;
    ``man·2 ∈ [1,2)``, ``−1``, ``·2^b`` and ``floor`` introduce no rounding
    — which is what lets DuckDB replay the registers bit-for-bit with a
    recursive-doubling powers-of-two table and the same exact ops (no
    transcendental ``ln`` whose last ulp could flip a bucket boundary).
    Cells are monotone in the value (negatives mirror through the sign
    factor; 0 → cell 0; ``e + 1100 > 0`` down to the smallest subnormal),
    so value order == integer cell order.  Raises on non-finite input — a
    quantile over NaN/inf is meaningless and must not be silently bucketed.
    """
    if not np.isfinite(x).all():
        raise ValueError("dd sketch input contains NaN/inf; filter or raise upstream")
    sign = np.sign(x).astype(np.int64)
    man, ex = np.frexp(np.abs(x))
    e = ex.astype(np.int64) - 1
    m = np.floor((man * 2.0 - 1.0) * float(1 << sub_bits)).astype(np.int64)
    cell = sign * (((e + 1100) << np.int64(sub_bits)) + m)
    cell[sign == 0] = 0
    return cell


def _dd_decode(cells: np.ndarray, sub_bits: int):
    """cell → (sign, e, m); the zero cell decodes to (0, 0, 0)."""
    sign = np.sign(cells).astype(np.int64)
    mag = np.abs(cells)
    m = mag & np.int64((1 << sub_bits) - 1)
    e = (mag >> np.int64(sub_bits)) - 1100
    z = sign == 0
    e[z] = 0
    m[z] = 0
    return sign, e, m


def dd_registers(ds: Dataset, value_col: str, sub_bits: int = 7) -> Dataset:
    """Mergeable quantile-sketch registers ``(cell, n)`` for a float column
    of UNBOUNDED value cardinality — the missing primitive the exact
    cent-quantized suite (``stages/quantiles.py``) could not cover: its
    shuffle is ∝ distinct cents, unbounded for arbitrary float64; here the
    register count is bounded by the data's octave span × 2^b (≤ ~537k for
    the FULL double range at b=7, typically a few thousand) regardless of
    row count or distinct values.  Merge is count addition — associative,
    commutative — so registers are bit-identical across batch sizes and
    partition layouts (asserted by the invariance test), the HLL/CMS
    register-determinism convention."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
            )
        cells = _dd_cells(np.asarray(b[value_col], dtype=np.float64), sub_bits)
        uniq, cnt = np.unique(cells, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq), "n_partial": pa.array(cnt.astype(np.int64))}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
    )


def dd_quantiles(ds: Dataset, value_col: str, q_pcts: list, sub_bits: int = 7) -> pa.Table:
    """Quantiles from the dd sketch as INTEGER sufficient statistics: one
    row ``(q_pct, sign, e, m)`` per requested integer percentile — the
    bucket holding the rank-``⌈q·n⌉`` value (1-based, ``quantile_disc``
    rank semantics, integer ceil division so no float rank drift).  The
    bucket's lower bound ``sign·2^e·(1 + m/2^b)`` is within relative
    ``2^-sub_bits`` of the exact quantile (rank-error property test); the
    integer triple is the hash-stable output (the repo's integer-sufficient-
    statistics convention — a float estimate could not hash-match SQL)."""
    regs = dd_registers(ds, value_col, sub_bits).materialize()
    tabs = [t for t in ray.get(regs.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table(
            {
                "q_pct": pa.array([], pa.int64()),
                "sign": pa.array([], pa.int64()),
                "e": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
            }
        )
    tbl = pa.concat_tables(tabs)
    cells = np.asarray(tbl["cell"], dtype=np.int64)
    ns = np.asarray(tbl["n"], dtype=np.int64)
    order = np.argsort(cells)
    cells, ns = cells[order], ns[order]
    cum = np.cumsum(ns)
    nt = int(cum[-1])
    out_q, out_cell = [], []
    for q in q_pcts:
        rank = max((int(q) * nt + 99) // 100, 1)  # integer ceil(q·n/100)
        out_q.append(int(q))
        out_cell.append(cells[int(np.searchsorted(cum, rank))])
    sign, e, m = _dd_decode(np.asarray(out_cell, dtype=np.int64), sub_bits)
    return pa.table(
        {
            "q_pct": pa.array(out_q, pa.int64()),
            "sign": pa.array(sign),
            "e": pa.array(e),
            "m": pa.array(m),
        }
    )


def dd_estimate(sign: np.ndarray, e: np.ndarray, m: np.ndarray, sub_bits: int) -> np.ndarray:
    """Bucket lower bound ``sign·2^e·(1 + m/2^b)`` — exact dyadic float."""
    return sign * np.ldexp(1.0 + m / float(1 << sub_bits), e)


def dd_group_registers(
    ds: Dataset, group_col: str, value_col: str, sub_bits: int = 7
) -> Dataset:
    """Per-group quantile-sketch registers ``(group, cell, n)`` — the
    grouped sibling of :func:`dd_registers`; shuffle bounded by
    groups × octave span × 2^b, never rows or distinct values."""

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], b[group_col].type),
                "cell": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        cells = _dd_cells(np.asarray(b[value_col], dtype=np.float64), sub_bits)
        groups = b[group_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((cells, groups))
        g, c = groups[order], cells[order]
        keep = np.r_[True, (g[1:] != g[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(keep)
        cnt = np.diff(np.r_[starts, len(c)])
        return pa.table(
            {
                group_col: pa.array(g[starts]),
                "cell": pa.array(c[starts]),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "cell"])
        .aggregate(Sum("n_partial", alias_name="n"))
    )


def dd_group_quantiles(
    ds: Dataset, group_col: str, value_col: str, q_pcts: list, sub_bits: int = 7
) -> pa.Table:
    """Per-group sketch quantiles as integer sufficient statistics:
    ``(group, q_pct, sign, e, m)`` rows, same rank semantics and exactness
    contract as :func:`dd_quantiles` (integer ceil-division ranks, bucket
    lower bound within relative 2^-b)."""
    regs = dd_group_registers(ds, group_col, value_col, sub_bits).materialize()
    tabs = [t for t in ray.get(regs.to_arrow_refs()) if t.num_rows]
    out_g, out_q, out_cell = [], [], []
    if tabs:
        tbl = pa.concat_tables(tabs)
        groups = tbl[group_col].to_numpy(zero_copy_only=False)
        cells = np.asarray(tbl["cell"], dtype=np.int64)
        ns = np.asarray(tbl["n"], dtype=np.int64)
        order = np.lexsort((cells, groups))
        groups, cells, ns = groups[order], cells[order], ns[order]
        starts = np.flatnonzero(np.r_[True, groups[1:] != groups[:-1]])
        ends = np.r_[starts[1:], len(groups)]
        for s, epos in zip(starts, ends):
            gc, gn = cells[s:epos], ns[s:epos]
            cum = np.cumsum(gn)
            nt = int(cum[-1])
            for q in q_pcts:
                rank = max((int(q) * nt + 99) // 100, 1)
                out_g.append(groups[s])
                out_q.append(int(q))
                out_cell.append(gc[int(np.searchsorted(cum, rank))])
    sign, e, m = _dd_decode(np.asarray(out_cell, dtype=np.int64), sub_bits)
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q_pct": pa.array(out_q, pa.int64()),
            "sign": pa.array(sign),
            "e": pa.array(e),
            "m": pa.array(m),
        }
    )


def _kmv_partial(b: pa.Table, group_col: str, value_col: str, k: int) -> pa.Table:
    """Per-batch bottom-k partial: distinct (group, value) → splitmix64 →
    the ≤ k smallest distinct hashes per group.  Emitted rows are bounded by
    ``groups_in_batch × k`` regardless of batch size."""
    groups = b[group_col].to_numpy(zero_copy_only=False)
    h = splitmix64(np.asarray(b[value_col], dtype=np.int64).view(np.uint64))
    out_g, out_h = [], []
    for g in np.unique(groups):  # few groups per batch; inner ops vectorized
        hu = np.unique(h[groups == g])  # sorted ascending
        hu = hu[: min(k, len(hu))]
        out_g.append(np.full(len(hu), g, dtype=object))
        out_h.append(hu)
    return pa.table(
        {
            group_col: pa.array(np.concatenate(out_g) if out_g else [], pa.string()),
            "h": pa.array(
                np.concatenate(out_h) if out_h else np.empty(0, np.uint64), pa.uint64()
            ),
        }
    )


def kmv_group_registers(
    ds: Dataset, group_col: str, value_col: str, k: int = 128
) -> dict:
    """Per-group KMV / theta-sketch registers for SET-OPERATION cardinality
    estimates (union / intersection of distinct-value sets — the audience-
    overlap question HLL alone cannot answer without lossy inclusion-
    exclusion at merge time).

    Theta convention: if a group holds ≥ k distinct hashes, ``theta`` is the
    k-th smallest and the register set is every hash STRICTLY below it
    (k − 1 entries); otherwise ``theta = 2**64`` and the set is exact.  The
    single estimator ``est = cnt · 2**64 // theta`` then covers both modes
    (exact mode divides by 2**64 and returns the true count), and any pair
    algebra is exact integer arithmetic over ``theta' = min(theta_a,
    theta_b)`` — which is what makes the whole sketch replayable bit-for-bit
    in DuckDB HUGEINT SQL (``_build_kmv_oracle`` in queries.py).

    Distribution: per-batch partials keep ≤ ``groups × k`` rows (bottom-k
    merge is a distributive aggregate — the k smallest of a union are among
    the k smallest of each part), one ``groupby(group)`` merge, and only the
    ``groups × k`` register rows ever reach the driver.  Shuffle volume is
    row-count AND cardinality free.  Returns ``{group: (theta, sorted tuple
    of retained hashes as Python ints)}``.  Relative error ≈ 1/sqrt(k−2).
    """
    if k < 2:
        raise ValueError("kmv_group_registers: k must be ≥ 2")

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "h": pa.array([], pa.uint64()),
                    "theta_lo": pa.array([], pa.int64()),
                    "theta_hi": pa.array([], pa.int64()),
                }
            )
        hu = np.unique(np.asarray(g["h"], dtype=np.uint64))
        if len(hu) >= k:
            theta = int(hu[k - 1])
            hu = hu[: k - 1]
        else:
            theta = 1 << 64
        n = len(hu)
        return pa.table(
            {
                group_col: pa.array([g[group_col][0].as_py()] * n, pa.string()),
                "h": pa.array(hu, pa.uint64()),
                # 2**64 does not fit any Arrow integer: carry theta as
                # (hi, lo) 32-bit halves and reassemble on the driver.
                "theta_lo": pa.array(np.full(n, theta & 0xFFFFFFFF, np.int64)),
                "theta_hi": pa.array(np.full(n, theta >> 32, np.int64)),
            }
        )

    tbl = (
        ds.map_batches(lambda b: _kmv_partial(b, group_col, value_col, k), batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    out: dict = {}
    for g, sub in tbl.groupby(group_col):
        theta = (int(sub["theta_hi"].iloc[0]) << 32) | int(sub["theta_lo"].iloc[0])
        out[g] = (theta, tuple(int(x) for x in np.sort(sub["h"].to_numpy(dtype=np.uint64))))
    return out


def kmv_estimate(cnt: int, theta: int) -> int:
    """The theta estimator as exact integer floor division (both engine and
    DuckDB HUGEINT replay compute this identical expression)."""
    est = cnt * (1 << 64) // theta
    if est >= 2**63:
        raise ValueError("kmv_estimate: estimate exceeds int64")
    return est

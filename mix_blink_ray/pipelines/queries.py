"""Driver-facing query catalog: every operator from SURVEY.md §2 (plus the
training-data-pipeline suite) as a named pipeline over the testdata tables,
each with a DuckDB oracle SQL string where the semantics are SQL-expressible.

Contract (``__ray_entry__.py``): each callable takes ``sf_dir`` and returns a
Dataset / pandas DataFrame / pyarrow Table; column NAMES (and value rounding)
match the oracle SQL exactly — the driver compares row count + schema +
order-insensitive value hash.

Float discipline: aggregates that sum floats are rounded (both sides) because
distributed summation order differs from DuckDB's; ANN results return integer
ranks only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.ann import AnnConfig, knn_bruteforce, knn_lsh
from ..stages.dedup import (
    DedupConfig,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_near_dup_pairs,
    simhash_fingerprints,
)
from ..stages.text_analysis import LangId, fingerprint_md5, quality_scores, token_stats

__all__ = ["QUERIES", "ORACLE_SQL"]


_SMALL_TABLES = {"region", "nation", "supplier", "customer", "part"}

# Broadcast semi-join key sets above this size fall back to partitioned hash
# joins (~8 B/key ⇒ 20M ≈ 160 MB broadcast array).  Env override exists so
# tests can force the fallback path on tiny inputs.
import os as _os

_SEMI_BROADCAST_LIMIT = int(_os.environ.get("GRAFT_SEMI_BROADCAST_LIMIT", 20_000_000))


def _t(sf_dir: str, name: str, columns: list[str] | None = None):
    """Read a testdata table with column pruning.  The driver's testdata files
    are single-row-group Parquet (one scan task no matter how many CPUs), so
    large tables are split into many blocks right after the read — a cheap
    block split (no shuffle) that restores downstream parallelism."""
    ds = rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
    if name not in _SMALL_TABLES:
        import ray

        ds = ds.repartition(max(8, int(ray.cluster_resources().get("CPU", 8))))
    return ds


def _round_col(col: pa.Array | pa.ChunkedArray, nd: int) -> pa.Array:
    """DuckDB-bit-identical rounding: scale → integer round (half away from
    zero, DuckDB's mode) → divide.  ``pc.round(x, nd)`` itself can return a
    different f64 than DuckDB for the same logical decimal (e.g.
    83.46000000000001 vs 83.46); integer/constant division is deterministic
    on both sides.  SQL counterpart: ``CAST(round(expr * 10^nd) AS BIGINT) / 10^nd.0``."""
    mult = float(10 ** nd)
    scaled = pc.round(
        pc.multiply(pc.cast(col, pa.float64()), pa.scalar(mult)),
        round_mode="half_towards_infinity",
    )
    return pc.divide(pc.cast(scaled, pa.int64()), pa.scalar(mult))


def _round(tbl: pa.Table, cols: dict[str, int]) -> pa.Table:
    for c, nd in cols.items():
        tbl = tbl.set_column(tbl.schema.get_field_index(c), c, _round_col(tbl[c], nd))
    return tbl


def _cents(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """2-decimal money column → exact integer cents.  Integer sums are exact
    and order-independent in f64/int64, so distributed aggregation matches
    DuckDB bit-for-bit — no rounding games (see module docstring)."""
    return pc.cast(pc.round(pc.multiply(pc.cast(col, pa.float64()), pa.scalar(100.0))), pa.int64())


# ── TPC-H-style relational operators (groupby/join/sort/limit) ──────────────


def q1_pricing_summary(sf_dir: str):
    """Grouped aggregate with exact integer-scaled money math (G1 analog)."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us"))))
        price_c = _cents(b["l_extendedprice"])                      # cents, exact
        disc_c = _cents(b["l_discount"])                            # discount in 1/100
        disc_price = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "l_quantity": b["l_quantity"],
                "price_c": price_c,
                "disc_price_c4": disc_price,                        # price·(1-disc) in 10^-4
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("price_c", alias_name="base_c"),
            Sum("disc_price_c4", alias_name="disc_c4"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "l_linestatus": b["l_linestatus"],
                    "sum_qty": b["sum_qty"],
                    "sum_base_price": pc.divide(pc.cast(b["base_c"], pa.float64()), pa.scalar(100.0)),
                    "sum_disc_price": pc.divide(pc.cast(b["disc_c4"], pa.float64()), pa.scalar(10000.0)),
                    "avg_qty": _round_col(b["avg_qty"], 4),
                    "count_order": b["count_order"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q3_top_orders(sf_dir: str):
    """3-way join + grouped revenue + sort + limit (J/T operators).

    Scale plan: customer and orders are the SMALL sides — resolved as
    broadcast semi-joins (`ray.put` key set + `pc.is_in` inside map_batches),
    so only lineitem streams and only the final grouped aggregate shuffles.
    The partitioned `Dataset.join` operator is exercised by
    ``supplier_nation_counts``; a 2-hash-join variant of this query was 3-5×
    slower at sf0.1 — but above ``_SEMI_BROADCAST_LIMIT`` keys the broadcast
    set no longer fits driver/worker heaps (sf100 ⇒ ~10⁸ order keys ≈ 1 GB),
    so the semi-join falls back to partitioned hash joins."""
    import ray

    from ..stages.clustering import clamped_partitions

    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow",
    ).materialize()
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    if building.count() > _SEMI_BROADCAST_LIMIT:
        n_parts = clamped_partitions(
            building.count(), max(8, int(ray.cluster_resources().get("CPU", 8)))
        )
        b_orders = orders.join(
            building, join_type="inner", num_partitions=n_parts, on=("o_custkey",), right_on=("c_custkey",)
        ).select_columns(["o_orderkey"])
        rev_src = li.join(
            b_orders, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",)
        )
    else:
        cust_keys = pa.array(sorted(building.to_pandas()["c_custkey"]), pa.int64())
        cust_ref = ray.put(cust_keys)

        def building_orders(b: pa.Table) -> pa.Table:
            keys = ray.get(cust_ref)
            return b.filter(pc.is_in(b["o_custkey"], value_set=keys)).select(["o_orderkey"])

        b_orders = orders.map_batches(building_orders, batch_format="pyarrow").materialize()
        if b_orders.count() > _SEMI_BROADCAST_LIMIT:
            n_parts = clamped_partitions(
                b_orders.count(), max(8, int(ray.cluster_resources().get("CPU", 8)))
            )
            rev_src = li.join(
                b_orders, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",)
            )
        else:
            order_keys = pa.array(sorted(b_orders.to_pandas()["o_orderkey"]), pa.int64())
            orders_ref = ray.put(order_keys)

            def li_semi(b: pa.Table) -> pa.Table:
                keys = ray.get(orders_ref)
                return b.filter(pc.is_in(b["l_orderkey"], value_set=keys))

            rev_src = li.map_batches(li_semi, batch_format="pyarrow")

    rev = rev_src.map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_c4": pc.multiply(
                    _cents(b["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    agg = rev.groupby("l_orderkey").aggregate(Sum("rev_c4", alias_name="rev_c4"))
    # top-10 via per-block partial top-k + tiny driver merge, not a full sort
    # shuffle of every aggregated order (round-2 VERDICT item 7)
    from ..stages.topk import topk_rows

    top = topk_rows(agg, ["rev_c4", "l_orderkey"], [True, False], 10)
    return pa.table(
        {
            "l_orderkey": top["l_orderkey"],
            "revenue": pc.divide(pc.cast(top["rev_c4"], pa.float64()), pa.scalar(10000.0)),
        }
    )


def nation_customer_stats(sf_dir: str):
    """Broadcast dimension join (small side via driver lookup, J1 analog)."""
    import ray

    nation = _t(sf_dir, "nation").to_pandas()
    lookup_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def enrich2(batch: pa.Table) -> pa.Table:
        import ray as _r

        lut = _r.get(lookup_ref)
        keys = pa.array(list(lut.keys()), pa.int64())
        vals = pa.array([lut[k] for k in lut.keys()], pa.string())
        pos = pc.index_in(batch["c_nationkey"], value_set=keys)
        return batch.append_column("n_name", pc.take(vals, pos)).append_column(
            "acct_c", _cents(batch["c_acctbal"])
        )

    out = (
        cust.map_batches(enrich2, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"), Sum("acct_c", alias_name="acct_c"))
        .map_batches(
            lambda b: pa.table(
                {
                    "n_name": b["n_name"],
                    "n_customers": b["n_customers"],
                    "total_acctbal": pc.divide(pc.cast(b["acct_c"], pa.float64()), pa.scalar(100.0)),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def orders_top10_value(sf_dir: str):
    from ..stages.topk import topk_rows

    return topk_rows(
        _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        ["o_totalprice", "o_orderkey"],
        [True, False],
        10,
    )


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape (local-supplier volume in one region, 6 tables): the
    ONLY fact-fact exchange is a single partitioned hash join
    lineitem ⋈ orders on orderkey; region→nation resolves on the driver.
    supplier→nation and customer→nation resolve map-side from broadcast
    sorted-array luts while each table fits ``_SEMI_BROADCAST_LIMIT``; above
    it (10⁹ customers ⇒ a ~16 GB lut in every worker heap) the q3/q4
    partitioned-join duality kicks in — the nation key attaches via a
    dimension hash join instead (round-3 VERDICT item 2; forced-fallback
    parity test in ``tests/test_fallback_paths.py``).  Revenue is exact
    scaled integers: cents × (10000 − discount-bp), divided once at the
    end."""
    import datetime

    import ray

    from ..stages.clustering import clamped_partitions

    nat = pa.Table.from_pandas(
        _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas(),
        preserve_index=False,
    )
    region = pa.Table.from_pandas(
        _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas(), preserve_index=False
    )
    rkey = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"][0].as_py()
    region_nations = np.sort(
        np.asarray(nat.filter(pc.equal(nat["n_regionkey"], rkey))["n_nationkey"], dtype=np.int64)
    )

    def _lut(tbl_ds, kcol: str, vcol: str):
        t = pa.Table.from_pandas(tbl_ds.to_pandas(), preserve_index=False)
        k = np.asarray(t[kcol], dtype=np.int64)
        v = np.asarray(t[vcol], dtype=np.int64)
        o = np.argsort(k)
        return k[o], v[o]

    lo = pa.scalar(datetime.datetime(1995, 7, 1))
    hi = pa.scalar(datetime.datetime(2000, 7, 1))
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    # ── customer→nation attach: broadcast lut below the limit, else join ──
    cust_ds = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    n_cust = cust_ds.count()  # parquet metadata count
    if n_cust <= _SEMI_BROADCAST_LIMIT:
        cust_ref = ray.put(_lut(cust_ds, "c_custkey", "c_nationkey"))

        def attach_cnat(b: pa.Table) -> pa.Table:
            ck, cv = ray.get(cust_ref)
            ckey = np.asarray(b["o_custkey"], dtype=np.int64)
            cp = np.clip(np.searchsorted(ck, ckey), 0, len(ck) - 1) if len(ck) else np.zeros(0, np.int64)
            c_nat = cv[cp] if len(ck) else np.zeros(len(ckey), np.int64)
            keep = (ck[cp] == ckey) & np.isin(c_nat, region_nations) if len(ck) else np.zeros(len(ckey), bool)
            return pa.table(
                {
                    "o_orderkey": pc.take(b["o_orderkey"], pa.array(np.flatnonzero(keep))),
                    "c_nat": pa.array(c_nat[keep], pa.int64()),
                }
            )

        orders_nat = orders.map_batches(attach_cnat, batch_format="pyarrow")
    else:
        region_cust = cust_ds.map_batches(
            lambda b: pa.table(
                {"c_custkey": b["c_custkey"], "c_nat": pc.cast(b["c_nationkey"], pa.int64())}
            ).filter(pc.is_in(pc.cast(b["c_nationkey"], pa.int64()), value_set=pa.array(region_nations, pa.int64()))),
            batch_format="pyarrow",
        )
        n_parts = clamped_partitions(
            n_cust, max(8, int(ray.cluster_resources().get("CPU", 8)))
        )
        # materialize: caps concurrent hash joins at 2 (3 joins' aggregator
        # actor pools starve a small CPU budget); this side is the
        # date+region-filtered order keys — the small end of the query
        orders_nat = orders.join(
            region_cust, join_type="inner", num_partitions=n_parts,
            on=("o_custkey",), right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "c_nat"]).materialize()

    def to_rev(b: pa.Table) -> pa.Table:
        cents = np.asarray(_cents(b["l_extendedprice"]), dtype=np.int64)
        disc_bp = np.asarray(
            pc.cast(pc.round(pc.multiply(b["l_discount"], 10000.0)), pa.int64()), dtype=np.int64
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "rev_scaled": pa.array(cents * (10000 - disc_bp), pa.int64()),
            }
        )

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]).map_batches(
        to_rev, batch_format="pyarrow"
    )

    # ── supplier→nation attach: same duality (supplier is 10× smaller, but
    # the guard must not assume that) ──
    supp_ds = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    n_supp = supp_ds.count()
    if n_supp <= _SEMI_BROADCAST_LIMIT:
        supp_ref = ray.put(_lut(supp_ds, "s_suppkey", "s_nationkey"))

        def attach_snat(b: pa.Table) -> pa.Table:
            sk, sv = ray.get(supp_ref)
            skey = np.asarray(b["l_suppkey"], dtype=np.int64)
            sp = np.clip(np.searchsorted(sk, skey), 0, len(sk) - 1) if len(sk) else np.zeros(0, np.int64)
            s_nat = sv[sp] if len(sk) else np.zeros(len(skey), np.int64)
            keep = (sk[sp] == skey) if len(sk) else np.zeros(len(skey), bool)
            idx = pa.array(np.flatnonzero(keep))
            return pa.table(
                {
                    "l_orderkey": pc.take(b["l_orderkey"], idx),
                    "rev_scaled": pc.take(b["rev_scaled"], idx),
                    "s_nat": pa.array(s_nat[keep], pa.int64()),
                }
            )

        li_nat = li.map_batches(attach_snat, batch_format="pyarrow")
    else:
        sp_parts = clamped_partitions(
            n_supp, max(8, int(ray.cluster_resources().get("CPU", 8)))
        )
        li_nat = li.join(
            supp_ds.map_batches(
                lambda b: pa.table(
                    {"s_suppkey": b["s_suppkey"], "s_nat": pc.cast(b["s_nationkey"], pa.int64())}
                ),
                batch_format="pyarrow",
            ),
            join_type="inner", num_partitions=sp_parts,
            on=("l_suppkey",), right_on=("s_suppkey",),
        ).select_columns(["l_orderkey", "rev_scaled", "s_nat"])

    joined = li_nat.join(
        orders_nat, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"n_nationkey": pa.array([], pa.int64()), "rev_scaled": pa.array([], pa.int64())}
            )
        s_nat = np.asarray(b["s_nat"], dtype=np.int64)
        c_nat = np.asarray(b["c_nat"], dtype=np.int64)
        keep = s_nat == c_nat  # c_nat already region-filtered at the attach
        nk = s_nat[keep]
        rev = np.asarray(b["rev_scaled"], dtype=np.int64)[keep]
        if not len(nk):
            return pa.table(
                {"n_nationkey": pa.array([], pa.int64()), "rev_scaled": pa.array([], pa.int64())}
            )
        # int64 accumulator (not float-weighted bincount): scaled revenue per
        # item is ~1e11, so a float53 partial could round at large batches
        sums = np.zeros(int(nk.max()) + 1, dtype=np.int64)
        np.add.at(sums, nk, rev)
        nz = np.flatnonzero(sums)
        return pa.table(
            {"n_nationkey": pa.array(nz, pa.int64()), "rev_scaled": pa.array(sums[nz], pa.int64())}
        )

    merged = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("rev_scaled", alias_name="rev_scaled"))
        .to_pandas()
    )
    names = dict(zip(np.asarray(nat["n_nationkey"]), nat["n_name"].to_pylist()))
    return pa.table(
        {
            "n_name": pa.array([names[k] for k in merged["n_nationkey"]], pa.string()),
            "revenue": pa.array(merged["rev_scaled"].to_numpy() / 1_000_000.0),
        }
    )


def supplier_nation_counts(sf_dir: str):
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    j = supp.join(nation, join_type="inner", num_partitions=4, on=("s_nationkey",), right_on=("n_nationkey",))
    out = j.groupby("n_name").aggregate(Count(alias_name="n_suppliers"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def customer_segments(sf_dir: str):
    ds = _t(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
    out = (
        ds.map_batches(
            lambda b: pa.table({"c_mktsegment": b["c_mktsegment"], "acct_c": _cents(b["c_acctbal"])}),
            batch_format="pyarrow",
        )
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"), Sum("acct_c", alias_name="acct_c"))
        .map_batches(
            lambda b: pa.table(
                {
                    "c_mktsegment": b["c_mktsegment"],
                    "n": b["n"],
                    # exact integer cents / (100·n): identical f64 on both sides
                    "avg_acctbal": _round_col(
                        pc.divide(
                            pc.cast(b["acct_c"], pa.float64()),
                            pc.multiply(pc.cast(b["n"], pa.float64()), pa.scalar(100.0)),
                        ),
                        4,
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def parts_by_brand(sf_dir: str):
    """Grouped aggregate over the part table (retail-price stats per brand,
    integer-cents exact)."""
    ds = _t(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])
    out = (
        ds.map_batches(
            lambda b: pa.table(
                {"p_brand": b["p_brand"], "p_size": b["p_size"], "price_c": _cents(b["p_retailprice"])}
            ),
            batch_format="pyarrow",
        )
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("price_c", alias_name="price_c"),
            Max("p_size", alias_name="max_size"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "p_brand": b["p_brand"],
                    "n_parts": b["n_parts"],
                    "total_retail": pc.divide(pc.cast(b["price_c"], pa.float64()), pa.scalar(100.0)),
                    "max_size": b["max_size"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def region_nation_counts(sf_dir: str):
    """region ⋈ nation ⋈ supplier chained dimension joins → suppliers per
    region (two small-side joins)."""
    region = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j1 = supp.join(nation, join_type="inner", num_partitions=2, on=("s_nationkey",), right_on=("n_nationkey",))
    j2 = j1.join(region, join_type="inner", num_partitions=2, on=("n_regionkey",), right_on=("r_regionkey",))
    out = j2.groupby("r_name").aggregate(Count(alias_name="n_suppliers"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


# ── events: stream-shaped table (windowed aggregate, union, filters) ────────


def events_props_k_stats(sf_dir: str):
    """JSON scalar extraction (§2.8): pull the integer ``k`` out of the
    ``props`` JSON string column — RE2 ``extract_regex`` on the Arrow side,
    so both engines parse the same pattern — then aggregate per type."""
    ds = _t(sf_dir, "events", ["event_type", "props"])

    def extract_k(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": b["event_type"], "k": k}).filter(pc.is_valid(k))

    out = (
        ds.map_batches(extract_k, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"), Max("k", alias_name="max_k"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_by_type(sf_dir: str):
    out = (
        _t(sf_dir, "events", ["event_type", "value"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"), Max("value", alias_name="max_value"))
    )
    return _round(pa.Table.from_pandas(out.to_pandas(), preserve_index=False), {"total_value": 2, "max_value": 6})


def events_user_type_pivot(sf_dir: str):
    """Per-user event-type pivot (count per type as columns): in-batch
    bincount over the combined (user, type) code → one partial row per
    distinct user per batch → ``groupby(user).sum`` — only pivoted rows
    cross the exchange, never events."""
    types = ["click", "error", "purchase", "signup", "view"]
    tmap = {t: i for i, t in enumerate(types)}

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 **{f"n_{t}": pa.array([], pa.int64()) for t in types}}
            )
        users = np.asarray(b["user_id"], dtype=np.int64)
        tcodes = np.asarray(
            pc.index_in(b["event_type"], value_set=pa.array(types, pa.string())), dtype=np.int64
        )
        uu, uidx = np.unique(users, return_inverse=True)
        counts = np.bincount(uidx * len(types) + tcodes, minlength=len(uu) * len(types))
        counts = counts.reshape(len(uu), len(types))
        return pa.table(
            {"user_id": pa.array(uu, pa.int64()),
             **{f"n_{t}": pa.array(counts[:, tmap[t]], pa.int64()) for t in types}}
        )

    out = (
        _t(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types])
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def emb_label_centroids(sf_dir: str):
    """Per-label embedding centroid (class prototype): per-batch per-(label,
    dim) partial sums — ``labels × dims`` rows per block, vectors never
    shuffle — merged by one small groupby; reported as the rounded centroid
    L2 norm so the oracle is float-roundoff-proof."""
    ds = _t(sf_dir, "embeddings", ["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        arr = b["embedding"].combine_chunks() if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        m = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(arr), -1)
        if not m.size:
            return pa.table(
                {"label": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()),
                 "s": pa.array([], pa.float64()), "n": pa.array([], pa.int64())}
            )
        labels = np.asarray(b["label"], dtype=np.int64)
        lab_names, lid = np.unique(labels, return_inverse=True)
        nl, d = len(lab_names), m.shape[1]
        sums = np.zeros((nl, d))
        np.add.at(sums, lid, m)
        ncnt = np.bincount(lid, minlength=nl)
        return pa.table(
            {
                "label": pa.array(np.repeat(lab_names, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), nl)),
                "s": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(ncnt, d).astype(np.int64)),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for lab, sub in merged.groupby("label", sort=True):
        mean = sub["s"].to_numpy() / sub["n"].to_numpy()
        rows.append((lab, int(sub["n"].iloc[0]), float(np.sqrt((mean * mean).sum()))))
    out = pa.table(
        {
            "label": pa.array([int(r[0]) for r in rows], pa.int64()),
            "n_vecs": pa.array([r[1] for r in rows], pa.int64()),
            "centroid_norm": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    return _round(out, {"centroid_norm": 4})


def customers_order_counts(sf_dir: str):
    """Customers with their order count INCLUDING zero-order customers — a
    partitioned LEFT OUTER join (the engine's first outer-join coverage;
    pre-aggregated counts join, so the right side is one row per customer
    that ordered)."""
    cust = _t(sf_dir, "customer", ["c_custkey"])
    counts = (
        _t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="cnt"))
    )
    j = cust.join(
        counts, join_type="left_outer", num_partitions=8, on=("c_custkey",), right_on=("o_custkey",)
    )
    return j.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["c_custkey"],
                "n_orders": pc.coalesce(pc.cast(b["cnt"], pa.int64()), pa.scalar(0, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )


def events_hourly_window(sf_dir: str):
    """Tumbling 1-hour event-time window per type (engine's window bucketing;
    the reference has no time functions — north-rule addition)."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.floor_temporal(b["ts"], unit="hour"),
                "value": b["value"],
            }
        ),
        batch_format="pyarrow",
    )
    out = ds.groupby(["event_type", "hour"]).aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
    return _round(pa.Table.from_pandas(out.to_pandas(), preserve_index=False), {"total_value": 2})


def events_union_extremes(sf_dir: str):
    ds = _t(sf_dir, "events", ["event_id", "value"])
    hi = ds.map_batches(lambda b: b.filter(pc.greater(b["value"], 99.0)), batch_format="pyarrow")
    lo = ds.map_batches(lambda b: b.filter(pc.less(b["value"], 1.0)), batch_format="pyarrow")
    return pa.Table.from_pandas(hi.union(lo).to_pandas(), preserve_index=False)


def events_user_sessions(sf_dir: str):
    """Per-user session stat: event count + time span per user.  The span is
    just max(ts)−min(ts), so this is a plain Min/Max/Count aggregate — no
    per-group Python, no in-group sort (the groupby(key).map_groups windowed
    shape is exercised where genuinely order-dependent, e.g. dedup pair
    generation)."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    prep = ds.map_batches(
        lambda b: pa.table({"user_id": b["user_id"], "ts_us": pc.cast(b["ts"], pa.int64())}),
        batch_format="pyarrow",
    )
    out = (
        prep.groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Min("ts_us", alias_name="ts_lo"),
            Max("ts_us", alias_name="ts_hi"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "user_id": b["user_id"],
                    "n_events": b["n_events"],
                    "span_us": pc.subtract(b["ts_hi"], b["ts_lo"]),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return out  # lazy: per-user rows grow with data — never driver-materialized


def events_top3_per_type(sf_dir: str):
    """Per-group top-k (T-operator in grouped form): 3 highest-value events
    per type, deterministic tie-break (value desc, event_id asc).  Each batch
    first contracts to its LOCAL top-3 per type (run-length rank over one
    sorted batch), so the groupby merge sees ≤ 3 × n_blocks rows per type —
    never a whole group on one worker, no matter how large a type gets (at
    5 types and 100 TB, an uncontracted group is 20% of the corpus)."""
    import pandas as pd

    ds = _t(sf_dir, "events", ["event_type", "event_id", "value"])

    def partial_top3(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        b = b.take(
            pc.sort_indices(
                b,
                sort_keys=[
                    ("event_type", "ascending"),
                    ("value", "descending"),
                    ("event_id", "ascending"),
                ],
            )
        )
        codes = np.asarray(
            pc.dictionary_encode(
                b["event_type"].combine_chunks()
                if isinstance(b["event_type"], pa.ChunkedArray)
                else b["event_type"]
            ).indices,
            dtype=np.int64,
        )
        new_run = np.concatenate([[True], codes[1:] != codes[:-1]])
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(len(codes)), 0))
        rank_in_run = np.arange(len(codes)) - run_start
        return b.filter(pa.array(rank_in_run < 3))

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["value", "event_id"], ascending=[False, True], kind="stable").head(3)

    out = (
        ds.map_batches(partial_top3, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(top3, batch_format="pandas")
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _round(tbl.select(["event_type", "event_id", "value"]), {"value": 6})


def events_sessionized(sf_dir: str):
    """Gap-based sessionization (split a user's event stream at >30 min
    gaps) — the genuinely ORDER-DEPENDENT per-key window, run through the
    bucketed-run exchange (``stages.windows.grouped_ordered_runs``): users
    hash to bounded buckets, ONE shuffle, in-bucket sort by (user, ts), and
    session boundaries / per-session aggregates come from vectorized run
    arithmetic over the WHOLE bucket — Python fires once per bucket, never
    per user (the round-4 per-key-callback hotspot)."""
    from ..stages.windows import grouped_ordered_runs

    GAP_US = 30 * 60 * 1_000_000

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    prep = ds.map_batches(
        lambda b: pa.table({"user_id": b["user_id"], "ts_us": pc.cast(b["ts"], pa.int64())}),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        ts = np.asarray(g["ts_us"], dtype=np.int64) if n else np.empty(0, np.int64)
        new_sess = np.zeros(n, dtype=bool)
        new_sess[starts] = True
        if n > 1:
            interior = np.ones(n, dtype=bool)
            interior[starts] = False  # rows whose predecessor is the SAME user
            new_sess[1:] |= (ts[1:] - ts[:-1] > GAP_US) & interior[1:]
        ss = np.flatnonzero(new_sess)
        se = np.r_[ss[1:], n] if len(ss) else np.empty(0, np.int64)
        # per-user 1-based session index: sessions counted from the user's
        # run start (cumsum of boundary flags, rebased per run)
        cs = np.cumsum(new_sess)
        run_of = np.searchsorted(starts, ss, side="right") - 1 if len(ss) else ss
        idx = (cs[ss] - cs[starts[run_of]] + 1) if len(ss) else np.empty(0, np.int64)
        return pa.table(
            {
                "user_id": g["user_id"].take(pa.array(ss, pa.int64())),
                "session_idx": pa.array(idx.astype(np.int64)),
                "n_events": pa.array((se - ss).astype(np.int64)),
                "start_us": pa.array(ts[ss] if len(ss) else np.empty(0, np.int64)),
                "end_us": pa.array(ts[se - 1] if len(ss) else np.empty(0, np.int64)),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us",), kernel)


def events_lag_prev(sf_dir: str):
    """Per-key LAG / as-of-previous join: each event gets the id of and the
    time gap to the SAME USER's previous event (total order: ts, event_id).
    Bucketed-run exchange (``stages.windows.grouped_ordered_runs``): one
    shuffle, in-bucket sort by (user, ts, event_id), then ONE global shift
    with -1 sentinels re-stamped at run starts — no per-user Python."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        ids = np.asarray(g["event_id"], dtype=np.int64) if n else np.empty(0, np.int64)
        ts = np.asarray(g["ts_us"], dtype=np.int64) if n else np.empty(0, np.int64)
        prev_id = np.empty(n, np.int64)
        gap = np.empty(n, np.int64)
        if n:
            prev_id[0], gap[0] = -1, -1
            prev_id[1:] = ids[:-1]
            gap[1:] = ts[1:] - ts[:-1]
            prev_id[starts] = -1  # run starts have no same-user predecessor
            gap[starts] = -1
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "prev_event_id": pa.array(prev_id),
                "gap_us": pa.array(gap),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_context_window(sf_dir: str):
    """Per-key ordered CONTEXT-WINDOW assembly: each event gets the
    '>'-joined concatenation of the SAME USER's last 3 event types (2
    preceding + current; total order ts, event_id) — the set-oriented form
    of the "mention + previous K turns" context a transcript-linkage
    pipeline feeds its encoder (the reference assembles per-mention context
    text one example at a time in a Python loop:
    mix_blink/data/dataset.py:85).
    Bucketed-run exchange (``stages.windows.grouped_ordered_runs``): one
    shuffle, in-bucket sort by (user, ts, event_id), then TWO global
    index shifts clamped at run starts — context never crosses a user
    boundary — and ONE vectorized ``binary_join_element_wise`` per shift
    depth; no per-user Python, payload bytes shuffle exactly once."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": g["user_id"],
                    "event_id": g["event_id"],
                    "ctx": pa.array([], pa.string()),
                }
            )
        types = g["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        idx = np.arange(n, dtype=np.int64)
        run_start = np.repeat(starts, ends - starts)
        has1 = idx - 1 >= run_start
        has2 = idx - 2 >= run_start
        # clamp out-of-run lags to self; the if_else below never reads them
        t1 = types.take(pa.array(np.where(has1, idx - 1, idx)))
        t2 = types.take(pa.array(np.where(has2, idx - 2, idx)))
        j2 = pc.binary_join_element_wise(t2, t1, types, ">")
        j1 = pc.binary_join_element_wise(t1, types, ">")
        ctx = pc.if_else(pa.array(has2), j2, pc.if_else(pa.array(has1), j1, types))
        return pa.table(
            {"user_id": g["user_id"], "event_id": g["event_id"], "ctx": ctx}
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_distinct_types_running(sf_dir: str):
    """Per-key RUNNING DISTINCT COUNT: each event gets the number of distinct
    event types the SAME USER has produced so far (inclusive; total order
    ts, event_id) — the streaming cumulative-cardinality feature (session
    diversity so far).  Bucketed-run exchange: first occurrences fall out of
    ONE in-bucket lexsort by (run, type-code, position) + a vectorized
    neighbor compare scattered back to event order, and the running count is
    one global cumsum with per-run bases subtracted — no per-user Python, no
    per-row set state."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": g["user_id"],
                    "event_id": g["event_id"],
                    "distinct_types": pa.array([], pa.int64()),
                }
            )
        types = g["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        codes = np.asarray(pc.dictionary_encode(types).indices, dtype=np.int64)
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)
        pos = np.arange(n, dtype=np.int64)
        order = np.lexsort((pos, codes, rid))
        r_s, c_s = rid[order], codes[order]
        first_sorted = np.r_[True, (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])]
        first = np.empty(n, dtype=bool)
        first[order] = first_sorted
        csum = np.cumsum(first, dtype=np.int64)
        run_base = np.repeat(np.r_[np.int64(0), csum[ends[:-1] - 1]], ends - starts)
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "distinct_types": pa.array(csum - run_base),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_type_transitions(sf_dir: str):
    """Per-user event-type TRANSITION counts — the order-1 Markov table over
    the behavior stream: (prev_type, next_type, n) summed over all SAME-USER
    adjacent pairs under total (ts, event_id) order.  Bucketed-run exchange:
    adjacency is one run-start-masked global shift, and each bucket
    contracts its transitions to (prev, next, n_partial) cells (dictionary
    codes → combined int key → unique+counts), so only k² × buckets tiny
    rows reach the final groupby — transition rows never shuffle
    individually."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        n = g.num_rows
        if n < 2:
            return empty
        types = g["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        enc = pc.dictionary_encode(types)
        codes = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)
        interior = np.ones(n, dtype=bool)
        interior[starts] = False  # rows whose predecessor is the SAME user
        nxt = np.flatnonzero(interior)
        if len(nxt) == 0:
            return empty
        key = codes[nxt - 1] * k + codes[nxt]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "prev_type": enc.dictionary.take(pa.array(uniq // k)),
                "next_type": enc.dictionary.take(pa.array(uniq % k)),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)
    out = cells.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n_partial", alias_name="n")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_user_median_gap(sf_dir: str):
    """Per-user EXACT MEDIAN inter-event gap (µs) — integer rank selection,
    no floats: gaps fall out of one run-start-masked shift, each user's gaps
    are contiguous after the in-bucket sort, and the lower median is the
    ceil(n/2)-th smallest picked by ONE global lexsort (gap within run) +
    per-segment index arithmetic — the same exact-integer-rank idiom the
    quantile suite uses on both engine and SQL sides (value-deterministic
    under gap ties: equal rank candidates share the value).  Users with a
    single event have no gap and are excluded, matching the oracle's
    NULL-lag filter."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "median_gap_us": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
            }
        )
        n = g.num_rows
        if n < 2:
            return empty
        ts = np.asarray(g["ts_us"], dtype=np.int64)
        lens = ends - starts
        n_gaps = lens - 1  # per run
        has = n_gaps > 0
        if not has.any():
            return empty
        interior = np.ones(n, dtype=bool)
        interior[starts] = False
        rows = np.flatnonzero(interior)  # one per gap, grouped by run
        gaps = ts[rows] - ts[rows - 1]
        grid = np.repeat(np.arange(len(starts), dtype=np.int64), np.maximum(n_gaps, 0))
        order = np.lexsort((gaps, grid))  # sort gaps within each run
        sorted_gaps = gaps[order]
        gseg_starts = np.r_[np.int64(0), np.cumsum(n_gaps[has])[:-1]]
        pick = gseg_starts + (n_gaps[has] + 1) // 2 - 1
        return pa.table(
            {
                "user_id": g["user_id"].take(pa.array(starts[has])),
                "median_gap_us": pa.array(sorted_gaps[pick]),
                "n_gaps": pa.array(n_gaps[has].astype(np.int64)),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_user_active_coverage(sf_dir: str):
    """Per-user interval-UNION coverage: each event opens a [ts, ts+5min)
    activity window and the metric is the union length in µs — the
    exposure-dedup integral (ad viewability, device uptime, agent busy-time)
    that a plain n·W overcounts wherever windows overlap.  With a CONSTANT
    window the union telescopes to W + Σ min(W, gap_i) over consecutive
    sorted starts — exact int64, no sweep-line state — so the whole operator
    is ONE bucketed-run exchange (`grouped_ordered_runs`): gaps from a
    run-start-masked shift, per-user sums one ``add.reduceat``, island count
    (maximal merged intervals) = 1 + #(gap ≥ W) from the same mask.  No
    per-user Python anywhere; ties broken by event_id on both sides so the
    order is total.  Oracle: LAG window replay with the same least()/
    boundary convention (gap = W exactly is a NEW island: [a, a+W) ∪
    [a+W, a+2W) is contiguous in measure but the windows are disjoint —
    both sides count it as a break, documented so the convention is
    explicit)."""
    from ..stages.windows import grouped_ordered_runs

    W = 300_000_000  # 5 minutes in µs
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "covered_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_islands": pa.array([], pa.int64()),
            }
        )
        n = g.num_rows
        if n == 0:
            return empty
        ts = np.asarray(g["ts_us"], dtype=np.int64)
        if int((ends - starts).max(initial=0)) >= 2**63 // W:
            raise ValueError("events_user_active_coverage: n_events x W overflows int64")
        interior = np.ones(n, dtype=bool)
        interior[starts] = False
        rows = np.flatnonzero(interior)
        gaps = np.zeros(n, dtype=np.int64)
        gaps[rows] = ts[rows] - ts[rows - 1]
        contrib = np.minimum(gaps, W)
        contrib[starts] = W
        covered = np.add.reduceat(contrib, starts)
        breaks = (gaps >= W) & interior
        islands = 1 + np.add.reduceat(breaks.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(np.asarray(g["user_id"], dtype=np.int64)[starts]),
                "covered_us": pa.array(covered, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "n_islands": pa.array(islands, pa.int64()),
            }
        )

    out = grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_user_twap(sf_dir: str):
    """Per-user TIME-WEIGHTED AVERAGE value (µs-exact LOCF integration) —
    the metering/engagement primitive a plain AVG gets wrong when samples
    are irregular: each event's value holds until the user's next event, so
    TWA = Σ cents_i·(ts_{i+1}−ts_i) / (ts_last−ts_first), all in exact
    int64 (truncating division on BOTH sides — DuckDB's `//` truncates
    toward zero, so the operator RAISES on negative values rather than
    silently diverging from numpy's floor).  The per-term product is
    bounded by max_cents × user_span; the kernel checks that bound against
    2⁶³ and RAISES before any int64 wrap — matching the oracle's loud
    HUGEINT-vs-BIGINT divergence rather than wrapping.  Single-event and
    zero-span users have no integration window and are excluded, matching
    the oracle's HAVING.  Runs in ONE bucketed-run exchange
    (`grouped_ordered_runs`): gaps from a run-start-masked shift, per-user
    numerators one masked ``add.reduceat`` — no per-user Python."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "cents": _cents(b["value"]),
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "twap_cents": pa.array([], pa.int64()),
                "dur_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            }
        )
        n = g.num_rows
        if n < 2:
            return empty
        ts = np.asarray(g["ts_us"], dtype=np.int64)
        cents = np.asarray(g["cents"], dtype=np.int64)
        if int(cents.min(initial=0)) < 0:
            raise ValueError(
                "events_user_twap: negative values unsupported (DuckDB `//` "
                "truncates toward zero, numpy floors — results would diverge)"
            )
        lens = ends - starts
        span = ts[ends - 1] - ts[starts]
        if int(cents.max(initial=0)) * int(span.max(initial=0)) >= 2**63:
            raise ValueError(
                "events_user_twap: cents x span exceeds int64 — the oracle's "
                "BIGINT sum would overflow loudly; refusing to wrap"
            )
        interior = np.ones(n, dtype=bool)
        interior[starts] = False
        rows = np.flatnonzero(interior)  # one per gap, grouped by run
        prod = cents[rows - 1] * (ts[rows] - ts[rows - 1])
        gap_counts = lens - 1
        gstart = np.r_[np.int64(0), np.cumsum(gap_counts)[:-1]]
        nz = gap_counts > 0
        nums = np.zeros(len(starts), dtype=np.int64)
        if nz.any():
            nums[nz] = np.add.reduceat(prod, gstart[nz])
        keep = nz & (span > 0)
        if not keep.any():
            return empty
        return pa.table(
            {
                "user_id": g["user_id"].take(pa.array(starts[keep])),
                "twap_cents": pa.array(nums[keep] // span[keep]),
                "dur_us": pa.array(span[keep]),
                "n_events": pa.array(lens[keep].astype(np.int64)),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_user_longest_streak(sf_dir: str):
    """Per-user LONGEST STREAK of consecutive same-type events under total
    (ts, event_id) order — the gaps-and-islands pattern without its
    double-ROW_NUMBER shuffle: inside the bucketed-run exchange, island
    boundaries are ONE vectorized compare (run start OR type change),
    island lengths one diff, and the per-user max one ``maximum.reduceat``
    over islands grouped by run — no per-user Python, no window shuffle."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": g["user_id"],
                    "max_streak": pa.array([], pa.int64()),
                }
            )
        types = g["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)
        t_neq = np.asarray(pc.not_equal(types.slice(1), types.slice(0, n - 1)), dtype=bool)
        isl_starts = np.flatnonzero(np.r_[True, (rid[1:] != rid[:-1]) | t_neq]).astype(np.int64)
        isl_len = np.diff(np.r_[isl_starts, n]).astype(np.int64)
        isl_rid = rid[isl_starts]
        run_starts_isl = np.flatnonzero(np.r_[True, isl_rid[1:] != isl_rid[:-1]]).astype(np.int64)
        return pa.table(
            {
                "user_id": g["user_id"].take(pa.array(starts)),
                "max_streak": pa.array(np.maximum.reduceat(isl_len, run_starts_isl)),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_value_histogram(sf_dir: str):
    """Fixed-bucket histogram (floor(value)) with MAP-SIDE COMBINE: each
    batch emits one partial-count row per bucket it saw (np.bincount), and
    only the tiny (bucket, partial_n) rows shuffle into the final groupby —
    the canonical pre-aggregation shape (never one row per event through
    the exchange)."""
    ds = _t(sf_dir, "events", ["value"])

    def partial_hist(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"], dtype=np.float64)
        bucket = np.floor(v).astype(np.int64)
        if len(bucket) and bucket.max() - bucket.min() < 1 << 24:
            lo = bucket.min()
            counts = np.bincount(bucket - lo)
            nz = np.flatnonzero(counts)
            uniq, cnt = nz + lo, counts[nz].astype(np.int64)
        else:  # outlier-wide domain: O(n log n) unique, never O(range) memory
            uniq, cnt = np.unique(bucket, return_counts=True)
            cnt = cnt.astype(np.int64)
        return pa.table({"bucket": pa.array(uniq), "n_partial": pa.array(cnt)})

    out = (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_partial", alias_name="n"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_ANTI_BROADCAST_LIMIT = 30_000_000


def customers_without_orders(sf_dir: str):
    """Anti-join: customers with no HIGH-VALUE order (>300k — every customer
    has at least one order in this data, so the filter keeps the result
    non-trivial).  Small distinct-key side → broadcast set + inverted
    ``pc.is_in`` (no shuffle); above ``_ANTI_BROADCAST_LIMIT`` keys →
    partitioned left-outer join + null filter (the same duality every keyed
    attach in this engine uses)."""
    import ray

    from ..stages.clustering import clamped_partitions

    cust = _t(sf_dir, "customer", ["c_custkey"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    # filter at the read side, then contract to distinct keys per batch
    # before any driver pull
    okeys = orders.map_batches(
        lambda b: pa.table(
            {"o_custkey": pc.unique(b.filter(pc.greater(b["o_totalprice"], 300000.0))["o_custkey"])}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_keys = okeys.count()
    if n_keys <= _ANTI_BROADCAST_LIMIT:
        keys = pa.array(sorted(set(okeys.to_pandas()["o_custkey"])), pa.int64())
        keys_ref = ray.put(keys)

        def anti(b: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
            return b.filter(pc.invert(pc.is_in(b["c_custkey"], value_set=ks)))

        out = cust.map_batches(anti, batch_format="pyarrow")
    else:
        marks = okeys.map_batches(
            lambda b: pa.table(
                {"o_custkey": b["o_custkey"], "has_order": pa.array([True] * b.num_rows)}
            ),
            batch_format="pyarrow",
        ).groupby("o_custkey").aggregate(Count(alias_name="n_marks"))
        np_ = clamped_partitions(n_keys, 16)
        out = cust.join(
            marks, join_type="left_outer", num_partitions=np_, on=("c_custkey",), right_on=("o_custkey",)
        ).map_batches(
            lambda b: b.filter(pc.is_null(b["n_marks"])).select(["c_custkey"]),
            batch_format="pyarrow",
        )
    df = out.to_pandas()
    if df.empty:  # schema-preserving empty (empty Datasets lose column info)
        return pa.table({"c_custkey": pa.array([], pa.int64())})
    return pa.Table.from_pandas(df, preserve_index=False)


# ── documents: text operators ───────────────────────────────────────────────


def docs_normalize(sf_dir: str):
    from ..functions.text import normalize

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "norm_text": pc.cast(normalize(b["text"]), pa.string())}),
        batch_format="pyarrow",
    )


def docs_token_stats(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: token_stats(b).drop_columns(["n_bpe_tokens"]), batch_format="pyarrow"
    )


def docs_repetition(sf_dir: str):
    """Gopher-style repetition signals (exact, per doc): duplicate-token
    fraction, most-frequent-token fraction, most-frequent-bigram fraction.
    Pure per-row ``map_batches`` — no shuffle at any scale."""
    from ..stages.text_analysis import repetition_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(repetition_stats, batch_format="pyarrow")


def docs_pack_bins(sf_dir: str):
    """Per-source next-fit sequence packing into 256-token bins
    (``stages.text_analysis.pack_next_fit``): the batch-packing step before
    tokenized training shards.  Bins never cross sources, so sources pack in
    parallel (``groupby(source).map_groups``); within a source the order is
    doc_id."""
    from ..stages.text_analysis import pack_next_fit

    ds = _t(sf_dir, "documents", ["doc_id", "source", "text"])

    def lens(b: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(b["text"])
        keep = pc.not_equal(trimmed, "")
        b = b.filter(keep)
        n = pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b["text"])))
        return pa.table(
            {"source": b["source"], "doc_id": b["doc_id"], "n": pc.cast(n, pa.int64())}
        )

    def pack(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        bins = pack_next_fit(np.asarray(g["n"], dtype=np.int64), 256)
        return pa.table(
            {
                "source": g["source"],
                "doc_id": g["doc_id"],
                "bin_idx": pa.array(bins, pa.int64()),
            }
        )

    return (
        ds.map_batches(lens, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pack, batch_format="pyarrow")
    )


def events_running_revenue(sf_dir: str):
    """Global running revenue over the full event stream (ordered by
    ts, event_id) — the distributed two-phase prefix scan
    (``stages.scan.prefix_scan``): one range sort, then per-block scalar
    totals → driver prefix → per-block offset add.  Integer-cents sums keep
    the result exact and association-free at any block layout."""
    from ..stages.scan import prefix_scan

    ev = _t(sf_dir, "events", ["event_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
        return pa.table({"event_id": b["event_id"], "ts": b["ts"], "cents": cents})

    out = prefix_scan(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        ["ts", "event_id"],
        "cents",
        out_col="run_cents",
        row_col="row_num",
    )
    return out.map_batches(
        lambda b: pa.table(
            {"event_id": b["event_id"], "run_cents": b["run_cents"], "row_num": b["row_num"]}
        ),
        batch_format="pyarrow",
    )


def emb_quantized_stats(sf_dir: str):
    """Scalar uint8 quantization of the embedding table
    (``stages.quantize``): global per-dim min/max via dim-row partials, a
    broadcast scale vector, vectorized half-up encode.  Output is per-vector
    code checksums (sum/min/max) — the full arithmetic replayed by the SQL
    oracle."""
    from ..stages.quantize import quantize_embeddings

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def stats(b: pa.Table) -> pa.Table:
        arr = b["codes"].combine_chunks() if isinstance(b["codes"], pa.ChunkedArray) else b["codes"]
        m = np.asarray(arr.flatten(), dtype=np.int64).reshape(len(arr), -1)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "code_sum": pa.array(m.sum(axis=1), pa.int64()),
                "code_min": pa.array(m.min(axis=1), pa.int64()),
                "code_max": pa.array(m.max(axis=1), pa.int64()),
            }
        )

    return quantize_embeddings(ds, "embedding").map_batches(stats, batch_format="pyarrow")


def docs_sample_weighted(sf_dir: str):
    """Quality-weighted acceptance sampling: keep a doc iff
    ``lehmer_hash(doc_id) < w · (2³¹−1)`` where ``w`` is the doc's quality
    score quantized to 1e-4 (half-up, so the SQL oracle replays the exact
    comparison).  Deterministic, retry-reproducible, shuffle-free — the
    importance-subsampling step of a curation pipeline, map-side only."""
    from ..stages.sampling import lehmer_hash
    from ..stages.text_analysis import quality_scores

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def keep(b: pa.Table) -> pa.Table:
        score = np.asarray(quality_scores(b)["quality_score"], dtype=np.float64)
        w = np.floor(score * 10000.0 + 0.5) / 10000.0
        h = lehmer_hash(np.asarray(b["doc_id"], dtype=np.int64), steps=3)
        return pa.table({"doc_id": b["doc_id"]}).filter(pa.array(h < w * 2147483647.0))

    return ds.map_batches(keep, batch_format="pyarrow")


def docs_heavy_tokens(sf_dir: str):
    """EXACT frequent tokens (≥ 3.3% of all tokens) at bounded memory:
    Misra-Gries candidate pass (summary ≤ k+1 rows per block through the
    shuffle, measured decrement bound) + broadcast exact-verify pass —
    distinct-value-count-free, the 100-TB shape for `GROUP BY HAVING` over
    an unbounded vocabulary."""
    from ..stages.sketches import heavy_hitters

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(b["text"])
        keep = pc.not_equal(trimmed, "")
        tokens = pc.utf8_split_whitespace(trimmed.filter(keep))
        tokens = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        return pa.table({"token": tokens.flatten()})

    return heavy_hitters(ds.map_batches(explode, batch_format="pyarrow"), "token", 0.033)


def docs_tokens(sf_dir: str):
    """Flat-map explode: one row per whitespace token (M1 flat-map analog)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.less(b["doc_id"], 20))
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(keep["text"]))
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks)
        ids = pc.list_parent_indices(toks)
        return pa.table(
            {
                "doc_id": pc.take(keep["doc_id"], ids),
                "token": pc.cast(toks.flatten(), pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def docs_bpe_token_counts(sf_dir: str):
    """BPE-ish pre-tokenizer counts (the token-counting path of the
    training-data suite; both sides are RE2 so the regex semantics agree)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: token_stats(b).select(["doc_id", "n_bpe_tokens"]), batch_format="pyarrow"
    )


def docs_exact_dedup(sf_dir: str):
    """Exact dedup keyed by full text (group → min id + copy count)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    # Returned as a (lazy) Dataset — one row per distinct text is still
    # corpus-sized, so it must never be driver-materialized here.
    return ds.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))


def docs_exact_dedup_hash(sf_dir: str):
    """Exact dedup via the ``stages.dedup.exact_dedup`` operator (128-bit
    full-length content hash groupby — the scale path: the shuffle ships
    16-byte keys, never the text).  Oracle groups by full text; equal output
    proves the hash key is collision-free on this corpus."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds).drop_columns(["content_hash", "content_hash2"])


def docs_distinct_sources(sf_dir: str):
    ds = _t(sf_dir, "documents", ["source"])
    vals = sorted(ds.unique("source"))
    return pa.table({"source": pa.array(vals, pa.string())})


def docs_top_sources(sf_dir: str):
    out = (
        _t(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .sort(["n_docs", "source"], descending=[True, False])
        .limit(5)
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def docs_filter_long(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.map_batches(lambda b: b.filter(pc.greater(b["n_chars"], 300)), batch_format="pyarrow")


def docs_fingerprint(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(fingerprint_md5, batch_format="pyarrow")


def docs_lang_id(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2), batch_size=1024)


def docs_quality(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_scores, batch_format="pyarrow")
    return out.map_batches(
        lambda b: _round(b, {"punct_ratio": 6, "stopword_ratio": 6, "mean_word_len": 6, "quality_score": 6}),
        batch_format="pyarrow",
    )


def docs_quality_filter(sf_dir: str):
    """The C4-style corpus filter: keep docs passing quality + language
    gates — the composition a training-data pipeline actually runs
    (score → threshold → select), pruned at the read."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def gate(b: pa.Table) -> pa.Table:
        q = quality_scores(b)
        lang = LangId()(b)
        keep = pc.and_(
            pc.greater_equal(q["quality_score"], pa.scalar(0.5)),
            pc.equal(lang["lang_pred"], "en"),
        )
        return pa.table({"doc_id": b["doc_id"]}).filter(keep)

    return ds.map_batches(gate, batch_format="pyarrow")


def docs_truncate_tokens(sf_dir: str, max_tokens: int = 20):
    """Token-budget truncation (the context-window prep op): keep the first
    ``max_tokens`` whitespace tokens, single-space re-joined — vectorized
    list-slice over the split column."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def trunc(b: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b["text"]))
        head = pc.list_slice(toks, 0, max_tokens)
        out = pc.binary_join(head, " ")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text_trunc": pc.cast(out, pa.string()),
                "n_tokens_kept": pc.cast(pc.list_value_length(head), pa.int64()),
            }
        )

    return ds.map_batches(trunc, batch_format="pyarrow")


def docs_minhash_near_dup(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_near_dup_pairs(ds, DedupConfig(jaccard_threshold=0.5))
    return _round(pa.Table.from_pandas(out.to_pandas(), preserve_index=False), {"est_jaccard": 6})


def docs_minhash_calibration(sf_dir: str):
    """MinHash-estimate vs exact-Jaccard calibration for EVERY LSH candidate
    pair — the dedup-threshold tuning read: sig_agree (matching permutations
    of 128) and est_permille next to the exact DISTINCT word-3-shingle
    inter/uni and exact_permille, over the SAME shingle hash space the
    signatures minimize, so the table shows precisely how tight the 128-perm
    estimator brackets the truth before anyone picks a near-dup threshold at
    100 TB.  Engine: the registered MinHash pipeline runs unchanged at
    threshold 0 (every band-collision candidate survives; sig_agree
    recovered exactly from the dyadic k/128 estimate), then ONE pair-join
    verify pass (``word_shingle_jaccard_counts``) appends the exact integer
    stats — texts ship to the pair set, never the driver.  All outputs are
    integers; permilles are floor divisions, identical in SQL."""
    from ..stages.dedup import word_shingle_jaccard_counts

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_near_dup_pairs(ds, DedupConfig(jaccard_threshold=0.0))

    def with_k(b: pa.Table) -> pa.Table:
        k = np.rint(np.asarray(b["est_jaccard"], dtype=np.float64) * 128).astype(np.int64)
        return pa.table({"a_id": b["a_id"], "b_id": b["b_id"], "sig_agree": pa.array(k)})

    pairs = cands.map_batches(with_k, batch_format="pyarrow")
    counted = word_shingle_jaccard_counts(pairs, ds, shingle_words=3)

    def finish(b: pa.Table) -> pa.Table:
        k = np.asarray(b["sig_agree"], dtype=np.int64)
        inter = np.asarray(b["inter"], dtype=np.int64)
        uni = np.asarray(b["uni"], dtype=np.int64)
        return pa.table(
            {
                "a_id": b["a_id"],
                "b_id": b["b_id"],
                "sig_agree": b["sig_agree"],
                "est_permille": pa.array(1000 * k // 128),
                "inter": b["inter"],
                "uni": b["uni"],
                "exact_permille": pa.array(1000 * inter // np.maximum(uni, 1)),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow")


def docs_dedup_corpus(sf_dir: str):
    """Full corpus dedup (exact + verified near-dup + transitive keep/drop
    with reasons) — returns the drop list; kept+dropped partitions the
    corpus exactly (asserted in tests)."""
    from ..stages.dedup import dedup_corpus

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    _, dropped, _ = dedup_corpus(ds, DedupConfig(jaccard_threshold=0.5), verify_threshold=0.5)
    return pa.Table.from_pandas(dropped.to_pandas(), preserve_index=False)


def docs_simhash(sf_dir: str):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return simhash_fingerprints(ds).select_columns(["doc_id", "simhash_hex"])


def _window_pair_table(docs, window: int):
    """Deterministic sliding-window candidate pairs (a, a+1..a+window) — a
    seedless, SQL-expressible candidate generator used to oracle the verify
    and clustering stages (the production LSH candidate generator is seeded →
    rows-only).  O(n·window) pairs, no shuffle; nonexistent b ids drop in the
    verify's inner text join exactly as in the SQL twin."""

    def pairs(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        a = np.repeat(ids, window)
        off = np.tile(np.arange(1, window + 1, dtype=np.int64), len(ids))
        return pa.table({"a_id": pa.array(a), "b_id": pa.array(a + off)})

    return docs.map_batches(pairs, batch_format="pyarrow")


def docs_window_jaccard(sf_dir: str):
    """EXACT char-3-gram Jaccard over deterministic window pairs — the
    SQL-oracled twin of ``ngram_jaccard_verify`` (pins the vectorized
    sort-merge gram intersection + threshold filter against DuckDB's
    list algebra)."""
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_jaccard_verify(_window_pair_table(ds, 5), ds, threshold=0.2)
    return _round(pa.Table.from_pandas(out.to_pandas(), preserve_index=False), {"jaccard": 6})


def _verified_cluster_labels(ds, verified):
    """Min-label connected components over a verified pair set, as an
    int64 (doc_id, cluster_id) Dataset.  Ids are zero-padded to 20 chars so
    lexicographic min == numeric min (the dedup_corpus pattern); shared by
    the clusters query, the leakage-safe split, and their tests."""
    from ..stages.clustering import cluster_nodes

    edges = verified.map_batches(
        lambda b: pa.table(
            {
                "src": pc.utf8_lpad(pc.cast(b["a_id"], pa.string()), 20, "0"),
                "dst": pc.utf8_lpad(pc.cast(b["b_id"], pa.string()), 20, "0"),
            }
        ),
        batch_format="pyarrow",
    )
    nodes = ds.map_batches(
        lambda b: pa.table({"node": pc.utf8_lpad(pc.cast(b["doc_id"], pa.string()), 20, "0")}),
        batch_format="pyarrow",
    )
    labels = cluster_nodes(edges, nodes, mode="auto")
    return labels.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b["node"], pa.int64()),
                "cluster_id": pc.cast(b["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def docs_window_jaccard_clusters(sf_dir: str):
    """Transitive closure (connected components, min-id label) over the
    window-verified pair set — the SQL-oracled twin of the dedup clustering
    stage (DuckDB recursive-CTE reachability on the oracle side)."""
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    verified = ngram_jaccard_verify(_window_pair_table(ds, 5), ds, threshold=0.5)
    return _verified_cluster_labels(ds, verified)


def docs_er_clusters_capped(sf_dir: str):
    """Giant-component cap splitting for the ER clustering — the production
    guard against mega-clusters (one hub block or boilerplate family can
    transitively glue millions of records; downstream survivorship and
    pairwise review are quadratic in cluster size, so real linkage systems
    CAP components): clusters larger than K = 3 are split into deterministic
    chunks of K by doc_id order, each sub-cluster labeled by its smallest
    member (so capped ids remain min-member labels, same convention as the
    closure itself).  Distributed shape: the closure labels feed ONE
    bucketed-run exchange keyed by cluster_id (`grouped_ordered_runs`,
    in-bucket sort by doc_id); within a bucket the chunk index is
    (rank-in-run) // K and the sub-label is a pure gather at
    run_start + chunk·K — vectorized across ALL runs, no per-cluster
    Python.  Output keeps the original cluster_id alongside so the
    split lineage is auditable.  Oracle: closure CTE + row_number − 1
    // K + min() OVER (cluster, chunk).
    Reference parity: the reference caps candidate lists per mention
    (mix_blink/retrieval.py top-k); capping the transitive closure is the
    cluster-side analogue."""
    from ..stages.dedup import ngram_jaccard_verify
    from ..stages.windows import grouped_ordered_runs

    K = 3
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    verified = ngram_jaccard_verify(_window_pair_table(ds, 5), ds, threshold=0.5)
    labels = _verified_cluster_labels(ds, verified)

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "capped_id": pa.array([], pa.int64()),
            }
        )
        n = g.num_rows
        if n == 0:
            return empty
        doc = np.asarray(g["doc_id"], dtype=np.int64)
        lens = ends - starts
        run_start = np.repeat(starts, lens)
        rank = np.arange(n, dtype=np.int64) - run_start
        head_pos = run_start + (rank // K) * K
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "cluster_id": pa.array(np.asarray(g["cluster_id"], dtype=np.int64)),
                "capped_id": pa.array(doc[head_pos], pa.int64()),
            }
        )

    out = grouped_ordered_runs(labels, "cluster_id", ("doc_id",), kernel)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def docs_stratified_folds(sf_dir: str):
    """Stratified k-fold assignment (k = 5): within every source stratum the
    folds are balanced BY CONSTRUCTION (sizes differ by ≤ 1) — the
    cross-validation / eval-holdout primitive where a plain hash-mod split
    leaves small strata lopsided (a 7-doc source can land 5 docs in one fold
    by chance; stratified ranks cannot).  Assignment is a pure function of
    the data: rank within source under the total order (splitmix64(doc_id)
    signed view, tie → doc_id — the epoch-shuffle convention), fold =
    rank mod k.  Distributed shape: ONE bucketed-run exchange keyed by
    source (`grouped_ordered_runs`, in-bucket sort by (sk, doc_id)); the
    rank is arange minus run starts, vectorized across all runs.  Contrast
    with `docs_split_leakage_safe` (CLUSTER-level assignment so near-dups
    never straddle splits): folds here are row-level and balanced — compose
    them (folds over cluster representatives) when both properties are
    needed.  Oracle: the HUGEINT splitmix64 chain + two's-complement fold +
    row_number() OVER (PARTITION BY source ORDER BY sk, doc_id)."""
    from ..stages.sketches import splitmix64
    from ..stages.windows import grouped_ordered_runs

    N_FOLDS = 5
    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def prep(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64).view(np.uint64)
        sk = splitmix64(ids).view(np.int64)
        return pa.table({"doc_id": b["doc_id"], "source": b["source"], "sk": pa.array(sk)})

    rows = ds.map_batches(prep, batch_format="pyarrow")

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "fold": pa.array([], pa.int64()),
            }
        )
        n = g.num_rows
        if n == 0:
            return empty
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "source": g["source"],
                "fold": pa.array(rank % N_FOLDS, pa.int64()),
            }
        )

    out = grouped_ordered_runs(rows, "source", ("sk", "doc_id"), kernel)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def docs_dedup_corpus_exact(sf_dir: str):
    """Corpus dedup with the near-dup stage disabled (verify threshold > 1):
    drops are exactly the non-representative members of byte-identical text
    groups — the SQL-oracled twin of the exact stage + drop assembly.  The
    testdata documents are all-distinct, so deterministic duplicate rows
    (ids +10⁶ / +2·10⁶) are unioned in to exercise multi-member groups."""
    from ..stages.dedup import dedup_corpus

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def dup_rows(b: pa.Table, offset: int, limit: int) -> pa.Table:
        keep = b.filter(pc.less(b["doc_id"], pa.scalar(limit)))
        return pa.table(
            {
                "doc_id": pc.add(keep["doc_id"], pa.scalar(offset, pa.int64())),
                "text": keep["text"],
            }
        )

    corpus = ds.union(
        ds.map_batches(lambda b: dup_rows(b, 1_000_000, 50), batch_format="pyarrow")
    ).union(ds.map_batches(lambda b: dup_rows(b, 2_000_000, 20), batch_format="pyarrow"))
    _, dropped, _ = dedup_corpus(corpus, DedupConfig(jaccard_threshold=0.5), verify_threshold=1.01)
    return pa.Table.from_pandas(dropped.to_pandas(), preserve_index=False)


# ── JSONL nested-document ingest (reference on-disk dataset shape) ──────────

_JSONL_FIXTURE_PATH = "/tmp/mbr_jsonl/dataset_toy.jsonl"


def jsonl_mentions(sf_dir: str):
    """Reference-format JSONL ingest (S2/M1-M5 shape: read_json → flatten
    docs→examples→entities → resolve labels against a NIL-rowed dictionary).
    The nested input is a deterministic fixture (sf-independent); list
    columns are serialized to ','-joined keys for the oracle compare."""
    from ..sources.jsonl import NIL, TOY_LABELS, mixblink_mentions, write_toy_fixture

    path = write_toy_fixture(_JSONL_FIXTURE_PATH)
    out = mixblink_mentions(path, TOY_LABELS + [NIL], remove_nil=False)

    def scalarize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "example_id": b["example_id"],
                "start": pc.cast(b["start"], pa.int64()),
                "end": pc.cast(b["end"], pa.int64()),
                "surface": b["surface"],
                "labels_key": pc.binary_join(b["labels"], ","),
                "hard_neg_key": pc.binary_join(b["hard_negatives"], ","),
            }
        )

    return out.map_batches(scalarize, batch_format="pyarrow")


# ── embeddings: similarity search ───────────────────────────────────────────


def emb_knn_top5(sf_dir: str):
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_bruteforce(ds, query_ids=[0, 1, 2, 3, 4], cfg=AnnConfig(k=5))


def emb_mutual_knn(sf_dir: str):
    """Mutual 3-NN graph over the embedding corpus (``stages.ann.mutual_knn``):
    undirected edges where BOTH endpoints rank each other in their exact
    cosine top-3 (self excluded, ties → smaller id) — the symmetrized
    neighborhood graph that density clustering / hub-noise pruning build on.
    Corpus broadcast once sorted by id; directed edges leave each batch as
    byte-packed (lo, hi, side-rank) cells; ONE pair_stat(sum) exchange merges
    directions.  Output: (a_id, b_id, rank_ab, rank_ba), a_id < b_id."""
    from ..stages.ann import mutual_knn

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pa.Table.from_pandas(mutual_knn(ds, k=3).to_pandas(), preserve_index=False)


def emb_knn_lsh_top5(sf_dir: str):
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_lsh(ds, query_ids=[0, 1, 2, 3, 4], cfg=AnnConfig(k=5))


def emb_knn_lsh_recall(sf_dir: str):
    """ANN index-quality audit: recall@5 of the LSH-bucketed k-NN against
    the exact brute-force top-5, per query — THE production health metric
    for an approximate index (an ANN setting is only as good as the recall
    it buys per candidate probed; this query is how that gets measured
    before anyone trusts the index at 100 TB).  Both rankings are the
    registered queries run unchanged, so the audit can never drift from
    what it audits; the intersection touches ≤ queries × k driver rows by
    construction.  recall_permille = 1000·hits // 5 in floor division.
    The oracle COMPOSES both registered oracle strings verbatim (the RRF
    convention) with a LEFT JOIN + count of matched (query_id, vec_id)."""
    bf = emb_knn_top5(sf_dir)
    lsh = emb_knn_lsh_top5(sf_dir)
    bfp = bf.to_pandas()[["query_id", "vec_id"]]
    lsp = lsh.to_pandas()[["query_id", "vec_id"]]
    lsh_set = set(map(tuple, np.asarray(lsp, dtype=np.int64)))
    out_q, out_h = [], []
    for qid, grp in bfp.groupby("query_id"):
        hits = sum((int(qid), int(v)) in lsh_set for v in grp["vec_id"])
        out_q.append(int(qid))
        out_h.append(hits)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "n_hits": pa.array(out_h, pa.int64()),
            "recall_permille": pa.array([1000 * h // 5 for h in out_h], pa.int64()),
        }
    )


def emb_knn_ivf_top5(sf_dir: str):
    """IVF (distributed k-means coarse quantizer + probed exact search) run
    in EXACT mode (n_probes == n_clusters probes every cluster) so the full
    IVF machinery — k-means rounds, probe masking, truncated per-batch
    emit — is SQL-oracled against the brute-force top-k; the genuinely
    approximate path (n_probes < n_clusters) is recall-tested on clustered
    corpora in pytest where partitioning is actually selective."""
    from ..stages.ann import knn_ivf

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_ivf(ds, query_ids=[0, 1, 2, 3, 4], cfg=AnnConfig(k=5, n_clusters=16, n_probes=16))


def emb_knn_quantized_top5(sf_dir: str):
    """Retrieval over the uint8-quantized corpus (``stages.quantize``): codes
    are encoded then dequantized in one map pass (exactly the values a
    quantized index would serve) and ranked by the brute-force top-k — the
    4×-smaller-broadcast retrieval path, with the whole
    quantize→dequantize→rank arithmetic replayed by the SQL oracle."""
    import ray as _ray

    from ..stages.ann import knn_bruteforce
    from ..stages.quantize import dim_min_max

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    mn, mx = dim_min_max(ds, "embedding")
    span = mx - mn
    scale = np.divide(255.0, span, out=np.zeros_like(span), where=span > 0)
    step = span / 255.0
    ref = _ray.put((mn, scale, step))

    def roundtrip(b: pa.Table) -> pa.Table:
        arr = b["embedding"].combine_chunks() if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        m = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(arr), -1)
        mn_, sc_, st_ = _ray.get(ref)
        codes = np.floor((m - mn_) * sc_ + 0.5)
        deq = mn_ + codes * st_
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(deq.reshape(-1), pa.float64()), m.shape[1]
                ),
            }
        )

    ds2 = ds.map_batches(roundtrip, batch_format="pyarrow")
    return knn_bruteforce(ds2, query_ids=[0, 1, 2, 3, 4], cfg=AnnConfig(k=5))


def docs_subset_join(sf_dir: str):
    """EXACT set-containment join (``stages.simjoin.containment_join`` at
    t = 1): every directed pair (a, b) whose token SET is fully contained
    in b's — the quote/boilerplate-subsumption query (a Jaccard join can
    never answer it: a short doc inside a long one has low Jaccard but
    containment 1).  At t = 1 the containment prefix collapses to each
    doc's single RAREST token (p = L − ⌈L⌉ + 1 = 1) while the right side
    emits all tokens — the minimal zero-miss emission.  Restricted to
    doc_id < 300 so the brute-force all-pairs oracle stays tractable (the
    engine needs no restriction; zero-miss parity tests run unrestricted
    random corpora at fractional thresholds)."""
    from ..stages.simjoin import containment_join

    ds = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], pa.scalar(300, pa.int64()))),
        batch_format="pyarrow",
    )
    out = containment_join(ds, threshold=1.0)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def docs_near_dup_verified(sf_dir: str):
    """MinHash+LSH candidates → EXACT char-3-gram Jaccard verify (texts
    hash-joined onto the pair set) — the full two-stage near-dup pipeline."""
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cand = minhash_near_dup_pairs(ds, DedupConfig(jaccard_threshold=0.3)).select_columns(["a_id", "b_id"])
    out = ngram_jaccard_verify(cand, ds, threshold=0.4)
    return _round(pa.Table.from_pandas(out.to_pandas(), preserve_index=False), {"jaccard": 6})


def docs_weighted_sample(sf_dir: str):
    """Deterministic weight-proportional sample (k = 20): priority =
    splitmix64(doc_id) // weight, keep the k SMALLEST — the
    Efraimidis–Spirakis idea (uniform key raised to 1/w) in pure integers:
    doubling a document's weight halves its priority, so heavier documents
    win bottom-k proportionally more often, yet the sample is a PURE
    FUNCTION of (ids, weights): reruns, retries, and re-partitions return
    byte-identical samples, and a grown corpus only ever swaps individual
    members (no global reshuffle of survivors).  Weight = n_chars here (the
    curation case: prefer substantial documents).  Scale shape: priorities
    are one vectorized map, the sample is the existing partial-top-k merge
    (per-batch bottom-k, driver merges batches × k rows — no global sort).
    Weights < 2 RAISE: with w = 1 the priority can exceed int64 exactly
    where the oracle's BIGINT cast would fail loudly.  Oracle: the HUGEINT
    splitmix64 chain + h // w + ORDER BY (priority, doc_id) LIMIT k."""
    from ..stages.sketches import splitmix64
    from ..stages.topk import topk_rows

    K = 20
    ds = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    def prio(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"], dtype=np.int64)
        w = np.asarray(b["n_chars"], dtype=np.int64)
        if b.num_rows and int(w.min()) < 2:
            raise ValueError(
                "docs_weighted_sample: weight < 2 — priority could exceed int64 "
                "(the oracle's BIGINT cast would raise)"
            )
        p = (splitmix64(d.view(np.uint64)) // w.astype(np.uint64)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "weight": pa.array(w, pa.int64()),
                "priority": pa.array(p, pa.int64()),
            }
        )

    rows = ds.map_batches(prio, batch_format="pyarrow")
    out = topk_rows(rows, ["priority", "doc_id"], [False, False], K)
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["priority", "doc_id"]).reset_index(drop=True),
        preserve_index=False,
    )


def docs_rendezvous_resharding(sf_dir: str):
    """Rendezvous (highest-random-weight) shard assignment and the 8 → 9
    rescale diff — the elastic-cluster primitive: shard(d) =
    argmax_s splitmix64(32·d + s), so when a 9th shard joins, a document
    either KEEPS its shard or moves to the NEW one (argmax over a superset
    can only change to the added element) — ~1/9 of keys move, versus ~8/9
    under mod-hashing.  That minimal-disruption theorem is what makes
    resharding a 100-TB corpus an incremental copy instead of a full
    rewrite, and the output contingency (old_shard, new_shard, n_docs)
    PROVES it: every off-diagonal row has new_shard = 8.  Exact integers
    end to end: both argmaxes are vectorized per batch over the (rows × 9)
    hash matrix (ties broken to the smallest shard — numpy's first-argmax,
    mirrored in SQL by ORDER BY h DESC, s), cells contract map-side via
    bincount, ONE ≤ 72-cell groupby.  Oracle: the HUGEINT splitmix64 chain
    over unnested (doc, shard) pairs + row_number argmax replay."""
    from ..stages.sketches import splitmix64

    OLD_K, NEW_K = 8, 9
    ds = _t(sf_dir, "documents", ["doc_id"])
    empty = pa.table(
        {
            "old_shard": pa.array([], pa.int64()),
            "new_shard": pa.array([], pa.int64()),
            "n_p": pa.array([], pa.int64()),
        }
    )

    def cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        d = np.asarray(b["doc_id"], dtype=np.int64).view(np.uint64) * np.uint64(32)
        hm = np.stack([splitmix64(d + np.uint64(s)) for s in range(NEW_K)], axis=1)
        old = hm[:, :OLD_K].argmax(axis=1).astype(np.int64)
        new = hm.argmax(axis=1).astype(np.int64)
        code = old * 16 + new
        cnt = np.bincount(code, minlength=OLD_K * 16).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "old_shard": pa.array(nz // 16, pa.int64()),
                "new_shard": pa.array(nz % 16, pa.int64()),
                "n_p": pa.array(cnt[nz], pa.int64()),
            }
        )

    out = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["old_shard", "new_shard"])
        .aggregate(Sum("n_p", alias_name="n_docs"))
    )
    return pa.Table.from_pandas(
        out.to_pandas()[["old_shard", "new_shard", "n_docs"]], preserve_index=False
    )


def docs_blocking_skew(sf_dir: str):
    """Blocking-key skew audit: the histogram (block_size → n_blocks,
    pair_work = n_blocks·C(size,2)) over the word-3-gram blocking keys the
    meta-blocking stage uses — the diagnostic a linkage engineer reads
    BEFORE running candidate generation, because pair work is quadratic in
    block size and one boilerplate key can dominate the whole job (exactly
    the hot-block failure the salted join and the block purge window guard
    against; this query tells you where that purge threshold should sit).
    Scale shape: gram strings never ship — per-batch per-DOC distinct
    (hash, count) cells (a document is whole within its row, so per-batch
    cells are globally disjoint per doc), ONE hash-keyed groupby to gram
    sizes, then a size-keyed groupby over gram-scale rows contracts to the
    ≤ max-block-size histogram; pair_work is combined driver-side in Python
    ints and range-checked into int64 where the oracle's HUGEINT→BIGINT
    cast raises.  Hash-grouping equals string-grouping modulo negligible
    64-bit collisions (same documented caveat as the LSH band keys and the
    shingle-overlap matrix)."""
    from ..functions.hashing import flat_utf8, hash_strings

    ds = _t(sf_dir, "documents", ["text"])
    empty_cells = pa.table({"h": pa.array([], pa.int64()), "c_p": pa.array([], pa.int64())})

    def gram_cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_cells
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(pc.utf8_lower(b["text"])))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        n_sh = np.maximum(np.diff(offs) - 2, 0)
        total = int(n_sh.sum())
        if total == 0:
            return empty_cells
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.r_[np.int64(0), np.cumsum(n_sh)[:-1]], n_sh
        )
        i0 = np.repeat(offs[:-1], n_sh) + local
        sh = pc.binary_join_element_wise(
            flat.take(pa.array(i0)),
            flat.take(pa.array(i0 + 1)),
            flat.take(pa.array(i0 + 2)),
            " ",
        )
        h = hash_strings(*flat_utf8(sh)).view(np.int64)
        r = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), n_sh)
        order = np.lexsort((r, h))
        h, r = h[order], r[order]
        keep = np.r_[True, (h[1:] != h[:-1]) | (r[1:] != r[:-1])]  # distinct per doc
        hk = h[keep]
        uh, inv = np.unique(hk, return_inverse=True)
        return pa.table(
            {
                "h": pa.array(uh, pa.int64()),
                "c_p": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    sizes = (
        ds.map_batches(gram_cells, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("c_p", alias_name="s"))
    )
    empty_hist = pa.table(
        {"block_size": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())}
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_hist
        s = np.asarray(b["s"], dtype=np.int64)
        us, inv = np.unique(s, return_inverse=True)
        return pa.table(
            {
                "block_size": pa.array(us, pa.int64()),
                "n_p": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    hist = (
        sizes.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("block_size")
        .aggregate(Sum("n_p", alias_name="n_blocks"))
        .to_pandas()
    )
    bs = [int(v) for v in hist["block_size"]]
    nb = [int(v) for v in hist["n_blocks"]]
    pw = [n * (s * (s - 1) // 2) for s, n in zip(bs, nb)]
    if any(v >= 2**63 for v in pw):
        raise ValueError("docs_blocking_skew: pair_work overflows int64 (oracle BIGINT cast would raise)")
    return pa.table(
        {
            "block_size": pa.array(bs, pa.int64()),
            "n_blocks": pa.array(nb, pa.int64()),
            "pair_work": pa.array(pw, pa.int64()),
        }
    )


def sources_shingle_overlap(sf_dir: str):
    """Cross-source contamination matrix: for every source pair, how many
    DISTINCT word-3-shingles appear in BOTH sources — the diagnostic that
    tells a corpus curator which feeds share boilerplate / syndicated
    content before near-dup rates explode.  Scale shape: shingles hash to
    uint64 (the string never ships — the exchange carries 16 B (hash,
    source) cells, per-batch distinct first), ONE bucketed-run exchange
    groups by shingle hash, cross-batch (hash, source) dups collapse by a
    consecutive-dup mask, in-run pair expansion is `all_pairs_within_runs`
    (run length ≤ n_sources, so pair volume is bounded by sources², never
    rows), and each bucket contracts to (source_a, source_b, n) cells —
    only sources²-bounded rows reach the final groupby.  Pair order is the
    in-run STRING sort, so source_a < source_b matches the oracle's binary
    collation.  Hash-grouping equals string-grouping modulo negligible
    64-bit collisions (same caveat as the LSH band keys)."""
    from ..functions.hashing import flat_utf8, hash_strings
    from ..stages.windows import all_pairs_within_runs, grouped_ordered_runs

    ds = _t(sf_dir, "documents", ["source", "text"])
    empty_rows = pa.table(
        {"h": pa.array([], pa.int64()), "source": pa.array([], pa.string())}
    )

    def shingle_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_rows
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(pc.utf8_lower(b["text"])))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        n_sh = np.maximum(np.diff(offs) - 2, 0)
        total = int(n_sh.sum())
        if total == 0:
            return empty_rows
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.r_[np.int64(0), np.cumsum(n_sh)[:-1]], n_sh
        )
        i0 = np.repeat(offs[:-1], n_sh) + local
        sh = pc.binary_join_element_wise(
            flat.take(pa.array(i0)),
            flat.take(pa.array(i0 + 1)),
            flat.take(pa.array(i0 + 2)),
            " ",
        )
        h = hash_strings(*flat_utf8(sh)).view(np.int64)
        src = b["source"].combine_chunks() if isinstance(b["source"], pa.ChunkedArray) else b["source"]
        enc = src.take(pa.array(np.repeat(np.arange(len(offs) - 1, dtype=np.int64), n_sh))).dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        order = np.lexsort((codes, h))
        h, codes = h[order], codes[order]
        keep = np.r_[True, (h[1:] != h[:-1]) | (codes[1:] != codes[:-1])]
        return pa.table(
            {
                "h": pa.array(h[keep]),
                "source": enc.dictionary.take(pa.array(codes[keep])),
            }
        )

    empty_cells = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_partial": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return empty_cells
        h = np.asarray(g["h"], dtype=np.int64)
        src = g["source"].combine_chunks() if isinstance(g["source"], pa.ChunkedArray) else g["source"]
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        keep = np.r_[True, (h[1:] != h[:-1]) | (codes[1:] != codes[:-1])]
        h2, c2 = h[keep], codes[keep]
        s2 = np.flatnonzero(np.r_[True, h2[1:] != h2[:-1]]).astype(np.int64)
        e2 = np.r_[s2[1:], len(h2)].astype(np.int64)
        li, ri = all_pairs_within_runs(s2, e2)
        if len(li) == 0:
            return empty_cells
        k = np.int64(len(enc.dictionary))
        uk, cnt = np.unique(c2[li] * k + c2[ri], return_counts=True)
        return pa.table(
            {
                "source_a": enc.dictionary.take(pa.array(uk // k)),
                "source_b": enc.dictionary.take(pa.array(uk % k)),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = grouped_ordered_runs(
        ds.map_batches(shingle_rows, batch_format="pyarrow"), "h", ("source",), kernel
    )
    out = cells.groupby(["source_a", "source_b"]).aggregate(
        Sum("n_partial", alias_name="n_shared")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _crawl_day(ids: np.ndarray, n_days: int = 32) -> np.ndarray:
    """Deterministic synthetic crawl day for a doc id (splitmix64 % n_days) —
    pure arithmetic, so BOTH engine and oracle derive the identical view and
    the day can be RE-derived anywhere from the id alone (no day column ever
    ships through a shuffle or join)."""
    from ..stages.sketches import splitmix64

    return (splitmix64(ids.astype(np.int64).view(np.uint64)) % np.uint64(n_days)).astype(
        np.int64
    )


def sources_token_waterfill(sf_dir: str):
    """Max-min fair token-budget allocation across sources (waterfilling) —
    the data-mixing primitive that caps over-represented feeds: with budget
    B = 60 % of total tokens, find the LARGEST integer cap L with
    Σ min(c_s, L) ≤ B, then allocate min(c_s, L) per source.  Exact
    integers end to end: per-batch token counts contract to per-source
    cells (`group_sums_int64` — no float bincount), one dimension-sized
    groupby, and the cap falls out of the sorted prefix scan over ≤
    n_sources rows on the driver (the counts table IS dimension-sized; the
    corpus never leaves the workers).  Output per source: n_tokens, cap
    (constant), allocated, capped flag.  The unallocated remainder
    B − Σ min(c_s, L) < #uncapped-sources stays unallocated (documented;
    fractional top-ups would need non-integer caps)."""
    from ..functions.numeric import group_sums_int64

    ds = _t(sf_dir, "documents", ["source", "text"])
    empty_cells = pa.table(
        {"source": pa.array([], pa.string()), "n_partial": pa.array([], pa.int64())}
    )

    def counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_cells
        n = pc.cast(
            pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b["text"]))),
            pa.int64(),
        )
        src = b["source"].combine_chunks() if isinstance(b["source"], pa.ChunkedArray) else b["source"]
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        (sums,) = group_sums_int64(codes, len(enc.dictionary), np.asarray(n, dtype=np.int64))
        return pa.table(
            {
                "source": enc.dictionary,
                "n_partial": pa.array(sums),
            }
        )

    tbl = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_partial", alias_name="n_tokens"))
        .to_pandas()
    )
    c = tbl["n_tokens"].to_numpy().astype(np.int64)
    total = int(c.sum())
    budget = total * 3 // 5
    sorted_c = np.sort(c)
    n = len(c)
    pre, cap = 0, int(sorted_c[-1]) if n else 0
    for i in range(n):  # ≤ n_sources iterations — dimension-sized by design
        s_i = pre + (n - i) * int(sorted_c[i])
        if s_i > budget:
            cap = (budget - pre) // (n - i)
            break
        pre += int(sorted_c[i])
    allocated = np.minimum(c, cap)
    return pa.table(
        {
            "source": pa.array(tbl["source"].to_numpy(), pa.string()),
            "n_tokens": pa.array(c),
            "cap": pa.array(np.full(n, cap, dtype=np.int64)),
            "allocated": pa.array(allocated.astype(np.int64)),
            "capped": pa.array((c > cap).astype(np.int64)),
        }
    )


def sources_temperature_mix(sf_dir: str):
    """Temperature-scaled source-mixing allocation (α = 1/2, the
    Gopher/PaLM-style sampling exponent) — the smoothing sibling of the
    waterfill cap: each source's weight is isqrt(c_s) (integer ⌊√c_s⌋, so
    over-represented feeds are damped by the square root instead of hard
    capped) and the token budget B = 60 % of the corpus splits as
    alloc_s = B·w_s // Σw in exact integer floor division.  The per-source
    token counts reuse the waterfill contraction (`group_sums_int64`
    map-side cells, one dimension-sized groupby — the corpus never leaves
    the workers); the ≤ n_sources driver rows use ``math.isqrt`` while the
    oracle replays ⌊√c⌋ with a NEWTON recursive CTE in HUGEINT (x₀ = c,
    xₖ₊₁ = (x + c//x)//2 while it strictly decreases; the fixed point is
    exactly isqrt — no float sqrt anywhere, whose rounding could disagree
    with the integer answer near perfect squares above 2⁵³).  The sub-unit
    remainder B − Σ alloc < n_sources stays unallocated (same documented
    convention as the waterfill).  Products B·w are range-checked against
    2⁶³ so the engine fails exactly where the oracle's BIGINT cast would."""
    import math

    from ..functions.numeric import group_sums_int64

    ds = _t(sf_dir, "documents", ["source", "text"])
    empty_cells = pa.table(
        {"source": pa.array([], pa.string()), "n_partial": pa.array([], pa.int64())}
    )

    def counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_cells
        n = pc.cast(
            pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b["text"]))),
            pa.int64(),
        )
        src = b["source"].combine_chunks() if isinstance(b["source"], pa.ChunkedArray) else b["source"]
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        (sums,) = group_sums_int64(codes, len(enc.dictionary), np.asarray(n, dtype=np.int64))
        return pa.table({"source": enc.dictionary, "n_partial": pa.array(sums)})

    tbl = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_partial", alias_name="n_tokens"))
        .to_pandas()
    )
    c = [int(v) for v in tbl["n_tokens"]]
    total = sum(c)
    budget = total * 3 // 5
    w = [math.isqrt(v) for v in c]
    wsum = sum(w)
    if wsum == 0:
        raise ValueError("sources_temperature_mix: zero total weight")
    if budget * max(w) >= 2**63:
        raise ValueError("sources_temperature_mix: B*w overflows int64 (oracle BIGINT cast would raise)")
    alloc = [budget * wi // wsum for wi in w]
    return pa.table(
        {
            "source": pa.array(tbl["source"].to_numpy(), pa.string()),
            "n_tokens": pa.array(c, pa.int64()),
            "weight": pa.array(w, pa.int64()),
            "allocated": pa.array(alloc, pa.int64()),
        }
    )


def docs_wordpiece_encode(sf_dir: str):
    """WordPiece greedy longest-match-first segmentation of every DISTINCT
    corpus word against a FIXED subword vocabulary (BERT's inference-time
    tokenizer; the BPE sibling `docs_bpe_encode_fixed` applies ranked merges,
    this applies maximal-munch lookup) — per word: corpus frequency, the
    piece sequence ('##'-prefixed continuations), piece count, and the
    whole-word [UNK] flag when any position fails (the WordPiece contract:
    partial decompositions are never emitted; 'v' is deliberately missing
    from the word-initial table so the corpus exercises it).  Scale shape:
    the corpus contracts per batch to (word, count) cells (dictionary-encode
    + bincount), ONE vocabulary-sized groupby, and the greedy loop runs over
    DISTINCT words only (`stages.bpe.wordpiece_greedy` — Python bounded by
    vocab × word length, never corpus rows, same contraction as bpe_encode).
    The oracle replays maximal munch exactly: a precomputed longest-match
    table per (word, position) — row_number over piece length, ties
    impossible since equal-length matching pieces are equal — walked by a
    recursive CTE (the chain is a deterministic functional graph, so no
    aggregates-in-recursion are needed).  Vocabulary constants are the
    single source of truth for BOTH sides (`stages.bpe.WORDPIECE_INITIAL` /
    `WORDPIECE_CONT` generate the SQL VALUES list).
    Reference parity: mix_blink/data.py tokenizes with fixed pretrained HF
    tokenizers the same way — vocabulary fixed at inference, never trained
    in the pipeline."""
    from ..stages.bpe import wordpiece_greedy, wordpiece_tables
    from ..stages.vocab import tokenize_batch

    ds = _t(sf_dir, "documents", ["text"])
    empty = pa.table({"word": pa.array([], pa.string()), "n_p": pa.array([], pa.int64())})

    def wcount(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        toks = tokenize_batch(b["text"], lower=True)
        flat = pc.cast(toks.flatten(), pa.string())
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"word": enc.dictionary, "n_p": pa.array(cnt, pa.int64())})

    counts = (
        ds.map_batches(wcount, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n_p", alias_name="n_corpus"))
    )
    init_t, cont_t = wordpiece_tables()

    def encode(b: pa.Table) -> pa.Table:
        words = b["word"].to_pylist()
        pieces_s, n_pieces, is_unk = [], [], []
        for w in words:  # distinct-word scale by construction
            ps = wordpiece_greedy(w, init_t, cont_t)
            if ps is None:
                pieces_s.append("[UNK]")
                n_pieces.append(1)
                is_unk.append(1)
            else:
                pieces_s.append(" ".join(ps))
                n_pieces.append(len(ps))
                is_unk.append(0)
        return pa.table(
            {
                "word": b["word"],
                "n_corpus": b["n_corpus"],
                "pieces": pa.array(pieces_s, pa.string()),
                "n_pieces": pa.array(n_pieces, pa.int64()),
                "is_unk": pa.array(is_unk, pa.int64()),
            }
        )

    out = counts.map_batches(encode, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def docs_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth curve over the deterministic crawl-day
    view (`_crawl_day`): per day, how many DISTINCT tokens appear for the
    FIRST time in the corpus, plus the running vocabulary size — the
    diminishing-novelty signal crawl scheduling and dedup budgeting read.
    A token's first day is simply its MIN day, so the whole curve needs no
    ordered scan: per-batch (token, min-day) contraction, ONE bucketed-run
    exchange keyed by token (`grouped_ordered_runs` sorted by (token, day)
    — run head = global min), each bucket contracting to day-bounded
    (day, n) cells; the final groupby and the running sum touch ≤ 32 rows.
    Shuffle ∝ distinct (token, day) cells, never token occurrences."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    empty_rows = pa.table(
        {"token": pa.array([], pa.string()), "day": pa.array([], pa.int64())}
    )

    def token_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_rows
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(pc.utf8_lower(b["text"])))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        day = np.repeat(_crawl_day(np.asarray(b["doc_id"], dtype=np.int64)), counts)
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        order = np.lexsort((day, codes))
        codes, day = codes[order], day[order]
        first = np.r_[True, codes[1:] != codes[:-1]]  # min day per token (day sorted within)
        return pa.table(
            {
                "token": enc.dictionary.take(pa.array(codes[first])),
                "day": pa.array(day[first]),
            }
        )

    empty_cells = pa.table(
        {"day": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return empty_cells
        first_day = np.asarray(g["day"], dtype=np.int64)[starts]
        uk, cnt = np.unique(first_day, return_counts=True)
        return pa.table({"day": pa.array(uk), "n_partial": pa.array(cnt.astype(np.int64))})

    cells = grouped_ordered_runs(
        ds.map_batches(token_rows, batch_format="pyarrow"), "token", ("day",), kernel
    )
    agg = (
        cells.groupby("day")
        .aggregate(Sum("n_partial", alias_name="new_tokens"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    agg["vocab_size"] = agg["new_tokens"].cumsum()
    agg["new_tokens"] = agg["new_tokens"].astype("int64")
    agg["vocab_size"] = agg["vocab_size"].astype("int64")
    return pa.Table.from_pandas(agg, preserve_index=False)


def docs_near_dup_windowed(sf_dir: str):
    """TIME-WINDOWED near-duplicate join — duplicates only count within a
    7-day crawl window (the web-recrawl dedup pattern: the same boilerplate
    re-crawled years apart is NOT a duplicate event worth an edge).  Crawl
    day is a deterministic view ``splitmix64(doc_id) % 32`` (no timestamp in
    the table; same derive-the-version idiom as `events_snapshot_diff`).

    Scale story: LSH band keys mix in the 8-day time CELL and each band row
    is emitted into its own and the next cell (`minhash_near_dup_pairs`
    window mode), so every |Δday| ≤ 7 pair still shares ≥ 1 exchange key —
    equal cells collide home/home, adjacent cells copy/home — while a hot
    boilerplate band is bounded per (band, cell), never assembling all of
    history in one task.  Cell-boundary pairs beyond 7 days are removed by
    an EXACT |Δday| filter whose days are RE-derived from the ids by pure
    arithmetic (zero joins), then exact char-3-gram Jaccard ≥ 0.4 verifies
    text.  Output: (a_id, b_id, day_a, day_b, jaccard)."""
    from ..stages.dedup import minhash_near_dup_pairs, ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def add_day(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text": b["text"],
                "day": pa.array(_crawl_day(np.asarray(b["doc_id"], dtype=np.int64))),
            }
        )

    prep = ds.map_batches(add_day, batch_format="pyarrow")
    cand = minhash_near_dup_pairs(
        prep, DedupConfig(jaccard_threshold=0.3), window_col="day", window_width=8
    ).select_columns(["a_id", "b_id"])

    def window_filter(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a_id"], dtype=np.int64)
        bb = np.asarray(b["b_id"], dtype=np.int64)
        keep = np.abs(_crawl_day(a) - _crawl_day(bb)) <= 7
        return b.filter(pa.array(keep))

    verified = ngram_jaccard_verify(
        cand.map_batches(window_filter, batch_format="pyarrow"), ds, threshold=0.4
    )

    def attach_days(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a_id": b["a_id"],
                "b_id": b["b_id"],
                "day_a": pa.array(_crawl_day(np.asarray(b["a_id"], dtype=np.int64))),
                "day_b": pa.array(_crawl_day(np.asarray(b["b_id"], dtype=np.int64))),
                "jaccard": _round_col(b["jaccard"], 6),
            }
        )

    return pa.Table.from_pandas(
        verified.map_batches(attach_days, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )


def lineitem_bloom_semi_join(sf_dir: str):
    """Semi-join via Bloom prefilter + exact verify (``stages.bloom``):
    lineitems of high-value orders (o_totalprice > 300k), returning per-key
    quantity sums.  Semantically a plain EXISTS (false positives are removed
    by the verify join); the Bloom pass is the 100-TB shuffle-volume story —
    the broadcast is bits, not keys."""
    from ..stages.bloom import bloom_semi_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    big = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).filter(
        expr="o_totalprice > 300000.0"
    )
    keys = big.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"]}), batch_format="pyarrow"
    )
    out = bloom_semi_join(li, keys, "l_orderkey", "o_orderkey", m_bits=1 << 20, num_partitions=8)

    def partial_sum(b: pa.Table) -> pa.Table:
        # per-block contraction: the join output is key-partitioned, so most
        # keys collapse to one row here; the global agg then merges partials
        # (correct at ANY block layout — a partition split across blocks just
        # yields two partials for the same key)
        keys_np = np.asarray(b["l_orderkey"], dtype=np.int64)
        if not len(keys_np):
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()), "sum_qty": pa.array([], pa.float64())}
            )
        uk, inv = np.unique(keys_np, return_inverse=True)
        sums = np.bincount(inv, weights=np.asarray(b["l_quantity"], dtype=np.float64))
        return pa.table({"l_orderkey": pa.array(uk), "sum_qty": pa.array(sums)})

    return (
        out.map_batches(partial_sum, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"))
    )


def docs_chunk_windows(sf_dir: str):
    """Fixed-token-window chunking with overlap (50-token windows, 10-token
    overlap) — the pre-tokenization packing step of an LLM training
    pipeline, as a stateless vectorized flat-map (``stages.chunking``)."""
    from ..stages.chunking import chunk_documents

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, chunk_tokens=50, overlap=10)


def emb_norms(sf_dir: str):
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def norms(b: pa.Table) -> pa.Table:
        from ..stages.ann import vectors_from_batch

        v = vectors_from_batch(b["embedding"])
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "l2_norm": _round_col(pa.array(np.sqrt((v * v).sum(axis=1))), 4),
            }
        )

    return ds.map_batches(norms, batch_format="pyarrow")


def emb_near_dup_exact(sf_dir: str):
    """EXACT all-pairs cosine similarity join (broadcast corpus matrix,
    streamed batch × corpus matmuls) — the verification baseline for the
    LSH-bucketed emb_near_dup."""
    from ..stages.dedup import similarity_join_exact

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = similarity_join_exact(ds, threshold=0.3)
    return _round(pa.Table.from_pandas(out.to_pandas(), preserve_index=False), {"cosine": 4})


def docs_lm_perplexity(sf_dir: str):
    """CCNet-style n-gram LM quality scoring (Wenzek et al. 2020; see
    ``stages/lm.py``): a Laplace-smoothed bigram LM counted over the corpus
    in one map-side-combined groupby, broadcast once, then every document
    scored vectorized — output is per-doc average bigram NLL (monotone in
    perplexity), the quantity CCNet buckets on.  The oracle replays the
    whole thing: token/bigram counts, V, and the −ln((c₂+1)/(c₁+V)) terms."""
    from ..stages.lm import bigram_lm_scores

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = bigram_lm_scores(ds)
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": b["n_bigrams"],
                "avg_nll": _round_col(b["avg_nll"], 6),
            }
        ),
        batch_format="pyarrow",
    )


def docs_media_audio(sf_dir: str):
    """REAL canonical-WAV header decode as a driver query (the audio twin
    of ``docs_media_dimensions``): every document becomes a valid 16-bit
    PCM WAV payload with sample rate / channels / frame count derived from
    doc_id, and the actor-pool stage (``stages/multimodal.py``
    ``AudioFeatures(backend="real_headers")``) parses them back out of the
    little-endian RIFF header fields.  The oracle replays the arithmetic —
    including ``duration_ms = frames·1000 // sample_rate`` integer floor."""
    from ..stages.multimodal import AudioFeatures, make_wav_payloads

    ds = _t(sf_dir, "documents", ["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        sr = 8000 + (ids % 8) * 4000
        ch = 1 + (ids % 2)
        frames = ids % 32
        flat, off = make_wav_payloads(sr, ch, frames)
        payload = pa.Array.from_buffers(
            pa.large_binary(),
            len(off) - 1,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table(
            {
                "media_id": pc.cast(pa.array(ids), pa.string()),
                "payload": payload,
                "duration_ms": pa.array(np.zeros(len(ids), dtype=np.int32)),
            }
        )

    feats = ds.map_batches(to_media, batch_format="pyarrow").map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"backend": "real_headers", "dim": 32},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=256,
    )
    return feats.map_batches(
        lambda b: pa.table(
            {
                "media_id": b["media_id"],
                "sample_rate": b["sample_rate"],
                "n_channels": b["wav_channels"],
                "bits_per_sample": b["bits_per_sample"],
                "wav_duration_ms": b["wav_duration_ms"],
            }
        ),
        batch_format="pyarrow",
    )


def docs_media_video(sf_dir: str):
    """REAL MP4 ``moov/mvhd`` header decode driving the frame-sampling
    flat-map (the video leg of the media trio): each document becomes a
    structurally valid MP4 (ftyp + moov/mvhd, timescale and duration from
    doc_id); ``VideoFrameSampler(backend="real_headers")`` walks the boxes,
    derives the clip duration from the BYTES, and explodes one row per
    sampled frame.  Output: per-clip frame counts — the oracle replays
    duration_ms = dur·1000 // timescale and the sampling-grid arithmetic."""
    from ..stages.multimodal import VideoFrameSampler, make_mp4_payloads

    ds = _t(sf_dir, "documents", ["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        ts = 1000 + (ids % 10) * 100
        dur_units = (ids % 20) * 2500
        flat, off = make_mp4_payloads(ts, dur_units)
        payload = pa.Array.from_buffers(
            pa.large_binary(),
            len(off) - 1,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table(
            {
                "media_id": pc.cast(pa.array(ids), pa.string()),
                "payload": payload,
                # metadata column deliberately zero: the sampler must take
                # the duration from the parsed mvhd, not this fallback
                "duration_ms": pa.array(np.zeros(len(ids), dtype=np.int64)),
            }
        )

    frames = ds.map_batches(to_media, batch_format="pyarrow").map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"backend": "real_headers", "every_ms": 1000, "max_frames": 16},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=256,
    )
    return (
        frames.map_batches(
            lambda b: pa.table({"media_id": b["media_id"]}), batch_format="pyarrow"
        )
        .groupby("media_id")
        .aggregate(Count(alias_name="n_frames"))
    )


def docs_dsir_importance(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023; ``stages/lm.py``
    ``dsir_log_importance``): every document weighted by log p_target −
    log p_raw under two corpus-counted bigram LMs — target = the
    lexicographically first source (deterministic, SQL-replayable), raw =
    the whole corpus.  Both models broadcast once; one scoring pass.  The
    oracle replays both count tables, both vocabularies, and every
    smoothed −ln term (LEFT JOIN + COALESCE for the unseen-gram smoothing
    mass)."""
    from ..stages.lm import dsir_log_importance

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])
    srcs = ds.map_batches(
        lambda b: pa.table({"source": pc.unique(b["source"])}), batch_format="pyarrow"
    ).to_pandas()
    tgt_src = sorted(srcs["source"])[0]
    target = ds.map_batches(
        lambda b: b.filter(pc.equal(b["source"], tgt_src)).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    raw = ds.map_batches(lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow")
    out = dsir_log_importance(raw, target)
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": b["n_bigrams"],
                "log_w": _round_col(b["log_w"], 6),
            }
        ),
        batch_format="pyarrow",
    )


def emb_semantic_dedup(sf_dir: str):
    """SemDeDup-shape semantic dedup (Abbas et al. 2023 — see
    ``stages/dedup.py`` ``semantic_dedup``): LSH-bucketed cosine ≥ 0.3
    candidates, deterministic keep-lowest-id drop rule, drop-list
    broadcast/join duality.  τ = 0.3 exercises real drops on the synth
    embeddings (max in-bucket cosine ≈ 0.35; the cosine is float64 on both
    sides, the same boundary contract ``emb_near_dup_exact`` has run green
    on since round 2)."""
    from ..stages.dedup import DedupConfig, semantic_dedup

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = semantic_dedup(ds, DedupConfig(cosine_threshold=0.3))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def emb_near_dup(sf_dir: str):
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_near_dup_pairs(ds, DedupConfig(cosine_threshold=0.95)).to_pandas()
    if out.empty:  # zero-block datasets lose their schema through to_pandas
        return pa.table(
            {
                "a_id": pa.array([], pa.int64()),
                "b_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    return _round(pa.Table.from_pandas(out, preserve_index=False), {"cosine": 6})


# ── training-data curation additions (round-3 continuation) ─────────────────


def events_value_quantiles(sf_dir: str):
    """Exact per-group quantiles WITHOUT a global sort: cent-quantized
    map-side histogram combine → tiny (group, cell) groupby → driver reads
    quantiles off the merged weighted histogram (see ``stages.quantiles``).
    Shuffle volume is ``n_groups × distinct_cents`` rows, row-count free."""
    from ..stages.quantiles import grouped_exact_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])
    return grouped_exact_quantiles(ds, "event_type", "value", [0.5, 0.9, 0.99], scale=100.0)


def events_range_bins(sf_dir: str):
    """Broadcast RANGE JOIN: a small bin-boundary table (40 × 25-unit bins)
    joined to events on ``lo <= value < hi`` via ``np.searchsorted`` per
    batch — the non-equi join the Dataset API lacks, expressed as a
    broadcast + vectorized bisect with map-side count/sum combine (only
    per-bin partials enter the exchange)."""
    ds = _t(sf_dir, "events", ["value"])
    n_bins = 40
    edges = np.arange(0.0, (n_bins + 1) * 25.0, 25.0)

    def binjoin(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"], dtype=np.float64)
        idx = np.searchsorted(edges, v, side="right") - 1
        m = (idx >= 0) & (idx < n_bins)
        idx, v = idx[m], v[m]
        cents = np.rint(v * 100.0).astype(np.int64)
        from ..functions.numeric import group_sums_int64

        n = np.bincount(idx, minlength=n_bins)
        (s,) = group_sums_int64(idx, n_bins, cents)  # exact int64, no float53 weights
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "bin_id": pa.array(nz.astype(np.int64)),
                "n_partial": pa.array(n[nz].astype(np.int64)),
                "c_partial": pa.array(s[nz]),
            }
        )

    agg = (
        ds.map_batches(binjoin, batch_format="pyarrow")
        .groupby("bin_id")
        .aggregate(Sum("n_partial", alias_name="n"), Sum("c_partial", alias_name="c"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    bins = np.asarray(tbl["bin_id"], dtype=np.int64)
    return pa.table(
        {
            "bin_id": tbl["bin_id"],
            "lo": pa.array(bins * 25.0),
            "hi": pa.array((bins + 1) * 25.0),
            "n": tbl["n"],
            "total_value": pc.divide(pc.cast(tbl["c"], pa.float64()), pa.scalar(100.0)),
        }
    )


def events_distinct_users(sf_dir: str):
    """Distinct-count with map-side dedup: per-batch distinct
    (event_type, user_id) pairs (an in-batch Arrow group_by), one pair
    groupby for the global dedup, then a tiny per-type count — the exchange
    carries distinct pairs, never raw events."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    pairs = (
        ds.map_batches(
            lambda b: b.group_by(["event_type", "user_id"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="n_dup"))
    )
    out = (
        pairs.map_batches(lambda b: b.select(["event_type"]), batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_sliding_1h(sf_dir: str):
    """Sliding RANGE-frame window (1 hour preceding, peers included): per
    user, count and exact cent-sum of events in ``[ts-1h, ts]``.  Bucketed-
    run exchange + the segmented-searchsorted trick
    (``stages.windows.segment_offset_ts``): timestamps are lifted onto one
    globally sorted axis by adding ``run_id × BIG`` (BIG > span + 1h, so a
    frame can never cross a user boundary), then ONE ``searchsorted`` pair +
    one cumsum answers every user's frames at once — no per-user Python."""
    from ..stages.windows import grouped_ordered_runs, segment_offset_ts

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "cents": _cents(b["value"]),
            }
        ),
        batch_format="pyarrow",
    )

    HOUR_US = 3_600_000_000

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        ts = np.asarray(g["ts_us"], dtype=np.int64) if n else np.empty(0, np.int64)
        cents = np.asarray(g["cents"], dtype=np.int64) if n else np.empty(0, np.int64)
        ts_adj, _ = segment_offset_ts(ts, starts, ends, HOUR_US)
        lo = np.searchsorted(ts_adj, ts_adj - HOUR_US, side="left")
        hi = np.searchsorted(ts_adj, ts_adj, side="right")  # RANGE includes peers
        cs = np.concatenate([[0], np.cumsum(cents)])
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "n_1h": pa.array((hi - lo).astype(np.int64)),
                "sum_1h": pa.array((cs[hi] - cs[lo]).astype(np.float64) / 100.0),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_purchase_asof_view(sf_dir: str):
    """AS-OF JOIN between two event streams: each purchase matched to the
    SAME USER's most recent view at-or-before it (-1 sentinels when none).
    Both streams are filtered map-side (only purchase/view rows enter the
    exchange); the temporal match runs through the bucketed-run exchange +
    segmented-searchsorted (``stages.windows``) — ONE searchsorted over the
    run-offset axis matches every user's purchases at once, with a run-id
    check so a hit is always the same user's view.  View-time ties dedup to
    the smallest event_id so the match is deterministic (the oracle's
    QUALIFY does the same)."""
    from ..stages.windows import grouped_ordered_runs, segment_offset_ts

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    prep = ds.map_batches(
        lambda b: (
            lambda f: pa.table(
                {
                    "user_id": f["user_id"],
                    "event_id": f["event_id"],
                    "ts_us": pc.cast(f["ts"], pa.int64()),
                    "is_view": pc.equal(f["event_type"], pa.scalar("view")),
                }
            )
        )(b.filter(pc.is_in(b["event_type"], value_set=pa.array(["purchase", "view"])))),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        is_view = np.asarray(g["is_view"], dtype=bool) if n else np.empty(0, bool)
        ts = np.asarray(g["ts_us"], dtype=np.int64) if n else np.empty(0, np.int64)
        ids = np.asarray(g["event_id"], dtype=np.int64) if n else np.empty(0, np.int64)
        ts_adj, rid = segment_offset_ts(ts, starts, ends, 0)
        # view side: bucket sort is (user, ts, event_id), so the FIRST view
        # per (run, ts) is the smallest event_id — the deterministic tie rule
        vadj, vts, vids, vrun = ts_adj[is_view], ts[is_view], ids[is_view], rid[is_view]
        if len(vadj):
            first = np.concatenate([[True], vadj[1:] != vadj[:-1]])
            vadj, vts, vids, vrun = vadj[first], vts[first], vids[first], vrun[first]
        pmask = ~is_view
        padj, pts, pids, prun = ts_adj[pmask], ts[pmask], ids[pmask], rid[pmask]
        idx = np.searchsorted(vadj, padj, side="right") - 1
        safe = np.clip(idx, 0, None)
        # a hit must be the SAME user's view (offset axis keeps runs apart,
        # but an earlier run's last view is still a smaller value — check rid)
        hit = (idx >= 0) & (vrun[safe] == prun) if len(vadj) else np.zeros(len(padj), bool)
        view_id = np.where(hit, vids[safe] if len(vadj) else -1, -1)
        gap = np.where(hit, pts - (vts[safe] if len(vadj) else 0), -1)
        return pa.table(
            {
                "purchase_id": pa.array(pids),
                "user_id": g.filter(pa.array(pmask))["user_id"]
                if n
                else pa.array([], g["user_id"].type),
                "view_id": pa.array(view_id.astype(np.int64)),
                "gap_us": pa.array(gap.astype(np.int64)),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_rollup(sf_dir: str):
    """Multi-granularity ROLLUP — (type, day) / (type) / grand total — from
    ONE map-side partial: each batch pre-aggregates (type, day) cells with
    an in-batch Arrow group_by, the tiny cell table shuffles once, and the
    coarser levels are derived from the merged base ON THE DRIVER (the base
    is types × days rows — the whole point of rollup from partials: never
    re-scan, never re-shuffle).  'ALL' sentinels keep the output null-free
    for the value-hash compare."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cells = pa.table(
            {
                "event_type": b["event_type"],
                "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
                "cents": _cents(b["value"]),
            }
        )
        g = cells.group_by(["event_type", "day"]).aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "day", "c_partial", "n_partial"])

    base = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n_partial", alias_name="n"), Sum("c_partial", alias_name="c"))
    )
    df = base.to_pandas()
    by_type = df.groupby("event_type", as_index=False)[["n", "c"]].sum()
    by_type["day"] = "ALL"
    total = pa.table(
        {
            "event_type": pa.array(["ALL"]),
            "day": pa.array(["ALL"]),
            "n": pa.array([int(df["n"].sum())], pa.int64()),
            "c": pa.array([int(df["c"].sum())], pa.int64()),
        }
    ).to_pandas()
    import pandas as pd

    out = pd.concat([df, by_type[["event_type", "day", "n", "c"]], total], ignore_index=True)
    out["total_value"] = out.pop("c").astype(np.float64) / 100.0
    return pa.Table.from_pandas(out[["event_type", "day", "n", "total_value"]], preserve_index=False)


def events_cube(sf_dir: str):
    """Full CUBE over (type, hour-of-day) — all four grouping sets — from ONE
    exchange: each batch pre-aggregates base cells in-batch, then emits every
    grouping set's cells with 'ALL' sentinels, and a single global
    ``groupby(type, hour)`` merges them.  This is the scale-safe dual of
    ``events_rollup``'s derive-coarse-levels-on-the-driver shape: here the
    driver never holds the base cell table, so the cube stays distributed
    even when base-cell cardinality explodes (type × hour is tiny; type ×
    user at 10⁹ users wouldn't be).  Shuffle volume = Σ grouping-set cells
    per batch — row-count free."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        # the margin sentinel must be out-of-band: a REAL 'ALL' value would
        # merge base cells with margin cells (SQL CUBE keeps them apart via
        # NULL) — raise rather than silently conflate
        if pc.any(pc.equal(b["event_type"], "ALL")).as_py():
            raise ValueError("event_type value 'ALL' collides with the CUBE margin sentinel")
        cells = pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.cast(pc.hour(b["ts"]), pa.string()),
                "cents": _cents(b["value"]),
            }
        )
        base = (
            cells.group_by(["event_type", "hour"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["event_type", "hour", "c_partial", "n_partial"])
        )
        alls = pa.nulls(len(base), pa.string()).fill_null("ALL")
        sets = [base]
        for mask_type, mask_hour in ((False, True), (True, False), (True, True)):
            t = pa.table(
                {
                    "event_type": alls if mask_type else base["event_type"],
                    "hour": alls if mask_hour else base["hour"],
                    "c_partial": base["c_partial"],
                    "n_partial": base["n_partial"],
                }
            )
            sets.append(
                t.group_by(["event_type", "hour"])
                .aggregate([("c_partial", "sum"), ("n_partial", "sum")])
                .rename_columns(["event_type", "hour", "c_partial", "n_partial"])
            )
        return pa.concat_tables(sets)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n_partial", alias_name="n"), Sum("c_partial", alias_name="c"))
        .to_pandas()
    )
    out["total_value"] = out.pop("c").astype(np.float64) / 100.0
    return pa.Table.from_pandas(
        out[["event_type", "hour", "n", "total_value"]], preserve_index=False
    )


def docs_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer-merge training (``stages.bpe.bpe_train``,
    Sennrich et al. 2016) — 12 merges learned over the corpus word-frequency
    table: one corpus pass builds (word, count), every round after touches
    only the vocabulary-sized word table (pair-count partials → one tiny
    groupby → partial-top-k argmax → vectorized leftmost-greedy merge).
    Rows-only by design: the K-round global argmax is iterative and
    SQL-inexpressible; determinism + exact semantics are gated instead by
    the independent single-process reference parity in
    ``tests/test_bpe.py`` (merge sequences identical at two partition
    layouts)."""
    from ..stages.bpe import bpe_train
    from ..stages.vocab import token_counts

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return bpe_train(token_counts(ds, "text"), n_merges=12, min_count=2)


# Fixed BPE merge table for the oracled encode query (rank order).  Shared
# literal between the engine call and the generated SQL so they cannot drift.
_BPE_FIXED_MERGES = [
    ("e", "r"), ("er", "</w>"), ("t", "h"), ("th", "e"), ("the", "</w>"),
    ("i", "n"), ("in", "</w>"), ("o", "n"), ("a", "n"), ("s", "</w>"),
]


def docs_bpe_encode_fixed(sf_dir: str):
    """BPE ENCODE with a fixed merge table (the inference side of
    ``docs_bpe_merges``): shuffle-free map-only segmentation — each batch
    contracts to distinct tokens, applies the merges with the training
    kernel, scatters subword lengths back per doc.  Because the merges are
    fixed inputs, the whole segmentation replays in SQL as sequential
    ``replace()`` over separator-joined characters (leftmost-greedy
    non-overlapping — exactly the engine's run-parity semantics), making
    this the ORACLED half of the BPE pair."""
    from ..stages.bpe import bpe_encode

    def prep(b: pa.Table) -> pa.Table:
        # '|' is the oracle's subword separator — strip it on BOTH sides so
        # the replay stays well-defined on any text (the testdata corpus is
        # lowercase letters + spaces, so this is a no-op there)
        txt = pc.replace_substring(b["text"], pattern="|", replacement="")
        t = pa.table({"doc_id": b["doc_id"], "text": txt})
        return t.filter(pc.not_equal(pc.utf8_trim_whitespace(t["text"]), ""))

    ds = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(prep, batch_format="pyarrow")
    return bpe_encode(ds, _BPE_FIXED_MERGES)


def events_zorder_cells(sf_dir: str):
    """Z-ORDER (Morton) layout key over (user-bucket, hour-of-day): bits of
    the two dimensions interleaved into one sort/partition key — the
    data-layout primitive that makes multi-dimensional scan pruning work at
    100 TB (a file sorted by z-key has bounded extent in BOTH dims, so a
    reader filtering on either column can skip most row groups; sorting by
    one key alone prunes only that key).  Each z-cell (key >> 6, i.e. 8×8
    tiles) reports row count and its min/max extent in both dims — the
    locality property is asserted directly in ``tests/test_zorder.py`` and
    the bit-interleave arithmetic replays exactly in SQL."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        u = (np.asarray(b["user_id"], dtype=np.int64) % 256).astype(np.int64)
        h = np.asarray(pc.hour(b["ts"]), dtype=np.int64)
        z = np.zeros(len(u), dtype=np.int64)
        for k in range(8):
            z |= ((u >> k) & 1) << (2 * k + 1)
            z |= ((h >> k) & 1) << (2 * k)
        cell = z >> 6
        t = pa.table(
            {
                "zcell": pa.array(cell, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "h": pa.array(h, pa.int64()),
            }
        )
        g = t.group_by("zcell").aggregate(
            [("u", "min"), ("u", "max"), ("h", "min"), ("h", "max"), ([], "count_all")]
        )
        return g.rename_columns(["zcell", "u_min_p", "u_max_p", "h_min_p", "h_max_p", "n_p"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("zcell")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Min("u_min_p", alias_name="u_min"),
            Max("u_max_p", alias_name="u_max"),
            Min("h_min_p", alias_name="h_min"),
            Max("h_max_p", alias_name="h_max"),
        )
    )
    return pa.Table.from_pandas(
        out.to_pandas()[["zcell", "n", "u_min", "u_max", "h_min", "h_max"]],
        preserve_index=False,
    )


def docs_simjoin_exact(sf_dir: str):
    """EXACT set-similarity join (``stages.simjoin.ppjoin_pairs``, prefix +
    length filter, Xiao et al. 2008): every pair with token-set Jaccard ≥
    0.4 — zero misses, the deterministic complement of the probabilistic
    MinHash path.  Restricted to doc_id < 600 so the brute-force all-pairs
    SQL oracle stays tractable (the engine's own cost is prefix-bounded and
    needs no such restriction — the zero-miss parity tests run unrestricted
    random corpora)."""
    from ..stages.simjoin import ppjoin_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], pa.scalar(600, pa.int64()))),
        batch_format="pyarrow",
    )
    return ppjoin_pairs(ds, 0.4)


def customers_name_edit1(sf_dir: str):
    """EXACT edit-distance-≤1 name join via deletion neighborhoods (FastSS,
    ``stages.simjoin.edit1_join``): zero misses, unlike the windowed
    sorted-neighborhood pass (``customers_name_neighbors``) which only sees
    sort-adjacent pairs.  Variant HASHES (an O(1)-per-deletion rolling-hash
    trick — strings are never materialized) route through one bucketed
    exchange; candidates verify with the vectorized Levenshtein DP.
    Restricted to c_custkey ≤ 600 so the brute-force all-pairs oracle stays
    tractable; the engine itself is emission-bounded by rows × (len+1)."""
    from ..stages.simjoin import edit1_join

    ds = _t(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda b: b.filter(pc.less_equal(b["c_custkey"], pa.scalar(600, pa.int64()))),
        batch_format="pyarrow",
    )
    return edit1_join(ds, "c_name", "c_custkey")


def docs_er_cluster_purity(sf_dir: str):
    """Cluster-quality evaluation table for the verified near-dup ER
    clustering: per cluster — size, Σ n_cs² (the B³/purity numerator over
    source classes), majority-class size, and distinct classes.  B³
    precision is Σ purity_num/n_c / N and purity is Σ max_ncs / N — both
    derivable from these EXACT INTEGER sufficient statistics, which is the
    point: per-element float averages are distributed-sum-order-dependent
    and would break hash parity, while integer cells replay exactly.
    Distributed shape: closure labels join the source column (partitioned),
    (cluster, source) cells contract map-side, two cell-sized groupbys —
    nothing driver-side scales with rows."""
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    verified = ngram_jaccard_verify(_window_pair_table(ds, 5), ds, threshold=0.5)
    labels = _verified_cluster_labels(ds, verified)
    src = _t(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        lambda b: pa.table({"sdoc": b["doc_id"], "source": b["source"]}),
        batch_format="pyarrow",
    )
    import ray

    from ..stages.clustering import clamped_partitions

    n_parts = clamped_partitions(ds.count(), max(8, int(ray.cluster_resources().get("CPU", 8))))
    joined = labels.join(src, join_type="inner", num_partitions=n_parts, on=("doc_id",), right_on=("sdoc",))

    def cell_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({"cluster_id": b["cluster_id"], "source": b["source"]})
            .group_by(["cluster_id", "source"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cluster_id", "source", "n_partial"])

    cells = (
        joined.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cluster_id", "source"])
        .aggregate(Sum("n_partial", alias_name="n_cs"))
    )

    def per_cluster_partial(b: pa.Table) -> pa.Table:
        n_cs = np.asarray(b["n_cs"], dtype=np.int64)
        t = pa.table(
            {
                "cluster_id": b["cluster_id"],
                "n_cs": b["n_cs"],
                "sq": pa.array(n_cs * n_cs, pa.int64()),
            }
        )
        g = t.group_by("cluster_id").aggregate(
            [("n_cs", "sum"), ("sq", "sum"), ("n_cs", "max"), ([], "count_all")]
        )
        return g.rename_columns(["cluster_id", "nc_p", "sq_p", "mx_p", "ns_p"])

    out = (
        cells.map_batches(per_cluster_partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(
            Sum("nc_p", alias_name="n_c"),
            Sum("sq_p", alias_name="purity_num"),
            Max("mx_p", alias_name="max_ncs"),
            Sum("ns_p", alias_name="n_sources"),
        )
    )
    return pa.Table.from_pandas(
        out.to_pandas()[["cluster_id", "n_c", "purity_num", "max_ncs", "n_sources"]],
        preserve_index=False,
    )


def docs_er_rand_index(sf_dir: str):
    """(Adjusted) Rand index sufficient statistics for the verified ER
    clustering against the source classes — the pair-counting partner of the
    B³/purity table (``docs_er_cluster_purity``): ONE summary row with the
    exact integer pair counts the Rand family is defined over.  tp_pairs =
    Σ C(n_ij,2) over the contingency cells, cluster_pairs = Σ C(a_i,2) over
    cluster sizes, class_pairs = Σ C(b_j,2) over class sizes, pair_total =
    C(n,2); Rand = (pair_total − cluster_pairs − class_pairs + 2·tp) /
    pair_total emitted as a non-negative permille floor division (identical
    on numpy and DuckDB), and ARI — whose value can be NEGATIVE, where
    numpy's floor and DuckDB's truncating ``//`` disagree — ships as the
    exact integer rational ``ari_num / ari_den`` (= 2·(tp·C − pr·pc) /
    (C·(pr+pc) − 2·pr·pc)) with NO division at all, so the hash can never
    drift on sign.  Distributed shape: the contingency cells are the same
    single bucketed exchange as the purity query; cluster sizes are a
    cell-scale groupby of those cells, class sizes a map-side count
    contraction over documents — the driver touches only ≤ a dozen scalars,
    combined in arbitrary-precision Python ints and RANGE-CHECKED into int64
    exactly where the oracle's BIGINT cast would raise (house convention:
    fail loudly together, never wrap).  Reference parity target:
    mix_blink/evaluation.py computes per-mention micro metrics; pair-counting
    cluster agreement is the ER-native equivalent over the clustering output."""
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    verified = ngram_jaccard_verify(_window_pair_table(ds, 5), ds, threshold=0.5)
    labels = _verified_cluster_labels(ds, verified)
    src = _t(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        lambda b: pa.table({"sdoc": b["doc_id"], "source": b["source"]}),
        batch_format="pyarrow",
    )
    import ray

    from ..stages.clustering import clamped_partitions

    n_docs = ds.count()
    n_parts = clamped_partitions(n_docs, max(8, int(ray.cluster_resources().get("CPU", 8))))
    joined = labels.join(src, join_type="inner", num_partitions=n_parts, on=("doc_id",), right_on=("sdoc",))

    def cell_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({"cluster_id": b["cluster_id"], "source": b["source"]})
            .group_by(["cluster_id", "source"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cluster_id", "source", "n_partial"])

    cells = (
        joined.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cluster_id", "source"])
        .aggregate(Sum("n_partial", alias_name="n_cs"))
    )

    # C(m,2) partials stay int64-safe: m ≤ n_docs and we RAISE before any
    # square can exceed 2^63 (DuckDB's HUGEINT survives to the BIGINT cast;
    # the driver combine below uses Python ints so only outputs are checked).
    if n_docs >= 3_000_000_000:
        raise ValueError("docs_er_rand_index: C(n,2) exceeds int64 — emit raw cells instead")

    def tp_partial(b: pa.Table) -> pa.Table:
        m = np.asarray(b["n_cs"], dtype=np.int64)
        agg = pa.table(
            {"cluster_id": b["cluster_id"], "a_p": b["n_cs"], "tp_p": pa.array(m * (m - 1) // 2, pa.int64())}
        )
        g = agg.group_by("cluster_id").aggregate([("a_p", "sum"), ("tp_p", "sum")])
        return g.rename_columns(["cluster_id", "a_p", "tp_p"])

    per_cluster = (
        cells.map_batches(tp_partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Sum("a_p", alias_name="a_i"), Sum("tp_p", alias_name="tp_c"))
    )

    def reduce_partial(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a_i"], dtype=np.int64)
        tp = np.asarray(b["tp_c"], dtype=np.int64)
        return pa.table(
            {
                "pr_p": pa.array([int((a * (a - 1) // 2).sum())], pa.int64()),
                "tp_sum_p": pa.array([int(tp.sum())], pa.int64()),
            }
        )

    red = per_cluster.map_batches(reduce_partial, batch_format="pyarrow").sum(["pr_p", "tp_sum_p"])
    pr, tp = int(red["sum(pr_p)"]), int(red["sum(tp_sum_p)"])

    def class_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"source": b["source"]}).group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "b_partial"])

    classes = (
        _t(sf_dir, "documents", ["source"])
        .map_batches(class_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("b_partial", alias_name="b_j"))
        .to_pandas()
    )
    pc2 = sum(int(v) * (int(v) - 1) // 2 for v in classes["b_j"])

    n = int(n_docs)
    pair_total = n * (n - 1) // 2
    if pair_total == 0:
        raise ValueError("docs_er_rand_index: fewer than 2 documents")
    rand_permille = (1000 * (pair_total - pr - pc2 + 2 * tp)) // pair_total
    ari_num = 2 * (tp * pair_total - pr * pc2)
    ari_den = pair_total * (pr + pc2) - 2 * pr * pc2
    if ari_den == 0:
        raise ValueError("docs_er_rand_index: degenerate clustering (ARI undefined)")
    for name, v in (("ari_num", ari_num), ("ari_den", ari_den), ("pair_total", pair_total)):
        if not (-(2**63) <= v < 2**63):
            raise ValueError(f"docs_er_rand_index: {name} overflows int64 (oracle BIGINT cast would raise)")
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "pair_total": pa.array([pair_total], pa.int64()),
            "tp_pairs": pa.array([tp], pa.int64()),
            "cluster_pairs": pa.array([pr], pa.int64()),
            "class_pairs": pa.array([pc2], pa.int64()),
            "rand_permille": pa.array([rand_permille], pa.int64()),
            "ari_num": pa.array([ari_num], pa.int64()),
            "ari_den": pa.array([ari_den], pa.int64()),
        }
    )


PAGERANK_SCALE = 10**12
PAGERANK_BASE = 15 * PAGERANK_SCALE // 100  # 0.15·S exactly
PAGERANK_ITERS = 4
PAGERANK_OUT_DEG = 3


def customers_pagerank(sf_dir: str):
    """Integer PageRank over the deterministic hash-functional customer graph
    (each node u has exactly 3 out-edges u → splitmix64(8u+k) mod n,
    k = 0,1,2): 4 damped iterations r′(v) = 0.15·S + 0.85 · Σ_in (r(u) // 3),
    ALL in exact non-negative int64 floor arithmetic (S = 10¹²) so the
    fixed-point replays bit-for-bit in SQL — the oracle UNROLLS the four
    iterations as a CTE chain (aggregates are illegal inside a recursive
    term) on the same HUGEINT splitmix64 multiply-split as the HLL/CMS
    oracles.  The iterative-groupby shape is the scale-relevant part — the
    same repeated shuffle-aggregate loop as the north star's min-label
    propagation, but with SUM semantics: contributions are EMITTED from each
    rank row by pure arithmetic (a functional graph needs no edge table; a
    materialized web graph swaps the emit for an edge-table join feeding the
    SAME groupby), one node-scale exchange per iteration, zero-in-degree
    nodes kept alive by a zero self-contribution row.  The contiguous-key
    domain [0, n−1] is ASSERTED, not assumed, and hub sums are range-checked so
    int64 fails exactly where the oracle's BIGINT cast would.
    Reference parity: mix_blink has no graph stage; this generalizes the
    clustering family (stages/clustering.py) from min- to sum-propagation."""
    import ray

    from ..stages.sketches import splitmix64

    ds = _t(sf_dir, "customer", ["c_custkey"])
    n = ds.count()
    if n == 0:
        raise ValueError("customers_pagerank: empty customer table")
    mm = ds.aggregate(Min("c_custkey"), Max("c_custkey"))
    if int(mm["min(c_custkey)"]) != 0 or int(mm["max(c_custkey)"]) != n - 1:
        raise ValueError("customers_pagerank: c_custkey domain is not contiguous [0, n-1]")
    nu = np.uint64(n)

    ranks = ds.map_batches(
        lambda b: pa.table(
            {
                "v": pc.cast(b["c_custkey"], pa.int64()),
                "r": pa.array(np.full(b.num_rows, PAGERANK_SCALE, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def contribs(b: pa.Table) -> pa.Table:
        v = np.asarray(b["v"], dtype=np.int64)
        c = np.asarray(b["r"], dtype=np.int64) // PAGERANK_OUT_DEG
        base_in = v.astype(np.uint64) * np.uint64(8)
        dsts = [
            (splitmix64(base_in + np.uint64(k)) % nu).astype(np.int64)
            for k in range(PAGERANK_OUT_DEG)
        ]
        dst = np.concatenate(dsts + [v])  # zero self-row keeps sinks alive
        con = np.concatenate([c] * PAGERANK_OUT_DEG + [np.zeros(len(v), np.int64)])
        t = pa.table({"v": pa.array(dst, pa.int64()), "c_p": pa.array(con, pa.int64())})
        return t.group_by("v").aggregate([("c_p", "sum")]).rename_columns(["v", "c_p"])

    def next_rank(b: pa.Table) -> pa.Table:
        s = np.asarray(b["s"], dtype=np.int64)
        if len(s) and int(s.max(initial=0)) >= (2**63 - 1) // 85:
            raise ValueError("customers_pagerank: hub contribution sum overflows int64")
        return pa.table(
            {"v": b["v"], "r": pa.array(PAGERANK_BASE + (85 * s) // 100, pa.int64())}
        )

    for _ in range(PAGERANK_ITERS):
        ranks = (
            ranks.map_batches(contribs, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("c_p", alias_name="s"))
            .map_batches(next_rank, batch_format="pyarrow")
        )

    out = ranks.map_batches(
        lambda b: pa.table({"c_custkey": b["v"], "rank_scaled": b["r"]}),
        batch_format="pyarrow",
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


WL_ROUNDS = 2
WL_OUT_DEG = 3  # same deterministic hash-functional out-edges as PageRank


def customers_wl_fingerprint(sf_dir: str):
    """Weisfeiler–Lehman structural fingerprint (2 refinement rounds) over
    the deterministic hash-functional customer graph (u → splitmix64(8u+k)
    mod n, k = 0,1,2 — PageRank's graph): the graph-isomorphism screen that
    detects structurally-identical neighborhoods, output as the color-class
    histogram (wl_color, n_nodes).  Colors init to IN-degree, then each
    round rehashes (own color, MULTISET of in-neighbor colors): the multiset
    encodes as Σ splitmix64(color(u)) mod 2⁶⁴ — commutative, so the value is
    independent of edge order, partitioning and batch boundaries BY
    CONSTRUCTION (the table-checksum trick), and col′ =
    splitmix64(splitmix64(col) XOR Σ).  One node-scale groupby per round
    (the north star's iterative shuffle-aggregate loop with multiset-hash
    semantics); contributions EMIT from color rows by pure arithmetic (an
    edge-table graph swaps the emit for a join feeding the SAME groupby);
    zero-in-degree nodes stay alive via a zero self-row that also carries
    the node's own color through the SAME exchange (one shuffle recovers
    both Σ and col).  Engine sums wrap exactly: hash halves split 32/32 so
    partial sums stay < n·2³² < 2⁶³ (n < 2³¹ ASSERTED with the contiguous
    domain), recombined per node in native-wrapping uint64; the oracle sums
    whole hashes in HUGEINT and reduces % 2⁶⁴ — identical by construction.
    Colors ship as the signed two's-complement int64 view (epoch-shuffle
    convention)."""
    import ray

    from ..stages.sketches import splitmix64

    ds = _t(sf_dir, "customer", ["c_custkey"])
    n = ds.count()
    if n == 0:
        raise ValueError("customers_wl_fingerprint: empty customer table")
    if n >= 2**31:
        raise ValueError(
            "customers_wl_fingerprint: n >= 2^31 — the 32-bit-half partial "
            "sums would no longer be provably wrap-free in int64"
        )
    mm = ds.aggregate(Min("c_custkey"), Max("c_custkey"))
    if int(mm["min(c_custkey)"]) != 0 or int(mm["max(c_custkey)"]) != n - 1:
        raise ValueError("customers_wl_fingerprint: c_custkey domain is not contiguous [0, n-1]")
    nu = np.uint64(n)

    nodes = ds.map_batches(
        lambda b: pa.table({"v": pc.cast(b["c_custkey"], pa.int64())}), batch_format="pyarrow"
    )

    def _dsts(v: np.ndarray) -> np.ndarray:
        base = v.astype(np.uint64) * np.uint64(8)
        return np.concatenate(
            [(splitmix64(base + np.uint64(k)) % nu).astype(np.int64) for k in range(WL_OUT_DEG)]
        )

    def indeg_emit(b: pa.Table) -> pa.Table:
        v = np.asarray(b["v"], dtype=np.int64)
        dst = np.concatenate([_dsts(v), v])
        d_p = np.concatenate(
            [np.ones(WL_OUT_DEG * len(v), np.int64), np.zeros(len(v), np.int64)]
        )
        t = pa.table({"v": pa.array(dst), "d_p": pa.array(d_p)})
        return t.group_by("v").aggregate([("d_p", "sum")]).rename_columns(["v", "d_p"])

    colors = (
        nodes.map_batches(indeg_emit, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("d_p", alias_name="col"))
    )

    def round_emit(b: pa.Table) -> pa.Table:
        v = np.asarray(b["v"], dtype=np.int64)
        col = np.asarray(b["col"], dtype=np.int64).view(np.uint64)
        h = splitmix64(col)
        m = len(v)
        dst = np.concatenate([_dsts(v), v])
        lo32 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        hi32 = (h >> np.uint64(32)).astype(np.int64)
        z = np.zeros(m, np.int64)
        t = pa.table(
            {
                "v": pa.array(dst),
                "lo_p": pa.array(np.concatenate([lo32] * WL_OUT_DEG + [z])),
                "hi_p": pa.array(np.concatenate([hi32] * WL_OUT_DEG + [z])),
                "own_p": pa.array(np.concatenate([z] * WL_OUT_DEG + [col.view(np.int64)])),
            }
        )
        return (
            t.group_by("v")
            .aggregate([("lo_p", "sum"), ("hi_p", "sum"), ("own_p", "sum")])
            .rename_columns(["v", "lo_p", "hi_p", "own_p"])
        )

    def combine(b: pa.Table) -> pa.Table:
        s = (np.asarray(b["hi"], dtype=np.int64).view(np.uint64) << np.uint64(32)) + np.asarray(
            b["lo"], dtype=np.int64
        ).view(np.uint64)
        own = np.asarray(b["own"], dtype=np.int64).view(np.uint64)
        nxt = splitmix64(splitmix64(own) ^ s)
        return pa.table({"v": b["v"], "col": pa.array(nxt.view(np.int64))})

    for _ in range(WL_ROUNDS):
        colors = (
            colors.map_batches(round_emit, batch_format="pyarrow")
            .groupby("v")
            .aggregate(
                Sum("lo_p", alias_name="lo"),
                Sum("hi_p", alias_name="hi"),
                Sum("own_p", alias_name="own"),
            )
            .map_batches(combine, batch_format="pyarrow")
        )

    def cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"wl_color": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())}
            )
        u, cnt = np.unique(np.asarray(b["col"], dtype=np.int64), return_counts=True)
        return pa.table({"wl_color": pa.array(u), "n_p": pa.array(cnt.astype(np.int64))})

    hist = (
        colors.map_batches(cells, batch_format="pyarrow")
        .groupby("wl_color")
        .aggregate(Sum("n_p", alias_name="n_nodes"))
    )
    return pa.Table.from_pandas(hist.to_pandas(), preserve_index=False)


def docs_search_bm25(sf_dir: str):
    """BM25 top-10 retrieval (k1=6/5, b=3/4) in EXACT integer arithmetic:
    with avgdl = T/N folded through, the saturation term becomes
    44·tf·T / (20·tf·T + 6·T + 18·dl·N) — a pure integer rational, quantized
    ×1000 with floor division exactly like the tf-idf sibling
    (``docs_search_top10``), so the score replays bit-exact in SQL (a float
    ln-idf would not; idf is the same ×1000 integer surrogate).  Shape: one
    tiny stats pass (N, T, per-term df — broadcast), then a SHUFFLE-FREE
    scoring pass (a document is whole within its row, so tf/dl never cross
    batches) into the partial-top-k merge."""
    from ..stages.topk import topk_rows
    from ..stages.vocab import tokenize_batch

    terms = ("merge", "scan", "window")
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def stats_partial(b: pa.Table) -> pa.Table:
        toks = tokenize_batch(b["text"], lower=True)
        rows = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        n_docs = b.num_rows
        t_tokens = len(flat)
        dfs = []
        for term in terms:
            hit_rows = np.unique(rows[flat == term])
            dfs.append(len(hit_rows))
        return pa.table(
            {
                "n_p": pa.array([n_docs], pa.int64()),
                "t_p": pa.array([t_tokens], pa.int64()),
                **{f"df{i}_p": pa.array([d], pa.int64()) for i, d in enumerate(dfs)},
            }
        )

    agg = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .sum(["n_p", "t_p"] + [f"df{i}_p" for i in range(len(terms))])
    )
    N, T = int(agg["sum(n_p)"]), int(agg["sum(t_p)"])
    DF = [int(agg[f"sum(df{i}_p)"]) for i in range(len(terms))]

    def score(b: pa.Table) -> pa.Table:
        toks = tokenize_batch(b["text"], lower=True)
        rows = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        n = b.num_rows
        dl = np.bincount(rows, minlength=n).astype(np.int64)
        total = np.zeros(n, dtype=np.int64)
        for i, term in enumerate(terms):
            if DF[i] == 0:
                continue
            tf = np.bincount(rows[flat == term], minlength=n).astype(np.int64)
            tf_max = int(tf.max(initial=0))
            dl_max = int(dl.max(initial=0))
            # DuckDB raises on BIGINT overflow; silent int64 wrap here would
            # instead produce garbage scores — match the oracle's loud failure
            # (house convention: RAISE, never wrap). Both the numerator AND
            # the denominator terms are checked in Python ints (the
            # denominator 18*dl*N can wrap even when the numerator is safe,
            # e.g. tf=1 with dl*N ~ 5e17).
            if tf_max and (
                44 * tf_max * T * 1000 >= 2**63
                or 20 * tf_max * T + 6 * T + 18 * dl_max * N >= 2**63
            ):
                raise ValueError("BM25 integer scale overflow: tf/dl*T/N too large")
            idf_q = N * 1000 // DF[i]
            sat_q = np.zeros(n, dtype=np.int64)
            hit = tf > 0
            sat_q[hit] = (44 * tf[hit] * T * 1000) // (
                20 * tf[hit] * T + 6 * T + 18 * dl[hit] * N
            )
            total += idf_q * sat_q
        keep = total > 0
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(b["doc_id"], dtype=np.int64)[keep]),
                "score": pa.array(total[keep], pa.int64()),
            }
        )

    return topk_rows(
        ds.map_batches(score, batch_format="pyarrow"), ["score", "doc_id"], [True, False], 10
    )


def sources_lexical_diversity(sf_dir: str):
    """Per-source lexical concentration — Simpson index
    ``Σ n_w(n_w−1) / (n(n−1))`` over the source's token distribution (the
    repetitiveness signal corpus quality filters use; entropy needs a
    transcendental log and can't hash-match SQL, Simpson is an exact integer
    rational quantized ×1e6 with floor division).  Shape: per-batch
    (source, token) count contraction → ONE cell-sized groupby → per-source
    integer moments (Σ n_w², Σ n_w, distinct) via a second tiny groupby —
    shuffle ∝ distinct (source, token) cells, never tokens."""
    ds = _t(sf_dir, "documents", ["source", "text"])

    def cell_partial(b: pa.Table) -> pa.Table:
        from ..stages.vocab import tokenize_batch

        toks = tokenize_batch(b["text"], lower=True)
        rows = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        src = b["source"].to_numpy(zero_copy_only=False)[rows]
        key = np.char.add(np.char.add(src.astype(str), "\x1f"), flat.astype(str))
        uniq, counts = np.unique(key, return_counts=True)
        sp = np.char.partition(uniq, "\x1f")
        return pa.table(
            {
                "source": pa.array(sp[:, 0], pa.string()),
                "token": pa.array(sp[:, 2], pa.string()),
                "n_partial": pa.array(counts.astype(np.int64)),
            }
        )

    cells = (
        ds.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("n_partial", alias_name="n_w"))
    )

    def moment_partial(b: pa.Table) -> pa.Table:
        n_w = np.asarray(b["n_w"], dtype=np.int64)
        t = pa.table(
            {
                "source": b["source"],
                "n": b["n_w"],
                "pairs": pa.array(n_w * (n_w - 1), pa.int64()),
            }
        )
        g = t.group_by("source").aggregate(
            [("n", "sum"), ("pairs", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["source", "n_p", "pairs_p", "d_p"])

    out = (
        cells.map_batches(moment_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_p", alias_name="n_tokens"),
            Sum("pairs_p", alias_name="pairs"),
            Sum("d_p", alias_name="distinct_tokens"),
        )
        .to_pandas()
    )
    n = out["n_tokens"].to_numpy().astype(np.int64)
    pairs = out.pop("pairs").to_numpy().astype(np.int64)
    if len(pairs) and int(pairs.max()) >= 2**63 // 1_000_000:
        # DuckDB widens to HUGEINT; int64 here would wrap silently — RAISE
        raise ValueError("simpson_q integer scale overflow: source too large")
    if len(n) and int(n.max()) * (int(n.max()) - 1) >= 2**63:
        # The denominator n*(n-1) wraps in np.int64 once a source exceeds
        # ~3.04e9 tokens even when `pairs` is small (diverse sources) —
        # DuckDB would raise on the BIGINT product; so do we.
        raise ValueError("simpson_q denominator overflow: n*(n-1) exceeds int64")
    out["simpson_q"] = pairs * 1_000_000 // np.maximum(n * (n - 1), 1)
    return pa.Table.from_pandas(
        out[["source", "n_tokens", "distinct_tokens", "simpson_q"]], preserve_index=False
    )


def events_top3_values_dense(sf_dir: str):
    """DENSE_RANK ≤ 3 per type — the ties-aware top-k the row-wise top-3
    query (``events_top3_per_type``) deliberately isn't: the top three
    DISTINCT cent values, each with its full row count.  Distinct-value
    ranking pre-aggregates perfectly (unlike row ranks): per-batch
    (type, cell) contraction → one groupby whose volume is distinct cells
    (row-count free, the quantiles-suite precedent) → a bounded per-type
    head-3."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"event_type": b["event_type"], "cell": _cents(b["value"])})
        g = t.group_by(["event_type", "cell"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "cell", "n_partial"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cell"])
        .aggregate(Sum("n_partial", alias_name="n"))
        .to_pandas()  # ≤ types × distinct cents rows — row-count free
    )
    out = []
    for t, sub in cells.groupby("event_type", sort=True):
        top = sub.sort_values("cell", ascending=False).head(3).reset_index(drop=True)
        top["rk"] = np.arange(1, len(top) + 1, dtype=np.int64)
        out.append(top)
    import pandas as pd

    res = pd.concat(out, ignore_index=True)
    res["value"] = res.pop("cell").astype(np.float64) / 100.0
    return pa.Table.from_pandas(
        res[["event_type", "value", "n", "rk"]], preserve_index=False
    )


def docs_sample_hash(sf_dir: str):
    """Deterministic ~10% corpus sample (Lehmer hash filter — reproducible
    under Ray task retry, shuffle-free; see ``stages.sampling``)."""
    from ..stages.sampling import hash_sample

    ds = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return hash_sample(ds, "doc_id", keep_mod=10, keep_residue=3)


def docs_sample_stratified(sf_dir: str):
    """Per-source deterministic reservoir: the 5 smallest-hash docs of each
    stratum (per-batch partial top-k, then a per-stratum merge — shuffle
    bounded by k × strata × blocks)."""
    from ..stages.sampling import stratified_sample

    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    return stratified_sample(ds, "doc_id", "source", k=5)


def docs_vocab_top50(sf_dir: str):
    """Corpus vocabulary: map-side-combined wordcount + partial top-k merge
    (never a full sort; ties break on token)."""
    from ..stages.topk import topk_rows
    from ..stages.vocab import token_counts

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return topk_rows(token_counts(ds, "text"), ["n", "token"], [True, False], 50)


def docs_top_terms(sf_dir: str):
    """Per-doc top-3 terms by (tf DESC, df ASC, token) — integer-exact
    tf-idf-style keyword extraction with a broadcast df table."""
    from ..stages.vocab import top_terms_per_doc

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return top_terms_per_doc(ds, k=3)


def docs_inverted_index(sf_dir: str):
    """token → (df, sorted posting list) via map-side pair dedup + one
    groupby(token) assembly."""
    from ..stages.vocab import inverted_index

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return inverted_index(ds)


# ── round-3 batch 2: semi-join / promo share / scrub / quantile gate /
# split assignment / multi-way join / HLL sketch ─────────────────────────────


def q4_order_priority(sf_dir: str):
    """EXISTS semi-join (TPC-H Q4 shape): orders with at least one RETURNED
    lineitem, counted per priority.  The lineitem side contracts map-side to
    distinct order keys, then the same broadcast-set / partitioned-join
    duality as ``customers_without_orders`` (keys ≤ limit → ``pc.is_in``, no
    shuffle; above → inner join on the distinct-key table)."""
    import ray

    from ..stages.clustering import clamped_partitions

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    rkeys = li.map_batches(
        lambda b: pa.table(
            {"l_orderkey": pc.unique(b.filter(pc.equal(b["l_returnflag"], "R"))["l_orderkey"])}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_keys = rkeys.count()
    if n_keys <= _SEMI_BROADCAST_LIMIT:
        keys = pa.array(sorted(set(rkeys.to_pandas()["l_orderkey"])), pa.int64())
        keys_ref = ray.put(keys)

        def semi(b: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            return b.filter(pc.is_in(b["o_orderkey"], value_set=ks)).select(["o_orderpriority"])

        src = orders.map_batches(semi, batch_format="pyarrow")
    else:
        marks = rkeys.groupby("l_orderkey").aggregate(Count(alias_name="n_marks"))
        np_ = clamped_partitions(n_keys, 16)
        src = orders.join(
            marks, join_type="inner", num_partitions=np_, on=("o_orderkey",), right_on=("l_orderkey",)
        ).select_columns(["o_orderpriority"])
    out = src.groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def q14_promo_share(sf_dir: str):
    """Conditional aggregate over a broadcast dimension join (TPC-H Q14
    shape): share of discounted revenue from PROMO-type parts.  The part
    table ships once as a promo-key set (``ray.put``); each lineitem batch
    computes exact integer c4 revenue partials (promo, total) — only two
    int64 cells per batch reach the driver; the final ratio is one scalar
    division replayed identically in the oracle SQL."""
    import ray

    part = _t(sf_dir, "part", ["p_partkey", "p_type"])
    ptbl = pa.Table.from_pandas(part.to_pandas(), preserve_index=False)
    promo = ptbl.filter(pc.equal(ptbl["p_type"], "PROMO"))["p_partkey"]
    promo_ref = ray.put(pc.cast(promo, pa.int64()).combine_chunks())

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
        )
        is_promo = pc.is_in(b["l_partkey"], value_set=ray.get(promo_ref))
        promo_c4 = pc.sum(pc.if_else(is_promo, rev, pa.scalar(0, pa.int64()))).as_py() or 0
        total_c4 = pc.sum(rev).as_py() or 0
        return pa.table(
            {"promo_c4": pa.array([promo_c4], pa.int64()), "total_c4": pa.array([total_c4], pa.int64())}
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("promo_c4", alias_name="p"), Sum("total_c4", alias_name="t"))
    )
    p_c4, t_c4 = int(agg["p"]), int(agg["t"])
    # both sides: double((100.0 * p) / t), then the scale-round idiom at 4 dp
    share = (100.0 * float(p_c4)) / float(t_c4)
    share4 = float(int(share * 10000.0 + 0.5)) / 10000.0
    return pa.table(
        {
            "promo_share": pa.array([share4], pa.float64()),
            "promo_revenue": pa.array([float(p_c4) / 10000.0], pa.float64()),
            "total_revenue": pa.array([float(t_c4) / 10000.0], pa.float64()),
        }
    )


def docs_regex_scrub(sf_dir: str):
    """Regex scrub/mask (the PII-redaction operator shape: in production the
    pattern is emails/phones; this corpus has no digits, so the masked class
    is a token set).  Both engine (pyarrow RE2) and oracle (DuckDB RE2) run
    the same pattern, per-batch, fully vectorized."""
    pat = r"\b(key|hash|index)\b"
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "scrubbed": pc.cast(
                    pc.replace_substring_regex(b["text"], pattern=pat, replacement="<MASK>"),
                    pa.string(),
                ),
                "n_masked": pc.cast(pc.count_substring_regex(b["text"], pattern=pat), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def events_p95_filter(sf_dir: str):
    """Quantile-gated filter (the quality-gate composition): global exact p95
    of ``value`` via the shuffle-free cent-histogram (pass 1), broadcast the
    single threshold cell, then filter + per-type exact aggregate (pass 2).
    Neither pass sorts; the threshold is one scalar, never a shuffle."""
    from ..stages.quantiles import grouped_exact_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])
    const = ds.map_batches(
        lambda b: pa.table(
            {"g": pa.array(np.zeros(b.num_rows, dtype=np.int64)), "value": b["value"]}
        ),
        batch_format="pyarrow",
    )
    q = grouped_exact_quantiles(const, "g", "value", [0.95], scale=100.0)
    p95_cents = int(round(float(q["p95"][0].as_py()) * 100.0))

    def flt(b: pa.Table) -> pa.Table:
        cents = _cents(b["value"])
        keep = pc.greater(cents, pa.scalar(p95_cents, pa.int64()))
        return pa.table({"event_type": b["event_type"], "cents": cents}).filter(keep)

    out = (
        ds.map_batches(flt, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="c"))
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "event_type": tbl["event_type"],
            "n": tbl["n"],
            "total_value": pc.divide(pc.cast(tbl["c"], pa.float64()), pa.scalar(100.0)),
        }
    )


def docs_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment (8/1/1 by Lehmer hash of the
    key — the canonical reproducible corpus split: stable under retries,
    shuffle-free, replayable in SQL).  Returns per-(source, split) counts +
    exact char totals so the whole assignment is value-checked."""
    ds = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def assign(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        h = (ids % 2147483647) * 48271 % 2147483647
        r = h % 10
        split = np.where(r < 8, "train", np.where(r == 8, "val", "test"))
        return pa.table(
            {
                "source": b["source"],
                "split": pa.array(split.astype(object)),
                "n_chars": b["n_chars"],
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["source", "split"])
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="sum_chars"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def docs_split_leakage_safe(sf_dir: str):
    """Leakage-safe train/val/test split: near-duplicate documents must land
    in the SAME split, or held-out eval text leaks into training via its
    near-copies (the intra-corpus contamination failure the GPT-3/PaLM
    decontamination papers fix across corpora).  Pipeline: verified near-dup
    closure (window candidate pairs → 3-gram Jaccard ≥ 0.5 →
    min-label connected components, all distributed) assigns every doc a
    cluster id; the split is then the Lehmer hash of the CLUSTER id — not
    the doc id — so whole clusters move together and no verified pair can
    ever straddle splits (asserted directly in
    ``tests/test_leakage_split.py``).  Shuffle cost beyond the closure is
    two label-sized exchanges; per-split counts, distinct-cluster counts and
    an id checksum value-check the full assignment."""
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    verified = ngram_jaccard_verify(_window_pair_table(ds, 5), ds, threshold=0.5)
    labels = _verified_cluster_labels(ds, verified)

    def assign(b: pa.Table) -> pa.Table:
        doc = np.asarray(b["doc_id"], dtype=np.int64)
        lab = np.asarray(b["cluster_id"], dtype=np.int64)
        r = (lab % 2147483647) * 48271 % 2147483647 % 10
        split = np.where(r < 8, "train", np.where(r == 8, "val", "test"))
        return pa.table(
            {
                "split": pa.array(split.astype(object), pa.string()),
                "cluster_id": pa.array(lab, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
            }
        )

    per_cluster = (
        labels.map_batches(assign, batch_format="pyarrow")
        .groupby(["split", "cluster_id"])
        .aggregate(Count(alias_name="n_docs_c"), Sum("doc_id", alias_name="sum_id_c"))
    )
    out = per_cluster.groupby("split").aggregate(
        Count(alias_name="n_clusters"),
        Sum("n_docs_c", alias_name="n_docs"),
        Sum("sum_id_c", alias_name="sum_doc_id"),
    )
    return pa.Table.from_pandas(
        out.to_pandas()[["split", "n_docs", "n_clusters", "sum_doc_id"]], preserve_index=False
    )


def nation_order_revenue(sf_dir: str):
    """Multi-way dimension join (orders ⋈ customer ⋈ nation) without
    shuffling the fact table: the two dimension maps broadcast once
    (``ray.put``); each orders batch resolves custkey → nationkey → one
    bincount partial per nation — only ≤ n_nations rows per batch enter the
    exchange.  Above the broadcast limit the engine's partitioned-join path
    applies (same duality as q3/q4; customer is dimension-sized here)."""
    import ray

    nat = pa.Table.from_pandas(_t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas(), preserve_index=False)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ctbl = pa.Table.from_pandas(cust.to_pandas(), preserve_index=False)
    order_ck = np.argsort(np.asarray(ctbl["c_custkey"], dtype=np.int64))
    ckeys = np.asarray(ctbl["c_custkey"], dtype=np.int64)[order_ck]
    cnat = np.asarray(ctbl["c_nationkey"], dtype=np.int64)[order_ck]
    lut_ref = ray.put((ckeys, cnat))
    n_nations = nat.num_rows

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        ck, cn = ray.get(lut_ref)
        oc = np.asarray(b["o_custkey"], dtype=np.int64)
        pos = np.searchsorted(ck, oc)
        pos = np.clip(pos, 0, len(ck) - 1)
        valid = ck[pos] == oc  # orders with no customer row drop (inner join)
        nk = cn[pos[valid]]
        cents = np.asarray(_cents(b["o_totalprice"]), dtype=np.int64)[valid]
        from ..functions.numeric import group_sums_int64

        n = np.bincount(nk, minlength=n_nations)
        (s,) = group_sums_int64(nk, n_nations, cents)  # exact int64, no float53 weights
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "n_nationkey": pa.array(nz.astype(np.int64)),
                "n_partial": pa.array(n[nz].astype(np.int64)),
                "c_partial": pa.array(s[nz]),
            }
        )

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("n_partial", alias_name="n_orders"), Sum("c_partial", alias_name="c"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    name_idx = pc.index_in(tbl["n_nationkey"], value_set=pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks())
    return pa.table(
        {
            "n_name": pc.take(nat["n_name"].combine_chunks(), name_idx),
            "n_orders": tbl["n_orders"],
            "total_revenue": pc.divide(pc.cast(tbl["c"], pa.float64()), pa.scalar(100.0)),
        }
    )


def events_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate per-type distinct users (p=12 → ~1.6% error,
    fixed 4 KiB of registers per group no matter the row count — the sketch
    the exact pair-dedup path can't match at 100 TB; see
    ``stages.sketches``).  Oracled: the sketch is deterministic arithmetic,
    replayed bit-exact in DuckDB HUGEINT SQL (``_build_hll_oracle``)."""
    from ..stages.sketches import hll_distinct

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    return hll_distinct(ds, "event_type", "user_id", p=12)


def events_cms_user_counts(sf_dir: str):
    """Count-Min point-count estimates (depth 4 × width 2048) for a fixed
    probe set of user ids — the counter-merge dual of the HLL sketch: when
    even the distinct-key set is too large to shuffle, per-batch counter
    grids merge with one ``groupby(r, idx).sum`` bounded by depth × width
    rows, row-count AND key-cardinality free.  Deterministic splitmix64 over
    fixed public seeds, replayed bit-exact in DuckDB HUGEINT SQL
    (``_build_cms_oracle``); estimates are ≥ true counts by construction
    (overestimate-only property forced + asserted in
    ``tests/test_cms.py``)."""
    from ..stages.sketches import cms_counts

    ds = _t(sf_dir, "events", ["user_id"])
    return cms_counts(ds, "user_id", probe_keys=list(range(20)), depth=4, width=2048)


def events_salted_type_join(sf_dir: str):
    """Skew-safe SALTED partitioned join (``stages.joins.salted_join``):
    events join a per-type weight dimension on ``event_type`` — a handful of
    distinct values carrying millions of rows each, the worst-case hot-key
    shape where a plain hash join puts an entire type in ONE partition.  The
    big side takes a deterministic ``splitmix64(event_id) % n_salts`` salt,
    the dimension replicates once per salt, and the join runs on
    (type, salt), spreading each hot key over n_salts partitions; the result
    multiset is identical to the unsalted join (parity-tested), so the
    oracle is the plain SQL join.  Post-join the per-user aggregate
    contracts map-side before one user-keyed exchange."""
    import ray

    from ..stages.clustering import clamped_partitions
    from ..stages.joins import salted_join

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    tdf = (
        ds.groupby("event_type").aggregate(Count(alias_name="_n")).to_pandas()
    )  # type-cardinality rows — dimension-sized by construction
    dim = rd.from_arrow(
        pa.table(
            {
                "t_type": pa.array(tdf["event_type"], pa.string()),
                "weight": pa.array([len(t) for t in tdf["event_type"]], pa.int64()),
            }
        )
    )
    n_parts = clamped_partitions(ds.count(), max(8, int(ray.cluster_resources().get("CPU", 8))))
    joined = salted_join(
        ds, dim, on="event_type", right_on="t_type", salt_from="event_id",
        n_salts=8, num_partitions=n_parts,
    )

    def partial(b: pa.Table) -> pa.Table:
        w = pa.table(
            {
                "user_id": b["user_id"],
                "wc": pc.multiply(_cents(b["value"]), pc.cast(b["weight"], pa.int64())),
            }
        )
        g = w.group_by("user_id").aggregate([("wc", "sum"), ([], "count_all")])
        return g.rename_columns(["user_id", "wc_partial", "n_partial"])

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_partial", alias_name="n_events"), Sum("wc_partial", alias_name="wc"))
        .to_pandas()
    )
    out["weighted_value"] = out.pop("wc").astype(np.float64) / 100.0
    return pa.Table.from_pandas(out[["user_id", "n_events", "weighted_value"]], preserve_index=False)


def events_interval_join_windows(sf_dir: str):
    """Partitioned INTERVAL-OVERLAP join (``stages.joins.interval_join``):
    events matched to 180 deterministic maintenance windows (start =
    2024-01-01 + i·233 min, duration = 45 + (67·i mod 300) min — overlapping,
    hour-boundary-crossing) by ``start <= ts < end``.  The inequality join a
    hash join can't express runs as: intervals exploded to covered hour
    buckets (vectorized range expansion), events keyed by hour, ONE
    bucket-equi-join, exact range post-filter — each pair meets exactly once,
    both sides shuffle, neither broadcasts.  Per-window aggregate contracts
    map-side before the final window-keyed exchange."""
    import ray

    from ..stages.clustering import clamped_partitions
    from ..stages.joins import interval_join

    ds = _t(sf_dir, "events", ["ts", "value"])
    i = np.arange(180, dtype=np.int64)
    anchor = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ws = anchor + i * 233 * 60_000_000
    we = ws + (45 + (67 * i) % 300) * 60_000_000
    intervals = rd.from_arrow(
        pa.table(
            {
                "window_id": pa.array(i, pa.int64()),
                "ws": pa.array(ws, pa.int64()),
                "we": pa.array(we, pa.int64()),
            }
        )
    )
    n_parts = clamped_partitions(ds.count(), max(8, int(ray.cluster_resources().get("CPU", 8))))
    joined = interval_join(ds, intervals, "ts", "ws", "we", num_partitions=n_parts)

    def partial(b: pa.Table) -> pa.Table:
        w = pa.table({"window_id": b["window_id"], "cents": _cents(b["value"])})
        g = w.group_by("window_id").aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["window_id", "c_partial", "n_partial"])

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("window_id")
        .aggregate(Sum("n_partial", alias_name="n_events"), Sum("c_partial", alias_name="c"))
        .to_pandas()
    )
    out["total_value"] = out.pop("c").astype(np.float64) / 100.0
    return pa.Table.from_pandas(out[["window_id", "n_events", "total_value"]], preserve_index=False)


def events_sliding_distinct_users(sf_dir: str):
    """3-hour sliding-window APPROXIMATE distinct users per active hour —
    the sketch × window composition: a sliding ``COUNT(DISTINCT)`` cannot
    pre-aggregate (distinct is not summable across window panes), but HLL
    registers ARE mergeable by element-wise max, so per-hour registers
    (ONE shuffle bounded by hours × 2^p rows — row-count and cardinality
    free) max-merge across each hour's 3-hour window on the driver.  p=8
    (256 registers/hour).  The register arithmetic replays bit-exact in
    DuckDB HUGEINT (``_build_hll_sliding_oracle``) including the
    linear-counting branch."""
    from ..stages.sketches import _estimate, _register_partials

    p = 8
    hour_us = 3_600_000_000
    ds = _t(sf_dir, "events", ["ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        hrs = (np.asarray(b["ts"].cast(pa.int64()), dtype=np.int64) // hour_us) * hour_us
        tbl = pa.table({"hour": pa.array(hrs, pa.int64()), "user_id": b["user_id"]})
        return _register_partials(tbl, "hour", "user_id", p)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["hour", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    m = 1 << p
    hours = np.sort(merged["hour"].unique())
    out_h, out_n = [], []
    for wh in hours:
        in_win = merged[(merged["hour"] >= wh - 2 * hour_us) & (merged["hour"] <= wh)]
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, in_win["reg"].to_numpy(), in_win["rho"].to_numpy())
        out_h.append(int(wh))
        out_n.append(int(round(_estimate(regs, p))))
    return pa.table(
        {
            "hour": pa.array(np.array(out_h, dtype="datetime64[us]")),
            "approx_distinct": pa.array(out_n, pa.int64()),
        }
    )


def events_value_cume_dist(sf_dir: str):
    """Per-row ``cume_dist`` within each event type WITHOUT the global sort
    the window function implies: the cent-histogram of values per type is
    merged once (shuffle ∝ types × distinct cells, row-count free), its
    cumulative counts broadcast, and every event row gets its rank by a
    vectorized ``searchsorted`` lookup — the all-to-all ORDER BY becomes a
    broadcast + map."""
    import ray

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.asarray(_cents(b["value"]), dtype=np.int64)
        types = b["event_type"].to_numpy(zero_copy_only=False)
        out_t, out_c, out_n = [], [], []
        for t in np.unique(types):
            gc = cents[types == t]
            uniq, cnt = np.unique(gc, return_counts=True)
            out_t.append(np.full(len(uniq), t, dtype=object))
            out_c.append(uniq)
            out_n.append(cnt.astype(np.int64))
        return pa.table(
            {
                "event_type": pa.array(np.concatenate(out_t) if out_t else [], pa.string()),
                "cell": pa.array(np.concatenate(out_c) if out_c else [], pa.int64()),
                "n_partial": pa.array(np.concatenate(out_n) if out_n else [], pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cell"])
        .aggregate(Sum("n_partial", alias_name="n"))
        .to_pandas()
    )
    lut = {}
    for t, sub in hist.groupby("event_type", sort=False):
        cells = sub["cell"].to_numpy()
        order = np.argsort(cells, kind="stable")
        cells = cells[order]
        cum = np.cumsum(sub["n"].to_numpy()[order]).astype(np.int64)
        lut[t] = (cells, cum, int(cum[-1]))
    lut_ref = ray.put(lut)

    def assign(b: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref)
        cents = np.asarray(_cents(b["value"]), dtype=np.int64)
        types = b["event_type"].to_numpy(zero_copy_only=False)
        out = np.empty(len(cents), dtype=np.float64)
        for t in np.unique(types):
            m = types == t
            cells, cum, total = lu[t]
            pos = np.searchsorted(cells, cents[m])  # exact hit guaranteed
            out[m] = cum[pos].astype(np.float64) / float(total)
        return pa.table(
            {"event_id": b["event_id"], "event_type": b["event_type"], "cume": pa.array(out)}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def users_click_no_purchase(sf_dir: str):
    """Distinct-set EXCEPT: users who clicked but never made a purchase over
    $200 (every user has *some* purchase in the synth data, so the value gate
    is what makes the anti-join non-trivial).  Both sides contract map-side to
    distinct keys; the (smaller) high-value-purchase set broadcasts below the
    limit, else the partitioned left-outer anti-join — the same duality as
    ``customers_without_orders``."""
    import ray

    from ..stages.clustering import clamped_partitions

    ds = _t(sf_dir, "events", ["event_type", "user_id", "value"])

    def distinct_of(etype: str, min_value: float | None = None):
        def pick(b: pa.Table, et=etype, mv=min_value) -> pa.Table:
            mask = pc.equal(b["event_type"], et)
            if mv is not None:
                mask = pc.and_(mask, pc.greater(b["value"], mv))
            return pa.table({"user_id": pc.unique(b.filter(mask)["user_id"])})

        return (
            ds.map_batches(pick, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Count(alias_name="n_dup"))
        )

    clicks = distinct_of("click").materialize()
    buys = distinct_of("purchase", min_value=200.0).materialize()
    n_buy = buys.count()
    if n_buy <= _ANTI_BROADCAST_LIMIT:
        keys = pa.array(sorted(buys.to_pandas()["user_id"]), pa.int64())
        keys_ref = ray.put(keys)
        out = clicks.map_batches(
            lambda b: pa.table(
                {
                    "user_id": b.filter(
                        pc.invert(pc.is_in(b["user_id"], value_set=ray.get(keys_ref)))
                    )["user_id"]
                }
            ),
            batch_format="pyarrow",
        )
    else:
        np_ = clamped_partitions(n_buy, 16)
        marks = buys.map_batches(
            lambda b: pa.table(
                {"buy_uid": b["user_id"], "has_buy": pa.array([True] * b.num_rows)}
            ),
            batch_format="pyarrow",
        )
        out = clicks.join(
            marks, join_type="left_outer", num_partitions=np_, on=("user_id",), right_on=("buy_uid",)
        ).map_batches(
            lambda b: pa.table({"user_id": b.filter(pc.is_null(b["has_buy"]))["user_id"]}),
            batch_format="pyarrow",
        )
    df = out.to_pandas()
    if df.empty:
        return pa.table({"user_id": pa.array([], pa.int64())})
    return pa.table({"user_id": pa.array(sorted(df["user_id"]), pa.int64())})


def docs_decontaminate(sf_dir: str):
    """Benchmark n-gram decontamination: flag training docs (doc_id % 13 ≠ 0)
    sharing any token 5-gram with the held-out set (doc_id % 13 = 0).  The
    benchmark gram-hash set broadcasts once; every training batch probes it
    map-side — the 100-TB side never shuffles (see ``stages.contamination``)."""
    from ..stages.contamination import decontaminate

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return decontaminate(ds, n=5, bench_mod=13)


def docs_dup_spans(sf_dir: str):
    """Per-doc duplicated-5-gram stats (Lee-et-al dup-span signal): distinct
    (gram, doc) pairs built map-side, one groupby(gram_hash) finds grams in
    ≥ 2 docs, the (small) duplicated set broadcasts back.  ``dup_frac`` is a
    same-integer division — bit-exact vs the oracle."""
    from ..stages.contamination import dup_span_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return dup_span_stats(ds, n=5)


def docs_rarity(sf_dir: str):
    """Mean inverse token frequency per doc — a CCNet-style rarity / quality
    proxy kept integer-exact (floor-div reciprocals, same-int f64 division)
    so the oracle matches bitwise where a float log-surprisal could not
    (numpy vs DuckDB libm differ by ulps on ~15% of rationals; measured)."""
    from ..stages.vocab import rarity_scores

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return rarity_scores(ds)


def docs_search_top10(sf_dir: str):
    """Integer tf-idf retrieval: top-10 docs for a 3-term query.  One tiny
    df/doc-count stats pass (a few int rows per batch reach the driver),
    idf broadcast in the scoring closure, partial top-k merge — never a
    global sort (see ``stages.vocab.tfidf_search``)."""
    from ..stages.vocab import tfidf_search

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_search(ds, "merge window scan", k=10)


def docs_search_rrf(sf_dir: str):
    """Reciprocal-rank fusion of the two retrieval rankings (tf-idf
    `docs_search_top10` + BM25 `docs_search_bm25`, same 3-term query) — the
    standard hybrid-search combiner (k = 60): fused = Σ 1/(k + rank) over
    the lists a document appears in, scaled ×10⁹ with integer floor division
    so the score replays exactly (ranks ≤ 10 make 10⁹//(60+r) collision-free
    across distinct rank sets).  Ranks are recomputed from each ranking
    under the explicit total order (score DESC, doc_id) — never positional
    trust in block order — and a document absent from one list contributes 0
    from it (rank reported as 0).  Scale shape: both underlying rankings are
    the existing stats-pass + shuffle-free-scoring + partial-top-k
    pipelines; the fusion itself touches ≤ k+k driver rows by construction.
    Oracle: both ranking CTEs composed verbatim + row_number + FULL OUTER
    JOIN — generated from the registered oracle strings so the three
    queries can never drift apart."""
    a = docs_search_top10(sf_dir).to_pandas()
    b = docs_search_bm25(sf_dir).to_pandas()
    K = 60

    def ranks(df) -> dict[int, int]:
        df = df.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
        return {int(d): i + 1 for i, d in enumerate(df["doc_id"])}

    ra, rb = ranks(a), ranks(b)
    fused = sorted(
        (
            (
                d,
                (10**9 // (K + ra[d]) if d in ra else 0)
                + (10**9 // (K + rb[d]) if d in rb else 0),
                ra.get(d, 0),
                rb.get(d, 0),
            )
            for d in set(ra) | set(rb)
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    return pa.table(
        {
            "doc_id": pa.array([t[0] for t in fused], pa.int64()),
            "rrf_scaled": pa.array([t[1] for t in fused], pa.int64()),
            "rank_tfidf": pa.array([t[2] for t in fused], pa.int64()),
            "rank_bm25": pa.array([t[3] for t in fused], pa.int64()),
        }
    )


def docs_budget_mix(sf_dir: str):
    """Per-source token-quota mixture sampler: keep each source's docs in
    doc_id order while the source's running token total stays ≤ 1500 — the
    deterministic "mix N tokens per source" step of a training-data build.
    One sort range-shuffle + a two-phase grouped prefix scan (driver sees
    per-block per-group scalars only; see ``stages.scan.grouped_prefix_scan``)."""
    from ..stages.scan import budget_mix

    ds = _t(sf_dir, "documents", ["doc_id", "source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b["text"])))
        return pa.table(
            {"doc_id": b["doc_id"], "source": b["source"], "n_toks": pc.cast(n, pa.int64())}
        )

    return budget_mix(
        ds.map_batches(prep, batch_format="pyarrow"),
        "source",
        ["doc_id"],
        "n_toks",
        budget=1500,
        out_col="cum_toks",
    )


def docs_top_bigrams(sf_dir: str):
    """Corpus top-20 adjacent token pairs (collocations / first BPE merges):
    map-side-combined bigram counts + partial top-k merge, never a full sort."""
    from ..stages.topk import topk_rows
    from ..stages.vocab import bigram_counts

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return topk_rows(bigram_counts(ds, "text"), ["n", "bigram"], [True, False], 20)


def customers_name_neighbors(sf_dir: str):
    """Sorted-neighborhood blocking (Hernández–Stolfo) + vectorized exact
    Levenshtein verify: customers whose names are ≤ 2 edits apart among their
    2 nearest sort neighbors.  One sort range-shuffle; boundary pairs are
    stitched across blocks with O(n_blocks·window) driver traffic (see
    ``stages.blocking.sorted_neighborhood_pairs``); the edit-distance DP is
    vectorized across pairs and integer-exact vs DuckDB ``levenshtein``."""
    from ..functions.strings import levenshtein_pairs, pad_codes
    from ..stages.blocking import sorted_neighborhood_pairs

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    pairs = sorted_neighborhood_pairs(cust, ["c_name", "c_custkey"], window=2)

    def verify(b: pa.Table) -> pa.Table:
        am, la = pad_codes(b["a_c_name"])
        bm, lb = pad_codes(b["b_c_name"])
        dist = levenshtein_pairs(am, la, bm, lb)
        out = pa.table(
            {
                "a_custkey": b["a_c_custkey"],
                "b_custkey": b["b_c_custkey"],
                "dist": pa.array(dist),
            }
        )
        return out.filter(pc.less_equal(out["dist"], pa.scalar(2, pa.int64())))

    return pairs.map_batches(verify, batch_format="pyarrow")


def events_funnel(sf_dir: str):
    """Ordered-sequence funnel: per user, view → later click → later purchase
    (strict ts order), counted per reached stage.  Bucketed-run exchange
    with SEGMENTED reductions: the three stage conditions are each one
    ``np.minimum.reduceat`` / ``logical_or.reduceat`` over the whole bucket
    (sentinel = int64 max for 'no such event'), so per-user work is pure
    numpy — Python fires once per bucket; only (stage) rows reach the final
    tiny aggregate."""
    from ..stages.windows import grouped_ordered_runs, run_index

    I64MAX = np.iinfo(np.int64).max
    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"stage": pa.array([], pa.int64())})
        ts = np.asarray(g["ts_us"], dtype=np.int64)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        rid = run_index(starts, ends)
        xv = np.where(et == "view", ts, I64MAX)
        tv_min = np.minimum.reduceat(xv, starts)
        xc = np.where((et == "click") & (ts > tv_min[rid]), ts, I64MAX)
        tc_min = np.minimum.reduceat(xc, starts)
        has_p = np.logical_or.reduceat((et == "purchase") & (ts > tc_min[rid]), starts)
        stage = (
            (tv_min < I64MAX).astype(np.int64)
            + (tc_min < I64MAX)
            + has_p
        )
        return pa.table({"stage": pa.array(stage.astype(np.int64))})

    out = (
        grouped_ordered_runs(prep, "user_id", (), kernel)
        .groupby("stage")
        .aggregate(Count(alias_name="n_users"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def sources_distinctive_tokens(sf_dir: str):
    """Per-source top-3 distinctive tokens by integer lift (in-source rate vs
    corpus rate, ×1000 floor-quantized) — corpus-drift analytics.  Shuffle ∝
    distinct (source, token) cells; corpus counts re-aggregate FROM the cell
    table and broadcast under the vocab guard (see
    ``stages.vocab.distinctive_tokens``)."""
    from ..stages.vocab import distinctive_tokens

    ds = _t(sf_dir, "documents", ["doc_id", "source", "text"])
    return distinctive_tokens(ds, k=3)


def events_user_paths(sf_dir: str):
    """Per-user ordered journey string: the first 8 event types in (ts,
    event_id) order joined with '>' — bucketed-run exchange; the per-user
    head-8 gather is one vectorized repeat/arange index build and the join
    itself is Arrow's ``binary_join`` over a LargeListArray assembled from
    the run offsets (no per-user Python, no per-user string loop)."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_id": b["event_id"],
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], g["user_id"].type),
                    "path": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        lens = np.minimum(ends - starts, 8)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        pos = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], lens)
        idx = np.repeat(starts, lens) + pos
        head_types = g["event_type"].take(pa.array(idx, pa.int64()))
        values = pc.cast(head_types, pa.large_string())
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), values)
        paths = pc.binary_join(lists, pa.scalar(">", pa.large_string()))
        return pa.table(
            {
                "user_id": g["user_id"].take(pa.array(starts, pa.int64())),
                "path": pc.cast(paths, pa.string()),
                "n_events": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def events_value_locf(sf_dir: str):
    """Last-observation-carried-forward imputation: 'error' events' values are
    treated as missing and filled from the user's most recent prior non-error
    value ((ts, event_id) order; -1 cents before any observation).  Bucketed-
    run exchange: ONE global ``maximum.accumulate`` over observation indices
    does every user at once — indices are globally increasing, so a carry
    from an earlier run is always < this run's start and the per-row
    ``carried >= run_start`` mask resets it to the -1 sentinel without any
    per-user Python."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "value", "ts"])
    prep = ds.map_batches(
        lambda b: pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "cents": _cents(b["value"]),
                "missing": pc.equal(b["event_type"], pa.scalar("error")),
            }
        ),
        batch_format="pyarrow",
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        cents = np.asarray(g["cents"], dtype=np.int64) if n else np.empty(0, np.int64)
        missing = np.asarray(g["missing"], dtype=bool) if n else np.empty(0, bool)
        obs = np.where(~missing, np.arange(n, dtype=np.int64), -1)
        carried = np.maximum.accumulate(obs) if n else obs
        base = np.repeat(starts, ends - starts)  # each row's run start
        valid = carried >= base
        filled = np.where(valid, cents[np.maximum(carried, 0)], -1)
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "filled_cents": pa.array(filled.astype(np.int64)),
            }
        )

    return grouped_ordered_runs(prep, "user_id", ("ts_us", "event_id"), kernel)


def emb_code_gram(sf_dir: str):
    """Integer-exact distributed Gram matrix over the uint8 quantization
    codes (the covariance/PCA building block): one dim×dim partial per block
    (vectors never shuffle), tiny (i, j) groupby merge.  Upper triangle."""
    from ..stages.quantize import code_gram

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return code_gram(ds)


def q7_nation_volume(sf_dir: str):
    """TPC-H Q7 shape (volume shipping between two nations by year): the
    two-nation predicate makes BOTH fact sides tiny after filtering, so the
    default plan has NO fact-fact exchange at all — supplier→nation resolves
    from a broadcast sorted-array lut, and orders filtered to customers of
    the two nations becomes a broadcast orderkey→nation lut (2/N of orders;
    above ``_SEMI_BROADCAST_LIMIT`` the q3/q4 partitioned-hash-join duality
    applies, partition count clamped so no hash partition can be empty —
    the Ray 2.49 empty-partition join failure, see ``clamped_partitions``).
    Per-batch pre-aggregation collapses each block to ≤ 2 nation-pairs ×
    years rows; revenue is exact scaled integers (cents × (10000 − bp))."""
    import ray

    from ..stages.clustering import clamped_partitions

    NATIONS = {"NATION_1", "NATION_2", "NATION_3", "NATION_4"}

    nat = pa.Table.from_pandas(
        _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas(), preserve_index=False
    )
    name_of = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    keys_ab = np.sort(
        np.asarray([k for k, v in name_of.items() if v in NATIONS], dtype=np.int64)
    )

    def _lut(tbl_ds, kcol: str, vcol: str):
        t = pa.Table.from_pandas(tbl_ds.to_pandas(), preserve_index=False)
        k = np.asarray(t[kcol], dtype=np.int64)
        v = np.asarray(t[vcol], dtype=np.int64)
        o = np.argsort(k)
        return k[o], v[o]

    supp_ref = ray.put(
        _lut(_t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]), "s_suppkey", "s_nationkey")
    )
    cust_ref = ray.put(
        _lut(_t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), "c_custkey", "c_nationkey")
    )

    # orders restricted to customers of the two nations → (orderkey, c_nat)
    def orders_ab(b: pa.Table) -> pa.Table:
        ck, cv = ray.get(cust_ref)
        ckey = np.asarray(b["o_custkey"], dtype=np.int64)
        cp = np.clip(np.searchsorted(ck, ckey), 0, len(ck) - 1)
        c_nat = cv[cp]
        keep = (ck[cp] == ckey) & np.isin(c_nat, keys_ab)
        return pa.table(
            {
                "o_orderkey": pc.take(b["o_orderkey"], pa.array(np.flatnonzero(keep))),
                "c_nat": pa.array(c_nat[keep]),
            }
        )

    orders_f = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .map_batches(orders_ab, batch_format="pyarrow")
        .materialize()
    )
    n_orders_f = orders_f.count()

    def rev_partial(b: pa.Table, okey_lut) -> pa.Table:
        """lineitem batch → per-batch grouped (s_nat, c_nat, l_year) partial
        revenue; okey_lut = (sorted orderkeys, c_nat values) or None when the
        order side arrives via join columns already present in the batch."""
        empty = pa.table(
            {
                "s_nat": pa.array([], pa.int64()),
                "c_nat": pa.array([], pa.int64()),
                "l_year": pa.array([], pa.int64()),
                "rev_scaled": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        sk, sv = ray.get(supp_ref)
        skey = np.asarray(b["l_suppkey"], dtype=np.int64)
        sp = np.clip(np.searchsorted(sk, skey), 0, len(sk) - 1)
        s_nat = sv[sp]
        keep = (sk[sp] == skey) & np.isin(s_nat, keys_ab)
        if okey_lut is not None:
            ok, onat = ray.get(okey_lut) if isinstance(okey_lut, ray.ObjectRef) else okey_lut
            okey = np.asarray(b["l_orderkey"], dtype=np.int64)
            op = np.clip(np.searchsorted(ok, okey), 0, max(len(ok) - 1, 0))
            c_nat = onat[op] if len(ok) else np.full(len(okey), -1, dtype=np.int64)
            keep &= (ok[op] == okey) if len(ok) else False
        else:
            c_nat = np.asarray(b["c_nat"], dtype=np.int64)
        keep &= s_nat != c_nat  # cross pairs only; both already in {A, B}
        if not keep.any():
            return empty
        cents = np.asarray(_cents(b["l_extendedprice"]), dtype=np.int64)[keep]
        disc_bp = np.asarray(
            pc.cast(pc.round(pc.multiply(b["l_discount"], 10000.0)), pa.int64()), dtype=np.int64
        )[keep]
        year = np.asarray(pc.year(b["l_shipdate"]), dtype=np.int64)[keep]
        sub = pa.table(
            {
                "s_nat": pa.array(s_nat[keep]),
                "c_nat": pa.array(c_nat[keep]),
                "l_year": pa.array(year),
                "rev_scaled": pa.array(cents * (10000 - disc_bp), pa.int64()),
            }
        )
        return (
            sub.group_by(["s_nat", "c_nat", "l_year"])
            .aggregate([("rev_scaled", "sum")])
            .rename_columns(["s_nat", "c_nat", "l_year", "rev_scaled"])
        )

    li_cols = ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    if n_orders_f <= _SEMI_BROADCAST_LIMIT:
        odf = orders_f.to_pandas()
        ok = odf["o_orderkey"].to_numpy(dtype=np.int64)
        o = np.argsort(ok)
        okey_ref = ray.put((ok[o], odf["c_nat"].to_numpy(dtype=np.int64)[o]))
        partials = _t(sf_dir, "lineitem", li_cols).map_batches(
            lambda b: rev_partial(b, okey_ref), batch_format="pyarrow"
        )
    else:
        n_parts = clamped_partitions(
            n_orders_f, max(8, int(ray.cluster_resources().get("CPU", 8)))
        )
        joined = _t(sf_dir, "lineitem", li_cols).join(
            orders_f, join_type="inner", num_partitions=n_parts,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
        partials = joined.map_batches(lambda b: rev_partial(b, None), batch_format="pyarrow")

    agg = partials.groupby(["s_nat", "c_nat", "l_year"]).aggregate(
        Sum("rev_scaled", alias_name="rev_scaled")
    )
    adf = agg.to_pandas()
    if adf.empty:  # empty aggregates lose their schema through to_pandas
        return pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64()),
            }
        )
    tbl = pa.Table.from_pandas(adf, preserve_index=False)
    names = pa.array([name_of[int(k)] for k in tbl["s_nat"].to_pylist()], pa.string())
    cnames = pa.array([name_of[int(k)] for k in tbl["c_nat"].to_pylist()], pa.string())
    return pa.table(
        {
            "supp_nation": names,
            "cust_nation": cnames,
            "l_year": tbl["l_year"],
            "revenue": pc.divide(pc.cast(tbl["rev_scaled"], pa.float64()), pa.scalar(1000000.0)),
        }
    )


def nation_top_customer(sf_dir: str):
    """Argmax-per-group (TPC-H Q2's min-cost-supplier pattern): per nation,
    the customer with the highest account balance, ties broken by smallest
    custkey.  Per-batch partial argmax (one row per nation per block — the
    map-side contraction) → tiny global merge; nation names attach from a
    driver dict.  Comparison is on exact integer cents on BOTH sides so
    float roundoff can never flip a tie."""
    import ray

    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_ref = ray.put(dict(zip(nat["n_nationkey"].astype(int), nat["n_name"])))

    def partial_argmax(b: pa.Table) -> pa.Table:
        nk = np.asarray(b["c_nationkey"], dtype=np.int64)
        ck = np.asarray(b["c_custkey"], dtype=np.int64)
        cents = np.asarray(_cents(b["c_acctbal"]), dtype=np.int64)
        # sort by (nation, -cents, custkey) and keep the first row per nation
        order = np.lexsort((ck, -cents, nk))
        first = np.ones(len(order), dtype=bool)
        first[1:] = nk[order][1:] != nk[order][:-1]
        sel = order[first]
        return pa.table(
            {
                "c_nationkey": pa.array(nk[sel]),
                "c_custkey": pa.array(ck[sel]),
                "cents": pa.array(cents[sel]),
            }
        )

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    parts = cust.map_batches(partial_argmax, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["c_nationkey", "cents", "c_custkey"], ascending=[True, False, True], kind="stable"
    ).drop_duplicates("c_nationkey")
    names = ray.get(name_ref)
    return pa.table(
        {
            "n_name": pa.array([names[int(k)] for k in parts["c_nationkey"]], pa.string()),
            "c_custkey": pa.array(parts["c_custkey"].to_numpy(), pa.int64()),
            "acctbal": pa.array(parts["cents"].to_numpy().astype(np.float64) / 100.0),
        }
    )


def events_value_quartiles(sf_dir: str):
    """NTILE(4) window per event_type (ORDER BY value, event_id — a total
    order, so bucket boundaries are deterministic), summarized per quartile.

    Scale shape: NTILE needs a global per-group rank, and event_type has a
    HANDFUL of distinct values — a ``map_groups`` would put a whole type on
    one worker (unacceptable at 10⁹ rows/type).  Instead: one sort
    range-shuffle + the two-phase :func:`grouped_prefix_scan` assigns
    per-type row numbers with O(n_blocks + n_types) driver state; the exact
    SQL-NTILE bucket of a rank is then arithmetic (first n%k buckets take
    base+1 rows), and the per-(type, quartile) summary is an ordinary
    map-side-combined aggregate.  No worker ever holds a whole type."""
    import ray

    from ..stages.scan import grouped_prefix_scan

    ds = _t(sf_dir, "events", ["event_type", "event_id", "value"])
    counts = ds.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()
    n_of = dict(zip(counts["event_type"], counts["n"].astype(int)))
    n_ref = ray.put(n_of)

    prep = ds.map_batches(
        lambda b: b.append_column("z", pa.array(np.zeros(b.num_rows, dtype=np.int64))),
        batch_format="pyarrow",
    )
    ranked = grouped_prefix_scan(
        prep, "event_type", ["value", "event_id"], "z", out_col="zsum", row_col="rank"
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "quartile": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "lo_p": pa.array([], pa.float64()),
                    "hi_p": pa.array([], pa.float64()),
                }
            )
        nmap = ray.get(n_ref)
        types = b["event_type"].to_numpy(zero_copy_only=False)
        n_grp = np.array([nmap[t] for t in types], dtype=np.int64)
        r0 = np.asarray(b["rank"], dtype=np.int64) - 1  # 0-based rank in type
        base, extra = n_grp // 4, n_grp % 4
        cut = extra * (base + 1)  # ranks below cut sit in the +1-sized buckets
        small_ok = np.maximum(base, 1)  # guard div-by-0 when n < 4 (cut covers all)
        qid = np.where(r0 < cut, r0 // np.maximum(base + 1, 1), extra + (r0 - cut) // small_ok) + 1
        sub = pa.table(
            {
                "event_type": b["event_type"],
                "quartile": pa.array(qid),
                "value": b["value"],
            }
        )
        g = sub.group_by(["event_type", "quartile"]).aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")]
        )
        return g.rename_columns(["event_type", "quartile", "n", "lo_p", "hi_p"])

    agg = (
        ranked.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "quartile"])
        .aggregate(
            Sum("n", alias_name="n"),
            Min("lo_p", alias_name="lo_p"),
            Max("hi_p", alias_name="hi_p"),
        )
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "event_type": tbl["event_type"],
            "quartile": pc.cast(tbl["quartile"], pa.int64()),
            "n": pc.cast(tbl["n"], pa.int64()),
            "lo": _round_col(tbl["lo_p"], 6),
            "hi": _round_col(tbl["hi_p"], 6),
        }
    )


def brand_distinct_suppliers(sf_dir: str):
    """Grouped COUNT(DISTINCT) — the two-level distinct aggregation: part is
    a broadcast partkey→brand lut; each batch contracts to its unique
    (brand, suppkey) pairs map-side (np.unique — the combiner that keeps the
    exchange ∝ distinct pairs, not lineitems); the global distinct is a
    (brand, suppkey) groupby-count whose COUNT is discarded, then a per-brand
    count of the surviving pairs."""
    import ray

    part = _t(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    order = np.argsort(pk)
    brands, brand_codes = np.unique(part["p_brand"].to_numpy()[order], return_inverse=True)
    lut_ref = ray.put((pk[order], brand_codes.astype(np.int64), list(brands)))

    def pairs(b: pa.Table) -> pa.Table:
        k, codes, _ = ray.get(lut_ref)
        pkey = np.asarray(b["l_partkey"], dtype=np.int64)
        pos = np.clip(np.searchsorted(k, pkey), 0, len(k) - 1)
        ok = k[pos] == pkey
        brand = codes[pos][ok]
        supp = np.asarray(b["l_suppkey"], dtype=np.int64)[ok]
        uniq = np.unique(np.stack([brand, supp], axis=1), axis=0)
        return pa.table(
            {"brand_code": pa.array(uniq[:, 0]), "l_suppkey": pa.array(uniq[:, 1])}
        )

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    distinct_pairs = (
        li.map_batches(pairs, batch_format="pyarrow")
        .groupby(["brand_code", "l_suppkey"])
        .aggregate(Count(alias_name="_c"))
    )
    counts = distinct_pairs.groupby("brand_code").aggregate(Count(alias_name="n_suppliers"))
    tbl = pa.Table.from_pandas(counts.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "p_brand": pa.array([brands[int(c)] for c in tbl["brand_code"].to_pylist()], pa.string()),
            "n_suppliers": pc.cast(tbl["n_suppliers"], pa.int64()),
        }
    )


def events_retention_cohorts(sf_dir: str):
    """Retention-cohort matrix (the behavioral-analytics staple): cohort =
    a user's first active day; cell (cohort_day, day_offset) counts users
    active offset days later.  One bucketed ordered-run exchange
    (``stages/windows.py`` ``grouped_ordered_runs``) does everything a
    groupby + self-join used to: (user, day) rows contract map-side per
    batch, a user's rows co-locate in one hash bucket, and inside the
    bucket one lexsort gives — per user run — the cohort (first day),
    the distinct-day mask, and the day offsets, all vectorized.  No Ray
    hash join at all: the previous ``pairs ⋈ cohorts`` join flaked on the
    Ray 2.49 empty-hash-partition schema loss whenever the user table was
    tiny (15 users at sf0.001), and the cohort is just ``min(day)`` within
    data the exchange already co-locates.  The final cell groupby is
    bounded by distinct (cohort, offset) cells, never rows."""
    DAY_US = 86_400_000_000

    from ..stages.windows import grouped_ordered_runs, run_index

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def contract(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "day": pa.array([], pa.int64())}
            )
        u = np.asarray(b["user_id"], dtype=np.int64)
        d = np.asarray(pc.cast(b["ts"], pa.int64()), dtype=np.int64) // DAY_US
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        return pa.table({"user_id": pa.array(u[keep]), "day": pa.array(d[keep])})

    empty = pa.table(
        {
            "cohort_day": pa.array([], pa.int64()),
            "day_offset": pa.array([], pa.int64()),
            "n_partial": pa.array([], pa.int64()),
        }
    )

    def cells(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return empty
        u = np.asarray(g["user_id"], dtype=np.int64)
        d = np.asarray(g["day"], dtype=np.int64)
        # rows sorted by (user, day): cohort = run head; batches were only
        # LOCALLY distinct, so drop cross-batch (user, day) dups first
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        cohort = d[starts][run_index(starts, ends)]
        off = (d - cohort)[keep]
        cohort = cohort[keep]
        o2 = np.lexsort((off, cohort))
        c2, f2 = cohort[o2], off[o2]
        s2 = np.flatnonzero(np.r_[True, (c2[1:] != c2[:-1]) | (f2[1:] != f2[:-1])])
        cnt = np.diff(np.r_[s2, len(c2)])
        return pa.table(
            {
                "cohort_day": pa.array(c2[s2]),
                "day_offset": pa.array(f2[s2]),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = grouped_ordered_runs(
        ds.map_batches(contract, batch_format="pyarrow"), "user_id", ("day",), cells
    )
    return (
        partials.groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_partial", alias_name="n_users"))
        .map_batches(
            lambda b: pa.table(
                {
                    "cohort_day": b["cohort_day"],
                    "day_offset": b["day_offset"],
                    "n_users": pc.cast(b["n_users"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def docs_meta_blocking(sf_dir: str):
    """Meta-blocking candidate generation (Papadakis TKDE'13): word-trigram
    blocking keys, block purging outside [2, 20], CBS pair weighting, prune
    to ≥ 2 shared blocks.  The third classic ER candidate generator next to
    MinHash-LSH banding and sorted-neighborhood — see
    ``stages/blocking.py`` ``meta_blocking_pairs`` for the bounded-shuffle
    decomposition."""
    from ..stages.blocking import meta_blocking_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = meta_blocking_pairs(ds, n=3, min_block=2, max_block=20, min_shared=2)
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_a": b["doc_a"],
                "doc_b": b["doc_b"],
                "shared_blocks": pc.cast(b["shared_blocks"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def docs_media_features(sf_dir: str):
    """Multimodal plumbing exercised end-to-end as a driver query: documents
    become opaque binary payloads (UTF-8 bytes — deterministic, so the
    integer outputs are SQL-replayable), then the REAL actor-pool stage
    (``stages/multimodal.py`` ``ImageFeatures``: per-actor init, zero-copy
    payload-buffer access, small batches because blobs dominate block size)
    extracts features + integer lineage checksums.  Output keeps only the
    integer columns (n_bytes, byte_sum) — the float feature path is covered
    by pytest; the checksums prove the payload plumbing byte-exactly."""
    from ..stages.multimodal import ImageFeatures

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(pc.utf8_trim_whitespace(b["text"]), "")
        b = b.filter(keep)
        # ASCII-sanitized projection of the text: the oracle replays the
        # payload per-CHARACTER (ascii() codepoints), while raw UTF-8 counts
        # BYTES — they agree only on ASCII, so non-ASCII text would silently
        # break parity (round-3 ADVICE item 3).  Dropping bytes ≥ 0x80 drops
        # exactly the non-ASCII codepoints (every byte of a multi-byte UTF-8
        # char has the high bit set), after which byte == codepoint.  Docs
        # left with an empty payload drop, matching the oracle's GROUP BY.
        col = b["text"].combine_chunks() if isinstance(b["text"], pa.ChunkedArray) else b["text"]
        col = col.cast(pa.large_binary())
        off = np.frombuffer(col.buffers()[1], np.int64)[col.offset : col.offset + len(col) + 1]
        data = np.frombuffer(col.buffers()[2], np.uint8)[off[0] : off[-1]]
        mask = data < 128
        pref = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
        new_off = pref[(off - off[0]).astype(np.int64)]
        payload = pa.Array.from_buffers(
            pa.large_binary(),
            len(col),
            [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(data[mask].tobytes())],
        )
        out = pa.table(
            {
                "media_id": pc.cast(b["doc_id"], pa.string()),
                "payload": payload,
            }
        )
        return out.filter(pa.array(new_off[1:] > new_off[:-1]))

    feats = ds.map_batches(to_media, batch_format="pyarrow").map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"backend": "fake", "dim": 32},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=256,
    )
    return feats.select_columns(["media_id", "n_bytes", "byte_sum"])


def docs_media_dimensions(sf_dir: str):
    """REAL image-header decode as a driver query (round-3 VERDICT item 6):
    every document becomes a syntactically valid image payload — even
    doc_ids a PNG (signature + IHDR), odd a JPEG (SOI + APP0 + SOF0, so the
    marker WALK is exercised, not a fixed peek) — with dimensions derived
    from doc_id; the actor-pool stage (``stages/multimodal.py``
    ``ImageFeatures(backend="real_headers")``) parses width/height back out
    of the BYTES in pure numpy (``parse_image_dims``).  The oracle replays
    the dimension arithmetic; a parser that misread headers, byte order, or
    segment lengths hash-mismatches immediately."""
    from ..stages.multimodal import ImageFeatures, make_jpeg_payloads, make_png_payloads

    ds = _t(sf_dir, "documents", ["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        w = (ids % 640) + 1
        h = (ids % 480) + 1
        even = ids % 2 == 0
        png_flat, png_off = make_png_payloads(w[even], h[even])
        jpg_flat, jpg_off = make_jpeg_payloads(w[~even], h[~even])

        def as_bin(flat: np.ndarray, off: np.ndarray) -> pa.Array:
            return pa.Array.from_buffers(
                pa.large_binary(),
                len(off) - 1,
                [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
            )

        ptbl = pa.table(
            {"media_id": pc.cast(pa.array(ids[even]), pa.string()), "payload": as_bin(png_flat, png_off)}
        )
        jtbl = pa.table(
            {"media_id": pc.cast(pa.array(ids[~even]), pa.string()), "payload": as_bin(jpg_flat, jpg_off)}
        )
        return pa.concat_tables([ptbl, jtbl])

    feats = ds.map_batches(to_media, batch_format="pyarrow").map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"backend": "real_headers", "dim": 32},
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=256,
    )
    return feats.map_batches(
        lambda b: pa.table(
            {
                "media_id": b["media_id"],
                "fmt": b["img_format"],
                "width": b["img_width"],
                "height": b["img_height"],
                "n_bytes": b["n_bytes"],
            }
        ),
        batch_format="pyarrow",
    )


def docs_er_clusters(sf_dir: str):
    """The COMPLETE classic entity-resolution chain in one query, every stage
    SQL-replayed: meta-blocking candidates (S61) → exact char-trigram Jaccard
    verify ≥ 0.7 (vectorized sort-merge, texts joined onto the pair set) →
    transitive closure with min-id labels (pointer-jumping; recursive-CTE
    oracle).  Complements ``docs_window_jaccard_clusters`` (which uses the
    order-window candidate generator) — same verify/cluster stages, blocking
    strategy swapped, demonstrating the generators are interchangeable."""
    from ..stages.blocking import meta_blocking_pairs
    from ..stages.clustering import cluster_nodes
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cands = meta_blocking_pairs(ds, n=3, min_block=2, max_block=20, min_shared=2).map_batches(
        lambda b: pa.table({"a_id": b["doc_a"], "b_id": b["doc_b"]}),
        batch_format="pyarrow",
    )
    verified = ngram_jaccard_verify(cands, ds, threshold=0.7)
    edges = verified.map_batches(
        lambda b: pa.table(
            {
                "src": pc.utf8_lpad(pc.cast(b["a_id"], pa.string()), 20, "0"),
                "dst": pc.utf8_lpad(pc.cast(b["b_id"], pa.string()), 20, "0"),
            }
        ),
        batch_format="pyarrow",
    )
    nodes = ds.map_batches(
        lambda b: pa.table({"node": pc.utf8_lpad(pc.cast(b["doc_id"], pa.string()), 20, "0")}),
        batch_format="pyarrow",
    )
    labels = cluster_nodes(edges, nodes, mode="auto")
    return labels.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b["node"], pa.int64()),
                "cluster_id": pc.cast(b["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def docs_er_golden_records(sf_dir: str):
    """GOLDEN-RECORD consolidation — the classic ER deliverable downstream of
    clustering (the reference stops at per-mention predictions,
    mix_blink/prediction; survivorship is engine scope): per cluster from
    the ``docs_er_clusters`` chain, the canonical ``source`` (mode, ties →
    lexicographically smallest), the representative member (min doc_id) and
    the member count.  Topology: labels reach docs by ONE partitioned
    equi-join, batches contract map-side to (cluster, source, n, min_doc)
    cells, and the WHOLE consolidation — per-(cluster,source) totals,
    per-cluster argmax with tie-break, min-doc, member count — falls out of
    one ``grouped_weighted_mode`` exchange over the cells (sorted by source
    inside each cluster run, sub-segment ``reduceat`` sums, first-max pick
    via ``minimum.reduceat`` on masked indices): no per-cluster Python, no
    second aggregate, no final join."""
    from ..stages.clustering import cpu_scaled_partitions
    from ..stages.windows import grouped_weighted_mode

    labels = docs_er_clusters(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "source"])
    n_parts = cpu_scaled_partitions(docs.count())
    joined = labels.join(
        docs, join_type="inner", num_partitions=n_parts,
        on=("doc_id",), right_on=("doc_id",),
    )

    def partial_cells(b: pa.Table) -> pa.Table:
        cl = np.asarray(b["cluster_id"], dtype=np.int64)
        doc = np.asarray(b["doc_id"], dtype=np.int64)
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        codes = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)
        if len(cl) == 0 or k == 0:
            return pa.table(
                {
                    "cluster_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n_partial": pa.array([], pa.int64()),
                    "min_doc": pa.array([], pa.int64()),
                }
            )
        if int(cl.max()) * k + k >= 2**63:  # loud, never silent wrap
            raise ValueError("golden_records: cluster_id × dict size overflows int64")
        key = cl * k + codes
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        cnt = np.diff(np.r_[starts, len(ks)]).astype(np.int64)
        mind = np.minimum.reduceat(doc[order], starts)
        uniq = ks[starts]
        return pa.table(
            {
                "cluster_id": pa.array(uniq // k),
                "source": enc.dictionary.take(pa.array(uniq % k)),
                "n_partial": pa.array(cnt),
                "min_doc": pa.array(mind),
            }
        )

    cells = joined.map_batches(partial_cells, batch_format="pyarrow")
    out = grouped_weighted_mode(
        cells, "cluster_id", "source", "n_partial", min_col="min_doc"
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "cluster_id": b["cluster_id"],
                "canonical_source": b["mode_source"],
                "rep_doc": b["min_min_doc"],
                "n_members": b["total_n_partial"],
            }
        ),
        batch_format="pyarrow",
    )


def events_user_primary_type(sf_dir: str):
    """Per-user PRIMARY event type (mode, ties → lexicographically smallest)
    + total event count — the second consumer of the reusable
    ``grouped_weighted_mode`` survivorship stage (first:
    ``docs_er_golden_records``): batches contract to (user, type, n) cells
    map-side (shuffle ∝ distinct cells, never rows), then one bucketed-run
    exchange does the whole pick."""
    from ..stages.windows import grouped_weighted_mode

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def partial_cells(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"], dtype=np.int64)
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        codes = np.asarray(enc.indices, dtype=np.int64)
        k = len(enc.dictionary)
        if len(u) == 0 or k == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n_partial": pa.array([], pa.int64()),
                }
            )
        if int(u.max()) * k + k >= 2**63:
            raise ValueError("primary_type: user_id × dict size overflows int64")
        key = u * k + codes
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        cnt = np.diff(np.r_[starts, len(ks)]).astype(np.int64)
        uniq = ks[starts]
        return pa.table(
            {
                "user_id": pa.array(uniq // k),
                "event_type": enc.dictionary.take(pa.array(uniq % k)),
                "n_partial": pa.array(cnt),
            }
        )

    cells = ds.map_batches(partial_cells, batch_format="pyarrow")
    out = grouped_weighted_mode(cells, "user_id", "event_type", "n_partial")
    return out.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "primary_type": b["mode_event_type"],
                "n_events": b["total_n_partial"],
            }
        ),
        batch_format="pyarrow",
    )


def docs_blocking_quality(sf_dir: str):
    """ER blocking-stage evaluation (pair completeness + reduction counts,
    the standard blocking metrics): a corpus with 50 known duplicate pairs
    (doc_id+10⁶ copies, the ``docs_dedup_corpus_exact`` construction) runs
    through meta-blocking; the metrics count how many truth pairs the
    candidate set finds and how many candidates it proposes.  Truth
    membership is ARITHMETIC ((a < 50) ∧ (b = a + 10⁶)), so every count is a
    map-side partial sum — no truth table ships anywhere, and the output is
    one integer row the SQL oracle replays end-to-end."""
    from ..stages.blocking import meta_blocking_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    DUP = 1_000_000

    def with_dups(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.less(b["doc_id"], pa.scalar(50)))
        dup = pa.table(
            {
                "doc_id": pc.add(keep["doc_id"], pa.scalar(DUP, pa.int64())),
                "text": keep["text"],
            }
        )
        return pa.concat_tables([b.select(["doc_id", "text"]), dup])

    corpus = ds.map_batches(with_dups, batch_format="pyarrow")
    cands = meta_blocking_pairs(corpus, n=3, min_block=2, max_block=20, min_shared=2)

    def partial(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"], dtype=np.int64)
        bb = np.asarray(b["doc_b"], dtype=np.int64)
        found = int(np.count_nonzero((a < 50) & (bb == a + DUP)))
        return pa.table(
            {
                "n_candidates": pa.array([len(a)], pa.int64()),
                "n_true_found": pa.array([found], pa.int64()),
            }
        )

    agg = (
        cands.map_batches(partial, batch_format="pyarrow")
        .aggregate(
            Sum("n_candidates", alias_name="n_candidates"),
            Sum("n_true_found", alias_name="n_true_found"),
        )
    )
    n_records = corpus.count()
    n_true = ds.map_batches(
        lambda b: pa.table(
            {"n": pa.array([int(pc.sum(pc.cast(pc.less(b["doc_id"], 50), pa.int64())).as_py() or 0)], pa.int64())}
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("n", alias_name="n"))
    return pa.table(
        {
            "n_records": pa.array([int(n_records)], pa.int64()),
            "n_true_pairs": pa.array([int(n_true["n"])], pa.int64()),
            "n_candidates": pa.array([int(agg["n_candidates"] or 0)], pa.int64()),
            "n_true_found": pa.array([int(agg["n_true_found"] or 0)], pa.int64()),
        }
    )


def users_click_purchase_full_outer(sf_dir: str):
    """FULL OUTER join coverage (the one join type the catalog lacked):
    per-user click counts ⟗ per-user purchase counts — users appearing on
    either side survive, missing sides coalesce to 0.  Both inputs are
    already-aggregated (one row per user), so the exchange is user-sized;
    the key columns from both sides coalesce into one."""
    from ..stages.clustering import clamped_partitions

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def side(ev_type: str, out: str):
        return (
            ds.map_batches(
                lambda b, t=ev_type: b.filter(pc.equal(b["event_type"], t)).select(["user_id"]),
                batch_format="pyarrow",
            )
            .groupby("user_id")
            .aggregate(Count(alias_name=out))
        )

    clicks = side("click", "n_clicks").materialize()
    buys = side("purchase", "n_purchases").map_batches(
        lambda b: pa.table({"user_id_r": b["user_id"], "n_purchases": b["n_purchases"]}),
        batch_format="pyarrow",
    ).materialize()
    n_parts = clamped_partitions(
        max(clicks.count(), buys.count(), 1), 8
    )
    joined = clicks.join(
        buys, join_type="full_outer", num_partitions=n_parts,
        on=("user_id",), right_on=("user_id_r",),
    )
    def finish(b: pa.Table) -> pa.Table:
        # Ray's full_outer join coalesces the key pair into ONE column when
        # the right key is consumed via right_on; keep a defensive coalesce
        # for layouts that still carry the right key separately.
        uid = b["user_id"]
        if "user_id_r" in b.column_names:
            uid = pc.coalesce(uid, b["user_id_r"])
        return pa.table(
            {
                "user_id": uid,
                "n_clicks": pc.cast(pc.fill_null(b["n_clicks"], 0), pa.int64()),
                "n_purchases": pc.cast(pc.fill_null(b["n_purchases"], 0), pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def events_tumbling_late(sf_dir: str):
    """Event-time tumbling windows with a WATERMARK (streaming semantics on
    a batch engine): watermark = max event time − 10 min; 10-minute windows
    whose end ≤ watermark are CLOSED and emitted with exact cent sums;
    later windows are still open and withheld.  The watermark is one tiny
    global max (map-side partial → scalar broadcast); the window aggregate
    is an ordinary map-side-combined groupby — nothing re-scans."""
    ds = _t(sf_dir, "events", ["ts", "value"])
    W_US = 600_000_000  # 10-minute windows; allowance = one window

    mx = ds.map_batches(
        lambda b: pa.table({"m": pa.array([pc.max(pc.cast(b["ts"], pa.int64())).as_py() or 0], pa.int64())}),
        batch_format="pyarrow",
    ).aggregate(Max("m", alias_name="m"))
    watermark = int(mx["m"]) - W_US

    def partial(b: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(b["ts"], pa.int64()), dtype=np.int64)
        w = us // W_US
        closed = (w + 1) * W_US <= watermark
        cents = np.asarray(_cents(b["value"]), dtype=np.int64)[closed]
        w = w[closed]
        uw, inv = np.unique(w, return_inverse=True)
        if not len(uw):
            return pa.table(
                {
                    "window_start_us": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        from ..functions.numeric import group_sums_int64

        (csum,) = group_sums_int64(inv, len(uw), cents)  # exact int64
        return pa.table(
            {
                "window_start_us": pa.array(uw * W_US),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "cents": pa.array(csum),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_start_us": b["window_start_us"],
                "n": pc.cast(b["n"], pa.int64()),
                "total_value": pc.divide(pc.cast(b["cents"], pa.float64()), pa.scalar(100.0)),
            }
        ),
        batch_format="pyarrow",
    )


def customers_surface_link_top3(sf_dir: str):
    """The engine's DEFAULT bi-encoder scoring path, SQL-oracled end-to-end:
    every customer surface is scored against the supplier-name catalog with
    the hashed char-3-gram encoder (``functions/encoder.py``
    ``HashNgramEncoder``), top-3 by raw dot product.

    Exactness: with ``normalize=False`` the multihot features are SIGNED
    INTEGER counts, so scores are exact int64 dot products — no float
    parity games — and the oracle replays the full feature map in SQL:
    the rolling FNV-prime hash (wrap-around mod 2⁶⁴ via HUGEINT
    intermediates), column = h % dim, sign = bit 32.  Distribution shape =
    the broadcast scorer (``stages/scoring.py``): catalog matrix ships once
    via ``ray.put``; mentions stream; per-batch integer matmul + top-k."""
    import ray

    from ..functions.encoder import HashNgramEncoder

    DIM = 64
    # include_short=False: the SQL oracle replays grams via range(1, len-1),
    # which emits NOTHING for names shorter than 3 chars; the encoder's
    # whole-string fallback would diverge there (round-3 ADVICE item 4 —
    # latent only because TPC-H names are long, now structurally closed).
    enc = HashNgramEncoder(dim=DIM, n=3, normalize=False, include_short=False)

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    order = np.argsort(supp["s_suppkey"].to_numpy())
    keys = supp["s_suppkey"].to_numpy(dtype=np.int64)[order]
    cat = enc.encode(pa.array(supp["s_name"].to_numpy()[order])).astype(np.int64)
    cat_ref = ray.put((keys, cat))

    def topk(b: pa.Table) -> pa.Table:
        k, c = ray.get(cat_ref)
        m = enc.encode(b["c_name"]).astype(np.int64)
        dots = m @ c.T  # exact int64: signed gram counts × signed gram counts
        kk = min(3, dots.shape[1])
        # tie-break: dot DESC, suppkey ASC — lexsort on (-dot, key)
        part = np.argsort(-dots, axis=1, kind="stable")[:, :kk]  # keys sorted asc ⇒ stable = id tie-break
        rows = np.repeat(np.arange(dots.shape[0]), kk)
        cols = part.reshape(-1)
        return pa.table(
            {
                "c_custkey": pc.take(b["c_custkey"], pa.array(rows)),
                "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64), dots.shape[0])),
                "s_suppkey": pa.array(k[cols]),
                "dot": pa.array(dots[rows, cols].astype(np.int64)),
            }
        )

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    return cust.map_batches(topk, batch_format="pyarrow")


def events_value_mode_median(sf_dir: str):
    """MODE (most frequent value, ties → smallest) and INTERPOLATED median
    (``quantile_cont`` semantics: even counts average the two middles) per
    event_type — both read off ONE merged integer-cell histogram
    (``stages/quantiles.py`` ``grouped_cell_histogram``: shuffle ∝ distinct
    (group, cell) pairs, never rows).  Interpolation runs on exact int64
    cents, so the only float arithmetic is one halving + one divide —
    bit-identical to DuckDB's ``lower + (upper-lower)·frac``."""
    from ..stages.quantiles import grouped_cell_histogram

    ds = _t(sf_dir, "events", ["event_type", "value"])
    tbl = grouped_cell_histogram(ds, "event_type", "value", scale=100.0)
    groups = tbl["event_type"].to_numpy(zero_copy_only=False)
    cells = np.asarray(tbl["cell"], dtype=np.int64)
    ns = np.asarray(tbl["n"], dtype=np.int64)
    out_g, out_mode, out_med = [], [], []
    for g in sorted(set(groups)):
        m = groups == g
        order = np.argsort(cells[m], kind="stable")
        gc, gn = cells[m][order], ns[m][order]
        # mode: max count, ties broken by smallest cell (gc is sorted asc)
        out_mode.append(gc[int(np.argmax(gn))] / 100.0)
        cum = np.cumsum(gn)
        total = int(cum[-1])
        h = (total - 1) * 0.5
        lo_i = int(np.searchsorted(cum, int(np.floor(h)) + 1))
        hi_i = int(np.searchsorted(cum, int(np.ceil(h)) + 1))
        a, b = float(gc[lo_i]), float(gc[hi_i])
        out_med.append((a + (b - a) * 0.5) / 100.0)
        out_g.append(g)
    return pa.table(
        {
            "event_type": pa.array(out_g, pa.string()),
            "mode_value": pa.array(out_mode, pa.float64()),
            "median_cont": pa.array(out_med, pa.float64()),
        }
    )


def q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape (top-20 customers by returned-item revenue): the ONE
    fact-fact exchange is lineitem(R-flagged) ⋈ orders — the R filter
    shrinks the left side ~3× before it moves — then per-customer revenue
    contracts map-side, the top 20 come from the shuffle-free partial
    top-k (``stages/topk.py``), and names attach to just 20 rows from
    driver lookups.  Exact scaled-integer revenue throughout."""
    import ray

    from ..stages.topk import topk_rows

    def returned_rev(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_c4": pc.multiply(
                    _cents(b["l_extendedprice"]),
                    pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
                ),
            }
        )

    li = _t(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    ).map_batches(returned_rev, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"o_custkey": pa.array([], pa.int64()), "rev_c4": pa.array([], pa.int64())}
            )
        ck = np.asarray(b["o_custkey"], dtype=np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        from ..functions.numeric import group_sums_int64

        (sums,) = group_sums_int64(inv, len(uk), np.asarray(b["rev_c4"], dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk), "rev_c4": pa.array(sums)})

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
    )
    top = topk_rows(agg, ["rev_c4", "o_custkey"], [True, False], 20)

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cname = dict(zip(cust["c_custkey"].astype(int), cust["c_name"]))
    cnat = dict(zip(cust["c_custkey"].astype(int), cust["c_nationkey"].astype(int)))
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    keys = [int(k) for k in top["o_custkey"].to_pylist()]
    return pa.table(
        {
            "c_custkey": pa.array(keys, pa.int64()),
            "c_name": pa.array([cname[k] for k in keys], pa.string()),
            "n_name": pa.array([nname[cnat[k]] for k in keys], pa.string()),
            "revenue": pc.divide(pc.cast(top["rev_c4"], pa.float64()), pa.scalar(10000.0)),
        }
    )


def events_user_type_unpivot(sf_dir: str):
    """UNPIVOT / melt (wide → long): the per-user event-type pivot melted
    back to (user_id, event_type, n) rows — the inverse reshape, vectorized
    as one repeat + concat per batch (5 long rows per wide row, zeros kept
    so the reshape is lossless)."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = events_user_type_pivot(sf_dir)  # user-sized pa.Table
    n = wide.num_rows
    users = np.repeat(np.asarray(wide["user_id"], dtype=np.int64), len(types))
    tcol = np.tile(np.array(types, dtype=object), n)
    counts = np.stack(
        [np.asarray(wide[f"n_{t}"], dtype=np.int64) for t in types], axis=1
    ).reshape(-1)
    return pa.table(
        {
            "user_id": pa.array(users),
            "event_type": pa.array(list(tcol), pa.string()),
            "n": pa.array(counts),
        }
    )


def users_click_and_purchase(sf_dir: str):
    """INTERSECT set op (the EXCEPT twin of ``users_click_no_purchase``):
    distinct users present in BOTH the click and purchase streams.  One
    pass: per-batch (user, which-side) dedup → groupby(user) with per-side
    max flags → keep rows where both sides hit — no join, shuffle ∝
    distinct users."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def flags(b: pa.Table) -> pa.Table:
        users = np.asarray(b["user_id"], dtype=np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        users, et = users[keep], et[keep]
        uu, inv = np.unique(users, return_inverse=True)
        clk = np.zeros(len(uu), dtype=np.int64)
        buy = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(clk, inv, (et == "click").astype(np.int64))
        np.maximum.at(buy, inv, (et == "purchase").astype(np.int64))
        return pa.table(
            {"user_id": pa.array(uu), "clk": pa.array(clk), "buy": pa.array(buy)}
        )

    agg = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("clk", alias_name="clk"), Max("buy", alias_name="buy"))
    )
    return agg.map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["clk"], 1), pc.equal(b["buy"], 1))
        ).select(["user_id"]),
        batch_format="pyarrow",
    )


def events_benford_digits(sf_dir: str):
    """Benford first-significant-digit audit over event values — the
    data-forensics screen for fabricated or synthetically-clipped numeric
    columns (organic multi-scale data leads with 1 ~30% of the time;
    uniform generators lead flat — this corpus's log-scaled value generator
    happens to land near the law: measured 294‰ leading-1 at sf0.001 vs
    Benford's 301‰).  Exact integers: the
    first digit of |cents| comes from repeated floor division by 10 (≤ 19
    vectorized passes — no float log10, whose boundary rounding misplaces
    powers of ten; the oracle takes the first VARCHAR character of the same
    integer, which is the same function on positives), zero cents excluded
    (no leading digit).  Map-side 9-bucket bincount, ONE ≤ 9-row groupby,
    shares as 1000·n // total floor division driver-side."""
    ds = _t(sf_dir, "events", ["value"])
    empty = pa.table({"digit": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        c = np.abs(np.asarray(_cents(b["value"]), dtype=np.int64))
        c = c[c > 0]
        if len(c) == 0:
            return empty
        while True:  # ≤ 19 passes: int64 has at most 19 decimal digits
            m = c >= 10
            if not m.any():
                break
            c[m] //= 10
        cnt = np.bincount(c, minlength=10).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"digit": pa.array(nz, pa.int64()), "n_p": pa.array(cnt[nz], pa.int64())}
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    if len(g) == 0:
        raise ValueError("events_benford_digits: no positive values")
    digits = [int(v) for v in g["digit"]]
    ns = [int(v) for v in g["n"]]
    total = sum(ns)
    return pa.table(
        {
            "digit": pa.array(digits, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "share_permille": pa.array([1000 * n // total for n in ns], pa.int64()),
        }
    )


def parts_skyline(sf_dir: str):
    """Distributed 2-D skyline (Pareto frontier) over parts — every part not
    dominated on (size MAX, price MIN): the multi-objective shortlist
    primitive (cheapest part at every size level that no bigger part
    undercuts).  Dominance is ≥/≤ with at least one strict, so exact
    duplicate points dominate nothing and BOTH survive — pinned by tests and
    mirrored by the oracle's NOT EXISTS.  Engine shape
    (``stages/topk.pareto_frontier_2d``): per-batch LOCAL frontier
    contraction — lossless, since a globally non-dominated row is locally
    non-dominated — then one exact pass over the concatenated partials; each
    partial is bounded by the batch's distinct sizes, so the merge sees
    ≤ blocks × |size domain| rows (50 for TPC-H parts), never row-scale.
    The mask kernel is one lexsort + two prefix scans (min-d2 of strictly
    greater sizes; first-in-group strict check) — no pairwise loop."""
    from ..stages.topk import pareto_frontier_2d

    ds = _t(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"]).map_batches(
        lambda b: pa.table(
            {
                "p_partkey": b["p_partkey"],
                "p_size": pc.cast(b["p_size"], pa.int64()),
                "price_c": _cents(b["p_retailprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    return pareto_frontier_2d(ds, "p_size", "price_c")


def _fs_pattern_weights(n_m: int, n_u: int, am: list, au: list) -> list:
    """The 8 Fellegi–Sunter pattern weights as exact integers: for pattern
    bits (lang, source, len) = (bit2, bit1, bit0), weight_ppm =
    ⌊10⁶ · Π_k term_m(k)·(n_u+2) / Π_k term_u(k)·(n_m+2)⌋ with Laplace
    term_m = agree ? am_k+1 : n_m−am_k+1 (u likewise).  Every term ≥ 1 even
    at n_m = 0 or n_u = 0, so the division is always defined.  RAISES
    exactly where the oracle's HUGEINT intermediate (≥ 2¹²⁷) or BIGINT
    output cast would — the loud ceiling, never a silent wrap."""
    weights = []
    for pat in range(8):
        num, den = 10**6, 1
        for k in range(3):
            agree = (pat >> (2 - k)) & 1
            num *= (am[k] + 1 if agree else n_m - am[k] + 1) * (n_u + 2)
            den *= (au[k] + 1 if agree else n_u - au[k] + 1) * (n_m + 2)
        if num >= 2**127 or den >= 2**127:
            raise ValueError(
                "docs_fs_match_weights: HUGEINT overflow in the odds product "
                f"(pattern {pat:03b}); at this pair count use log-space floats"
            )
        w = num // den
        if w >= 2**63:
            raise ValueError(
                f"docs_fs_match_weights: weight_ppm {w} exceeds int64 "
                "(the oracle's BIGINT cast raises on the same value)"
            )
        weights.append(w)
    return weights


def docs_fs_match_weights(sf_dir: str):
    """Fellegi–Sunter probabilistic match weights (the 1969 record-linkage
    scorer, naive-Bayes form) over the meta-blocking candidate pairs —
    calibrate CHEAP field comparisons (lang / source / length-bucket
    equality) against the EXPENSIVE exact trigram-Jaccard verifier used as
    supervision (is_match = 10·inter ≥ 7·uni, the 0.7 threshold with no
    float boundary), then score every pair by its agreement pattern.  For
    field k, m_k = P(agree | match) and u_k = P(agree | non-match) are
    Laplace-smoothed exact rationals ((a+1)/(n+2)); the pair's odds
    Π_k (agree ? m_k/u_k : (1−m_k)/(1−u_k)) ships as weight_ppm =
    ⌊10⁶·num/den⌋ computed in arbitrary-precision Python ints and
    range-checked exactly where the oracle's HUGEINT intermediates
    (< 2¹²⁷) and BIGINT output cast would raise — at which corpus scale the
    honest escape hatch is log-space floats, documented not silent.
    Engine shape: candidates and the Jaccard label reuse the existing
    bucketed meta-blocking + pair-join verify stages (``emit_counts`` keeps
    every pair with integer inter/uni); fields attach via two partitioned
    hash joins onto the pair set (the corpus never ships); the 8 sufficient
    statistics contract map-side to one row per batch; and scoring is a
    pure 8-entry table lookup by packed agreement pattern — weights depend
    only on the 3 bits, so the per-pair pass is one vectorized gather."""
    from ..stages.blocking import meta_blocking_pairs
    from ..stages.dedup import ngram_jaccard_verify

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    texts = docs.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "text": b["text"]}), batch_format="pyarrow"
    )
    cands = meta_blocking_pairs(texts, n=3, min_block=2, max_block=20, min_shared=2).map_batches(
        lambda b: pa.table({"a_id": b["doc_a"], "b_id": b["doc_b"]}), batch_format="pyarrow"
    )
    # carry_cols rides the comparison fields through the verify's OWN two
    # hash joins — the pair set is joined exactly once per side, not twice
    # (measured 15.8 s → the join pair dropped at sf0.1's 110k pairs)
    scored = ngram_jaccard_verify(
        cands, docs, threshold=0.0, emit_counts=True, carry_cols=("lang", "source", "n_chars")
    )
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "agree_lang": pa.array([], pa.int64()),
            "agree_source": pa.array([], pa.int64()),
            "agree_len": pa.array([], pa.int64()),
            "is_match": pa.array([], pa.int64()),
        }
    )
    def compare(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        inter = np.asarray(b["inter"], dtype=np.int64)
        uni = np.asarray(b["uni"], dtype=np.int64)
        lb_a = pc.divide(pc.cast(b["a_n_chars"], pa.int64()), pa.scalar(64, pa.int64()))
        lb_b = pc.divide(pc.cast(b["b_n_chars"], pa.int64()), pa.scalar(64, pa.int64()))
        return pa.table(
            {
                "doc_a": b["a_id"],
                "doc_b": b["b_id"],
                "agree_lang": pc.cast(pc.equal(b["a_lang"], b["b_lang"]), pa.int64()),
                "agree_source": pc.cast(pc.equal(b["a_source"], b["b_source"]), pa.int64()),
                "agree_len": pc.cast(pc.equal(lb_a, lb_b), pa.int64()),
                "is_match": pa.array((10 * inter >= 7 * uni).astype(np.int64)),
            }
        )

    pairs = scored.map_batches(compare, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        return empty.append_column("weight_ppm", pa.array([], pa.int64()))

    def stat_partial(b: pa.Table) -> pa.Table:
        m = np.asarray(b["is_match"], dtype=np.int64)
        cols = {"n_m": int(m.sum()), "n_u": int(len(m) - m.sum())}
        for k in ("agree_lang", "agree_source", "agree_len"):
            a = np.asarray(b[k], dtype=np.int64)
            cols[f"am_{k}"] = int((m * a).sum())
            cols[f"au_{k}"] = int(((1 - m) * a).sum())
        return pa.table({c: pa.array([v], pa.int64()) for c, v in cols.items()})

    st = pairs.map_batches(stat_partial, batch_format="pyarrow").to_pandas().sum()
    n_m, n_u = int(st["n_m"]), int(st["n_u"])
    fields = ["agree_lang", "agree_source", "agree_len"]
    am = [int(st[f"am_{k}"]) for k in fields]
    au = [int(st[f"au_{k}"]) for k in fields]

    wtab = np.array(_fs_pattern_weights(n_m, n_u, am, au), dtype=np.int64)

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty.append_column("weight_ppm", pa.array([], pa.int64()))
        idx = (
            4 * np.asarray(b["agree_lang"], dtype=np.int64)
            + 2 * np.asarray(b["agree_source"], dtype=np.int64)
            + np.asarray(b["agree_len"], dtype=np.int64)
        )
        return b.append_column("weight_ppm", pa.array(wtab[idx]))

    return pairs.map_batches(score, batch_format="pyarrow")


def events_user_day_interp(sf_dir: str):
    """Per-user resampling to a fixed daily grid with EXACT integer linear
    interpolation — the time-series alignment primitive (join-ready panel
    from irregular event times): for every midnight g inside a user's
    [first_ts, last_ts], value = (v0·(t1−g) + v1·(g−t0)) // (t1−t0) between
    the bracketing observations, in pure int64 µs/cents arithmetic.  The
    non-negative weighted form keeps numerator ≥ 0, so numpy floor division
    and DuckDB's truncating ``//`` agree BY CONSTRUCTION — negative cents
    RAISE (the TWAP convention) and the cents×span product is range-checked
    where the oracle's BIGINT multiply would raise.  Duplicate (user, ts)
    observations collapse to the max-event_id row (latest-write-wins,
    replayed by the oracle's row_number).  Engine: ONE bucketed-run exchange
    (``grouped_ordered_runs``), grid expansion by cumsum/arange, brackets by
    ONE composite-key searchsorted across all runs (run_idx·span + t — the
    segmented-searchsorted trick, bound-checked), zero per-user Python.
    A grid midnight equal to an observation returns that observation
    exactly (off = 0); g = last_ts uses the degenerate [t, t+1) interval —
    same off = 0.  Output rows ∝ users × days, never events."""
    from ..stages.windows import grouped_ordered_runs

    DAY = 86_400_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts", "value", "event_id"]).map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "t": pc.cast(b["ts"], pa.int64()),
                "event_id": b["event_id"],
                "c": _cents(b["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "grid_ts": pa.array([], pa.timestamp("us")),
            "value_c": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return empty
        users = np.asarray(g["user_id"], dtype=np.int64)
        t = np.asarray(g["t"], dtype=np.int64)
        c = np.asarray(g["c"], dtype=np.int64)
        if (c < 0).any():
            raise ValueError(
                "events_user_day_interp: negative cents — floor/trunc division "
                "would disagree between engine and oracle (TWAP convention)"
            )
        n = len(t)
        # latest-write-wins per (user, ts): rows are sorted by (user, t,
        # event_id), so keep the LAST of each equal (user, t) group
        keep = np.ones(n, dtype=bool)
        keep[:-1] = (users[1:] != users[:-1]) | (t[1:] != t[:-1])
        users, t, c = users[keep], t[keep], c[keep]
        n = len(t)
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]]).astype(np.int64)
        ends = np.r_[starts[1:], n].astype(np.int64)
        lo, hi = t[starts], t[ends - 1]
        g0 = (lo + DAY - 1) // DAY
        g1 = hi // DAY
        counts = np.maximum(g1 - g0 + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        run_of = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        gridt = (g0[run_of] + (np.arange(total, dtype=np.int64) - offs[run_of])) * DAY
        # composite segmented searchsorted: run_idx*span + (t - base)
        base = int(t.min())
        span = int(t.max()) - base + 1
        if len(starts) * span >= 2**63 or int(c.max(initial=0)) * span >= 2**63:
            raise ValueError(
                "events_user_day_interp: composite key or lerp product exceeds "
                "int64 (the oracle's BIGINT arithmetic raises on the same data)"
            )
        run_of_row = np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)
        comp_t = run_of_row * span + (t - base)
        comp_g = run_of * span + (gridt - base)
        pos = np.searchsorted(comp_t, comp_g, side="right") - 1
        is_last = pos == ends[run_of] - 1
        t0, v0 = t[pos], c[pos]
        nxt = np.where(is_last, pos, pos + 1)
        t1 = np.where(is_last, t0 + 1, t[nxt])
        v1 = np.where(is_last, v0, c[nxt])
        val = (v0 * (t1 - gridt) + v1 * (gridt - t0)) // (t1 - t0)
        return pa.table(
            {
                "user_id": pa.array(users[starts][run_of]),
                "grid_ts": pc.cast(pa.array(gridt), pa.timestamp("us")),
                "value_c": pa.array(val),
            }
        )

    return grouped_ordered_runs(ds, "user_id", ("t", "event_id"), kernel)


def docs_canopy_assign(sf_dir: str):
    """Canopy-clustering assignment (McCallum et al., KDD'00) with a
    deterministic cheap distance: every document joins the canopy of its
    RAREST token — min (df, token) — plus the canopy's member count.  Rare
    terms are discriminative, so canopies are the classic cheap blocking
    prior for an expensive within-canopy stage (df = 1 ⇒ singleton canopy,
    no pair work at all); the assignment is a pure function of the corpus,
    so retries and re-partitions reproduce it exactly.  Engine
    (``stages/vocab.canopy_assignments``): broadcast df table (counted
    RAISE above 20M entries — prune by df floor first), per-doc argmin
    entirely MAP-SIDE (documents are whole rows: no doc-keyed exchange
    exists), canopy sizes via map-side (token, count) cells into one
    canopy-scale groupby, sizes gathered back by a second broadcast.  Tie
    order is binary string order = numpy code-point order on this corpus's
    ASCII tokens (the band-key caveat class, documented)."""
    from ..stages.vocab import canopy_assignments

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return canopy_assignments(ds)


DBSCAN_MIN_PTS = 5  # core ⟺ |N_eps| ≥ 5 counting itself ⟺ degree ≥ 4


def docs_dbscan_clusters(sf_dir: str):
    """DBSCAN-style density clustering over the candidate graph — the
    production alternative to plain transitive closure, which over-merges
    through ONE accidental bridge pair: here only CORE documents (≥
    ``DBSCAN_MIN_PTS``−1 = 4 eps-neighbors) propagate connectivity, border
    documents attach to their minimum core-neighbor's cluster without
    extending it, and everything else is noise.  eps-neighborhood = exact
    char-trigram Jaccard ≥ 0.5 as the integer rule 2·inter ≥ uni (no float
    boundary) over the meta-blocking candidate pairs — density over the
    CANDIDATE graph, the honest production semantics (blocking bounds
    recall before density does).  Engine: the existing bucketed
    meta-blocking + pair-join verify produce the edge set; degree is one
    endpoint-emit groupby; core-core edges feed the existing min-label
    closure (``cluster_nodes``, so cluster_id = min core doc_id); border
    labels are one groupby-min over (non-core, core-neighbor) rows with the
    core label gathered by broadcast; the final role/label assemble is one
    map over the corpus with the (small, cluster-member-scale) core and
    border tables broadcast — at web scale those broadcasts become the
    partitioned joins the linkage pipeline already uses, noted not hidden.
    Border ties (adjacent to several clusters) break to the MINIMUM label —
    deterministic where textbook DBSCAN is visit-order dependent.  Output:
    (doc_id, role ∈ core/border/noise, cluster_id; noise = −1)."""
    import ray

    from ..stages.blocking import meta_blocking_pairs
    from ..stages.dedup import ngram_jaccard_verify

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    cands = meta_blocking_pairs(docs, n=3, min_block=2, max_block=20, min_shared=2).map_batches(
        lambda b: pa.table({"a_id": b["doc_a"], "b_id": b["doc_b"]}), batch_format="pyarrow"
    )
    scored = ngram_jaccard_verify(cands, docs, threshold=0.0, emit_counts=True)
    edges = scored.map_batches(
        lambda b: b.filter(
            pc.greater_equal(pc.multiply(b["inter"], pa.scalar(2, pa.int64())), b["uni"])
        ).select(["a_id", "b_id"]),
        batch_format="pyarrow",
    ).materialize()

    def deg_emit(b: pa.Table) -> pa.Table:
        v = np.concatenate(
            [np.asarray(b["a_id"], dtype=np.int64), np.asarray(b["b_id"], dtype=np.int64)]
        )
        u, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u), "d_p": pa.array(cnt.astype(np.int64))})

    deg = (
        edges.map_batches(deg_emit, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("d_p", alias_name="d"))
        .to_pandas()
    )
    if len(deg) and "v" in deg.columns:
        dv = deg["v"].to_numpy().astype(np.int64)
        dd = deg["d"].to_numpy().astype(np.int64)
    else:  # edge-free corpus: no cores, everything is noise
        dv = dd = np.array([], np.int64)
    core_ids = np.sort(dv[dd >= DBSCAN_MIN_PTS - 1])
    core_ref = ray.put(core_ids)

    def _is_core(a: np.ndarray) -> np.ndarray:
        c = ray.get(core_ref)
        pos = np.searchsorted(c, a)
        return (pos < len(c)) & (c[np.minimum(pos, len(c) - 1)] == a)

    cc_edges = edges.map_batches(
        lambda b: b.filter(
            pa.array(
                _is_core(np.asarray(b["a_id"], dtype=np.int64))
                & _is_core(np.asarray(b["b_id"], dtype=np.int64))
            )
        ),
        batch_format="pyarrow",
    )
    core_docs = docs.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"].filter(pa.array(_is_core(np.asarray(b["doc_id"], dtype=np.int64))))}
        ),
        batch_format="pyarrow",
    )
    clab = pa.Table.from_pandas(
        _verified_cluster_labels(core_docs, cc_edges).to_pandas(), preserve_index=False
    )
    lab_ids = np.asarray(clab["doc_id"], dtype=np.int64)
    lab_order = np.argsort(lab_ids)
    lab_ids = lab_ids[lab_order]
    lab_vals = np.asarray(clab["cluster_id"], dtype=np.int64)[lab_order]
    lab_ref = ray.put((lab_ids, lab_vals))

    def border_emit(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a_id"], dtype=np.int64)
        bb = np.asarray(b["b_id"], dtype=np.int64)
        u = np.concatenate([a, bb])
        v = np.concatenate([bb, a])
        m = ~_is_core(u) & _is_core(v)
        u, v = u[m], v[m]
        li, lv = ray.get(lab_ref)
        lbl = lv[np.searchsorted(li, v)]
        return pa.table({"doc_id": pa.array(u), "b_p": pa.array(lbl)})

    border = (
        edges.map_batches(border_emit, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("b_p", alias_name="b_lbl"))
        .to_pandas()
    )
    if len(border) and "doc_id" in border.columns:
        b_ids = border["doc_id"].to_numpy().astype(np.int64)
        b_order = np.argsort(b_ids)
        b_ids, b_vals = b_ids[b_order], border["b_lbl"].to_numpy().astype(np.int64)[b_order]
    else:  # no border docs (e.g. every neighbor of a core is itself core)
        b_ids = b_vals = np.array([], np.int64)
    b_ref = ray.put((b_ids, b_vals))

    def assemble(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"], dtype=np.int64)
        li, lv = ray.get(lab_ref)
        bi, bv = ray.get(b_ref)
        is_core = _is_core(d)
        pos_b = np.searchsorted(bi, d)
        is_border = (pos_b < len(bi)) & (bi[np.minimum(pos_b, max(len(bi) - 1, 0))] == d) if len(bi) else np.zeros(len(d), bool)
        cluster = np.full(len(d), -1, dtype=np.int64)
        if len(li):
            pos_l = np.searchsorted(li, d)
            hit = (pos_l < len(li)) & (li[np.minimum(pos_l, len(li) - 1)] == d)
            cluster[hit & is_core] = lv[pos_l[hit & is_core]]
        if len(bi):
            cluster[is_border] = bv[pos_b[is_border]]
        role = np.where(is_core, "core", np.where(is_border, "border", "noise"))
        return pa.table(
            {
                "doc_id": pa.array(d),
                "role": pa.array(role.astype(object), pa.string()),
                "cluster_id": pa.array(cluster),
            }
        )

    return docs.map_batches(assemble, batch_format="pyarrow")


def events_user_load_gini(sf_dir: str):
    """Gini coefficient of per-user event load in exact permille — the
    load-balance / skew audit a partitioning engineer reads before keying a
    shuffle by user (G = 0 ⇒ uniform keys; G → 1 ⇒ one hot user dominates,
    time to salt).  Exact integers throughout: with the per-user counts
    histogram (count c → m users) sorted by c, the rank-weighted sum over
    the ascending order telescopes to Σ_c c·(m·P + m(m+1)/2) where P is the
    cumulative user count below c — so NO row-scale sort exists, the
    exchange is ∝ distinct count values (the blocking-skew contraction),
    and G = (2·S1 − (n+1)·S) · 1000 // (n·S) replays exactly (all terms
    non-negative, floor = trunc on both sides).  Driver math in
    arbitrary-precision Python ints, range-checked into int64 where the
    oracle's HUGEINT→BIGINT cast raises.  Output: one row (n_users,
    total_events, gini_permille)."""
    ds = _t(sf_dir, "events", ["user_id"])
    empty_u = pa.table({"user_id": pa.array([], pa.int64()), "c_p": pa.array([], pa.int64())})

    def per_user(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_u
        u, cnt = np.unique(np.asarray(b["user_id"], dtype=np.int64), return_counts=True)
        return pa.table({"user_id": pa.array(u), "c_p": pa.array(cnt.astype(np.int64))})

    counts = (
        ds.map_batches(per_user, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("c_p", alias_name="c"))
    )
    empty_h = pa.table({"c": pa.array([], pa.int64()), "m_p": pa.array([], pa.int64())})

    def hist_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_h
        c, m = np.unique(np.asarray(b["c"], dtype=np.int64), return_counts=True)
        return pa.table({"c": pa.array(c), "m_p": pa.array(m.astype(np.int64))})

    hist = (
        counts.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("m_p", alias_name="m"))
        .to_pandas()
    )
    if len(hist) == 0:
        raise ValueError("events_user_load_gini: empty events table")
    hist = hist.sort_values("c")
    s1 = s = n = 0
    p = 0
    for c, m in zip(hist["c"].astype(int), hist["m"].astype(int)):
        s1 += c * (m * p + m * (m + 1) // 2)
        s += c * m
        n += m
        p += m
    num = 1000 * (2 * s1 - (n + 1) * s)
    if num >= 2**127 or n * s >= 2**127:
        raise ValueError(
            "events_user_load_gini: HUGEINT overflow in the Gini numerator "
            "(the oracle raises on the same data)"
        )
    gini = num // (n * s)
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "total_events": pa.array([s], pa.int64()),
            "gini_permille": pa.array([gini], pa.int64()),
        }
    )


def docs_fold_leakage_audit(sf_dir: str):
    """Cross-fold contamination audit: the (fold_a, fold_b) contingency of
    verified near-duplicate pairs over the stratified 5-fold assignment —
    every off-diagonal cell is LEAKAGE (a near-dup straddling train and
    eval folds inflates eval), which is precisely what the CLUSTER-level
    `docs_split_leakage_safe` assignment exists to prevent; this query
    QUANTIFIES the damage the row-level split does, so the two are the
    audit and the fix.  Pairs are the ER chain's verified set (meta-blocking
    candidates, exact trigram Jaccard ≥ 0.7 as the integer rule 10·inter ≥
    7·uni); folds are `docs_stratified_folds`' pure-function assignment,
    gathered onto pair endpoints by broadcast (doc-scale table — the
    partitioned-join fallback is the linkage pipeline's, noted); cells
    normalize to fold_a ≤ fold_b and contract map-side into ONE ≤ 15-row
    groupby.  The oracle COMPOSES the registered stratified-folds oracle
    verbatim (the RRF convention: composed queries cannot drift apart)."""
    import ray

    from ..stages.blocking import meta_blocking_pairs
    from ..stages.dedup import ngram_jaccard_verify

    folds_tbl = docs_stratified_folds(sf_dir)
    f_ids = np.asarray(folds_tbl["doc_id"], dtype=np.int64)
    f_order = np.argsort(f_ids)
    f_ids = f_ids[f_order]
    f_vals = np.asarray(folds_tbl["fold"], dtype=np.int64)[f_order]
    f_ref = ray.put((f_ids, f_vals))

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    cands = meta_blocking_pairs(docs, n=3, min_block=2, max_block=20, min_shared=2).map_batches(
        lambda b: pa.table({"a_id": b["doc_a"], "b_id": b["doc_b"]}), batch_format="pyarrow"
    )
    scored = ngram_jaccard_verify(cands, docs, threshold=0.0, emit_counts=True)
    empty = pa.table(
        {
            "fold_a": pa.array([], pa.int64()),
            "fold_b": pa.array([], pa.int64()),
            "n_p": pa.array([], pa.int64()),
        }
    )

    def cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        keep = (
            10 * np.asarray(b["inter"], dtype=np.int64) >= 7 * np.asarray(b["uni"], dtype=np.int64)
        )
        a = np.asarray(b["a_id"], dtype=np.int64)[keep]
        bb = np.asarray(b["b_id"], dtype=np.int64)[keep]
        if len(a) == 0:
            return empty
        fi, fv = ray.get(f_ref)
        fa = fv[np.searchsorted(fi, a)]
        fb = fv[np.searchsorted(fi, bb)]
        lo, hi = np.minimum(fa, fb), np.maximum(fa, fb)
        key = lo * 8 + hi
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "fold_a": pa.array(u // 8),
                "fold_b": pa.array(u % 8),
                "n_p": pa.array(cnt.astype(np.int64)),
            }
        )

    out = (
        scored.map_batches(cells, batch_format="pyarrow")
        .groupby(["fold_a", "fold_b"])
        .aggregate(Sum("n_p", alias_name="n_pairs"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def docs_fs_calibration(sf_dir: str):
    """Reliability table for the Fellegi–Sunter scorer: per distinct
    weight_ppm (≤ 8 rows — weights are a pure function of the 3 agreement
    bits) the pair count, verified-match count, and empirical precision in
    permille — the calibration read a linkage engineer does before picking
    the review threshold (a well-calibrated scorer has precision rising
    with weight; this table IS that check).  The engine reruns the
    registered FS query unchanged and contracts map-side to (weight, n, m)
    cells into ONE ≤ 8-row groupby; the oracle COMPOSES the registered FS
    oracle verbatim, so the calibration can never drift from the scorer."""
    fs = docs_fs_match_weights(sf_dir)
    empty = pa.table(
        {
            "weight_ppm": pa.array([], pa.int64()),
            "n_p": pa.array([], pa.int64()),
            "m_p": pa.array([], pa.int64()),
        }
    )

    def cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        w = np.asarray(b["weight_ppm"], dtype=np.int64)
        m = np.asarray(b["is_match"], dtype=np.int64)
        u, inv = np.unique(w, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        mm = np.bincount(inv, weights=m).astype(np.int64)
        return pa.table({"weight_ppm": pa.array(u), "n_p": pa.array(n), "m_p": pa.array(mm)})

    g = (
        fs.map_batches(cells, batch_format="pyarrow")
        .groupby("weight_ppm")
        .aggregate(Sum("n_p", alias_name="n_pairs"), Sum("m_p", alias_name="n_matches"))
        .to_pandas()
    )
    g = g.sort_values("weight_ppm")
    return pa.table(
        {
            "weight_ppm": pa.array(g["weight_ppm"].astype(int), pa.int64()),
            "n_pairs": pa.array(g["n_pairs"].astype(int), pa.int64()),
            "n_matches": pa.array(g["n_matches"].astype(int), pa.int64()),
            "precision_permille": pa.array(
                [1000 * int(m) // int(n) for m, n in zip(g["n_matches"], g["n_pairs"])],
                pa.int64(),
            ),
        }
    )


def docs_nearest_neighbor(sf_dir: str):
    """Per-document nearest neighbor among its blocking candidates — the ER
    review-queue primitive (each record's single best match with its exact
    similarity, the table a human adjudicator or an auto-merge threshold
    reads).  Ranking key is the exact char-trigram Jaccard as a FLOOR
    permille (1000·inter // uni) with ties to the smallest neighbor id —
    the permille IS the declared order (documented: not the infinite-
    precision rational, whose cross-multiplication compare SQL's
    row_number cannot replay cheaply), identical on both sides.  Engine:
    the meta-blocking + pair-join verify pair set emits BOTH orientations
    with integer (inter, uni), then ONE bucketed-run exchange keyed by
    doc_id (sorted by (−permille, nbr)) takes each run head — argmax with
    zero per-doc Python.  Docs with no candidates are absent by design
    (nothing to review)."""
    from ..stages.blocking import meta_blocking_pairs
    from ..stages.dedup import ngram_jaccard_verify
    from ..stages.windows import grouped_ordered_runs

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    cands = meta_blocking_pairs(docs, n=3, min_block=2, max_block=20, min_shared=2).map_batches(
        lambda b: pa.table({"a_id": b["doc_a"], "b_id": b["doc_b"]}), batch_format="pyarrow"
    )
    scored = ngram_jaccard_verify(cands, docs, threshold=0.0, emit_counts=True)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "nbr": pa.array([], pa.int64()),
            "neg_p": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64()),
        }
    )

    def orient(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        a = np.asarray(b["a_id"], dtype=np.int64)
        bb = np.asarray(b["b_id"], dtype=np.int64)
        inter = np.asarray(b["inter"], dtype=np.int64)
        uni = np.asarray(b["uni"], dtype=np.int64)
        p = 1000 * inter // np.maximum(uni, 1)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, bb])),
                "nbr": pa.array(np.concatenate([bb, a])),
                "neg_p": pa.array(np.concatenate([-p, -p])),
                "inter": pa.array(np.concatenate([inter, inter])),
                "uni": pa.array(np.concatenate([uni, uni])),
            }
        )

    both = scored.map_batches(orient, batch_format="pyarrow")
    out_empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "nbr_id": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64()),
            "jaccard_permille": pa.array([], pa.int64()),
        }
    )

    def head(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        if g.num_rows == 0:
            return out_empty
        idx = pa.array(starts)
        return pa.table(
            {
                "doc_id": pc.take(g["doc_id"], idx),
                "nbr_id": pc.take(g["nbr"], idx),
                "inter": pc.take(g["inter"], idx),
                "uni": pc.take(g["uni"], idx),
                "jaccard_permille": pa.array(
                    -np.asarray(pc.take(g["neg_p"], idx), dtype=np.int64)
                ),
            }
        )

    return grouped_ordered_runs(both, "doc_id", ("neg_p", "nbr"), head)


def docs_best_match_clusters(sf_dir: str):
    """Best-first matching clusters: connected components of the
    nearest-neighbor digraph (every doc contributes exactly ONE undirected
    edge, doc → its best candidate from ``docs_nearest_neighbor``) — the
    third clustering semantics in the suite, between transitive closure
    (merges through ANY verified pair, over-merge prone) and DBSCAN (only
    dense cores merge): best-first merges through strongest-available
    evidence only, yielding star/chain components whose size is bounded by
    mutual-best structure rather than by block size — a Borůvka-style
    first round, the classic ER "best match wins" policy.  Engine: the
    registered nearest-neighbor query runs unchanged; its ≤ n edges feed
    the existing min-label closure (``_verified_cluster_labels``), so
    cluster_id = min member id.  Oracle COMPOSES the nearest-neighbor
    oracle verbatim into the recursive closure."""
    nn = docs_nearest_neighbor(sf_dir).materialize()  # consumed twice below
    edges = nn.map_batches(
        lambda b: pa.table({"a_id": b["doc_id"], "b_id": b["nbr_id"]}), batch_format="pyarrow"
    )
    members = nn.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pa.array(
                    np.unique(
                        np.concatenate(
                            [
                                np.asarray(b["doc_id"], dtype=np.int64),
                                np.asarray(b["nbr_id"], dtype=np.int64),
                            ]
                        )
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    return pa.Table.from_pandas(
        _verified_cluster_labels(members, edges).to_pandas(), preserve_index=False
    )


def events_survival_curve(sf_dir: str):
    """Kaplan–Meier retention survival curve in exact integers — the
    product-analytics primitive for "how long do users stay": a user churns
    on their LAST event day; at each day t the hazard is churned_t /
    at_risk_t (at_risk = users whose last day ≥ t, a suffix sum) and the
    survival estimate is the running product S_t = S_{t−1}·(at_risk −
    churned) // at_risk, seeded at 10⁶ ppm, with FLOOR at every step — the
    per-step floor makes the sequential product exactly replayable (a
    recursive scalar CTE in the oracle; all terms non-negative so floor =
    trunc).  Engine: ONE user-scale groupby (max ts per user) contracts the
    corpus to per-user last days, a day-scale histogram groupby follows, and
    the ≤ distinct-days driver loop (30 here; bounded by the calendar, not
    the data) runs the product.  Output per day: (day epoch-days, at_risk,
    churned, survival_ppm)."""
    DAY = 86_400_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": b["user_id"], "t": pc.cast(b["ts"], pa.int64())}
        )

    last = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("t", alias_name="t_max"))
    )
    empty_h = pa.table({"d": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())})

    def day_cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_h
        d = np.asarray(b["t_max"], dtype=np.int64) // DAY
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(u), "n_p": pa.array(cnt.astype(np.int64))})

    hist = (
        last.map_batches(day_cells, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("n_p", alias_name="churned"))
        .to_pandas()
    )
    if len(hist) == 0:
        raise ValueError("events_survival_curve: empty events table")
    hist = hist.sort_values("d").reset_index(drop=True)
    churned = hist["churned"].astype(int).tolist()
    total = sum(churned)
    at_risk, acc = [], total
    for c in churned:
        at_risk.append(acc)
        acc -= c
    s, surv = 10**6, []
    for c, n in zip(churned, at_risk):
        s = s * (n - c) // n
        surv.append(s)
    return pa.table(
        {
            "day": pa.array(hist["d"].astype(int), pa.int64()),
            "at_risk": pa.array(at_risk, pa.int64()),
            "churned": pa.array(churned, pa.int64()),
            "survival_ppm": pa.array(surv, pa.int64()),
        }
    )


def events_table_checksum(sf_dir: str):
    """Order-independent MULTISET checksum per event_type — the
    table-equality primitive that verifies a 100-TB copy / resume / migration
    without sorting either side: each row folds its integer content through
    a 4-stage splitmix64 chain (event_id → ⊕ts → ⊕user → ⊕cents, each
    re-mixed so field transpositions change the hash) and the per-type
    checksum is the SUM of row hashes mod 2⁶⁴ — commutative and
    associative, so it is invariant to row order, partitioning, and batch
    boundaries BY CONSTRUCTION (the property the tests pin), while any
    single-row change flips it.  Strings stay out of the row hash by
    design: the GROUP BY carries event_type itself, so no string-hash
    function needs a SQL twin.  Engine shape: map-side per-type partial
    sums in wrapping uint64 (mod-2⁶⁴ is numpy's native overflow), cells =
    types × batches rows folded to the final mod-2⁶⁴ sum in Python ints on
    the driver; emitted as the signed two's-complement int64 view (the
    epoch-shuffle convention).  Oracle: the same 4-stage HUGEINT chain,
    sum % 2⁶⁴, signed fold — a 1e12-row sum of 2⁶⁴-bounded terms is
    ~1.8e31, comfortably inside HUGEINT."""
    from ..stages.sketches import splitmix64

    ds = _t(sf_dir, "events", ["event_type", "event_id", "ts", "user_id", "value"])
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "sum_p": pa.array([], pa.int64()),
            "n_p": pa.array([], pa.int64()),
        }
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        ev = np.asarray(b["event_id"], dtype=np.int64).view(np.uint64)
        ts = np.asarray(pc.cast(b["ts"], pa.int64()), dtype=np.int64).view(np.uint64)
        us = np.asarray(b["user_id"], dtype=np.int64).view(np.uint64)
        ce = np.asarray(_cents(b["value"]), dtype=np.int64).view(np.uint64)
        h = splitmix64(ev)
        h = splitmix64(h ^ ts)
        h = splitmix64(h ^ us)
        h = splitmix64(h ^ ce)
        t = b["event_type"].to_numpy(zero_copy_only=False)
        ut, inv = np.unique(t, return_inverse=True)
        sums = np.zeros(len(ut), dtype=np.uint64)
        np.add.at(sums, inv, h)  # wraps mod 2^64 — numpy's native uint64 overflow
        return pa.table(
            {
                "event_type": pa.array(ut, pa.string()),
                "sum_p": pa.array(sums.view(np.int64)),
                "n_p": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    cells = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg: dict[str, list[int]] = {}
    for t, sp, n in zip(cells["event_type"], cells["sum_p"], cells["n_p"]):
        cur = agg.setdefault(str(t), [0, 0])
        cur[0] = (cur[0] + (int(sp) & 0xFFFFFFFFFFFFFFFF)) & 0xFFFFFFFFFFFFFFFF
        cur[1] += int(n)
    types = sorted(agg)
    csums = [agg[t][0] - 2**64 if agg[t][0] >= 2**63 else agg[t][0] for t in types]
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_rows": pa.array([agg[t][1] for t in types], pa.int64()),
            "checksum": pa.array(csums, pa.int64()),
        }
    )


def events_type_hour_chi2(sf_dir: str):
    """Chi-square independence scan between event_type and hour-of-day —
    the feature-leakage / drift diagnostic run before a column is trusted as
    a model feature: χ² = Σ_cells (O−E)²/E over the FULL T×H grid (zero
    cells contribute E = R·C/n — forgetting them understates dependence), in
    EXACT integers: per cell (nO−RC)²·1000 // (nRC), summed (floor per cell,
    identical on both sides; the raw products exceed int64 at row scale so
    the ≤ T×24 grid is combined in arbitrary-precision Python ints and only
    the OUTPUT is range-checked into int64 — the oracle runs the same cells
    in HUGEINT and casts at the end).  Distributed shape: one map-side
    (type, hour, count) contraction (bincount over type-code×24+hour), ONE
    dimension-sized groupby, driver math over ≤ types×24 cells.  Marginals
    come from observed rows so R > 0 and C > 0 by construction (no division
    by zero); df = (T−1)(H−1) ships alongside so the caller can look up the
    critical value."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "hour": pa.array([], pa.int64()),
            "o_p": pa.array([], pa.int64()),
        }
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        h = np.asarray(pc.hour(b["ts"]), dtype=np.int64)
        t = b["event_type"].to_numpy(zero_copy_only=False)
        ut, inv = np.unique(t, return_inverse=True)
        code = inv * 24 + h
        cnt = np.bincount(code, minlength=len(ut) * 24).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "event_type": pa.array(ut[nz // 24], pa.string()),
                "hour": pa.array(nz % 24, pa.int64()),
                "o_p": pa.array(cnt[nz], pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("o_p", alias_name="o"))
        .to_pandas()
    )
    if len(cells) == 0:
        raise ValueError("events_type_hour_chi2: empty events table")
    obs: dict[tuple[str, int], int] = {
        (str(t), int(h)): int(o)
        for t, h, o in zip(cells["event_type"], cells["hour"], cells["o"])
    }
    types = sorted({k[0] for k in obs})
    hours = sorted({k[1] for k in obs})
    r = {t: sum(v for (tt, _), v in obs.items() if tt == t) for t in types}
    c = {h: sum(v for (_, hh), v in obs.items() if hh == h) for h in hours}
    n = sum(obs.values())
    chi2_milli = 0
    for t in types:  # ≤ types×24 cells — dimension-sized by design
        for h in hours:
            o = obs.get((t, h), 0)
            d = n * o - r[t] * c[h]
            chi2_milli += (1000 * d * d) // (n * r[t] * c[h])
    if chi2_milli >= 2**63:
        raise ValueError("events_type_hour_chi2: chi2_milli overflows int64")
    return pa.table(
        {
            "n_events": pa.array([n], pa.int64()),
            "n_types": pa.array([len(types)], pa.int64()),
            "n_hours": pa.array([len(hours)], pa.int64()),
            "df": pa.array([(len(types) - 1) * (len(hours) - 1)], pa.int64()),
            "chi2_milli": pa.array([chi2_milli], pa.int64()),
        }
    )


def events_value_hour_corr(sf_dir: str):
    """Distributed Pearson correlation from SUFFICIENT STATISTICS: per
    event_type, corr(value, hour-of-day) where every moment (Σx, Σy, Σx²,
    Σy², Σxy, n) is an exact int64 map-side partial (value in cents, hour
    0-23) — one tiny groupby merges them and the closed-form formula runs
    once per group.  NOT DuckDB's incremental ``corr()`` (different float
    path); the oracle replays the same integer-moment formula, so the
    final sqrt/divide is the only float arithmetic and is bit-identical."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]},
                }
            )
        x = np.asarray(_cents(b["value"]), dtype=np.int64)
        y = np.asarray(pc.hour(b["ts"]), dtype=np.int64)
        g = b["event_type"].to_numpy(zero_copy_only=False)
        ug, inv = np.unique(g, return_inverse=True)
        from ..functions.numeric import group_sums_int64

        # exact int64 moments (cents² ≈ 1e10/row crosses float53 around 1e6
        # rows/group/batch — round-3 ADVICE item 1)
        sx, sy, sxx, syy, sxy = group_sums_int64(
            inv, len(ug), x, y, x * x, y * y, x * y
        )
        return pa.table(
            {
                "event_type": pa.array(ug, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "sx": pa.array(sx),
                "sy": pa.array(sy),
                "sxx": pa.array(sxx),
                "syy": pa.array(syy),
                "sxy": pa.array(sxy),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]])
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    # Covariance terms in PYTHON INTS (exact, like the oracle's BIGINT —
    # which would RAISE past 2⁶³ where a float64 product would silently
    # round); the float conversion then mirrors SQL's CAST(… AS DOUBLE).
    rs = []
    for i in range(tbl.num_rows):
        n_i, sx_i, sy_i = (int(tbl[c][i].as_py()) for c in ("n", "sx", "sy"))
        sxx_i, syy_i, sxy_i = (int(tbl[c][i].as_py()) for c in ("sxx", "syy", "sxy"))
        vxx = n_i * sxx_i - sx_i * sx_i
        vyy = n_i * syy_i - sy_i * sy_i
        num = n_i * sxy_i - sx_i * sy_i
        if vxx > 0 and vyy > 0:
            rs.append(float(num) / (np.sqrt(float(vxx)) * np.sqrt(float(vyy))))
        else:
            rs.append(0.0)
    return pa.table(
        {
            "event_type": tbl["event_type"],
            "r": _round_col(pa.array(np.array(rs, dtype=np.float64)), 6),
        }
    )


def events_minute_rate_ewma(sf_dir: str):
    """Exact EWMA (α = 1/2) over the per-minute event-count series — the
    time-series-smoothing family.  The heavy part (per-minute counts) is an
    ordinary map-side-combined groupby; the smoothing recurrence runs once
    over the TIME-bounded series (rows ∝ minutes of history, not events).
    α = 1/2 makes every step a halving, exact in binary float64 on both
    sides, so the recursive-CTE oracle matches bit-for-bit."""
    MIN_US = 60_000_000
    ds = _t(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        m = np.asarray(pc.cast(b["ts"], pa.int64()), dtype=np.int64) // MIN_US
        um, inv = np.unique(m, return_inverse=True)
        return pa.table(
            {"minute": pa.array(um), "n_partial": pa.array(np.bincount(inv).astype(np.int64))}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("minute")
        .aggregate(Sum("n_partial", alias_name="n"))
        .to_pandas()
        .sort_values("minute", kind="stable")
    )
    mins = counts["minute"].to_numpy(dtype=np.int64)
    ns = counts["n"].to_numpy(dtype=np.float64)
    ew = np.empty(len(ns), dtype=np.float64)
    acc = 0.0
    first = True
    for i, v in enumerate(ns):  # time-bounded series: rows ∝ minutes, not events
        acc = v if first else (acc + v) * 0.5
        first = False
        ew[i] = acc
    return pa.table(
        {
            "minute": pa.array(mins),
            "n": pa.array(ns.astype(np.int64)),
            "ewma": pa.array(ew),
        }
    )


def events_value_mad(sf_dir: str):
    """Grouped MAD (median absolute deviation — the robust-statistics
    staple): median from one integer-cell histogram, then a SECOND histogram
    pass over |cents − group-median| (medians broadcast as a dict) gives
    MAD — two bounded map-side-combined passes, shuffle ∝ distinct cells,
    everything integer until the final /100.  ``quantile_disc`` rank
    semantics on both passes (rank = ceil(n/2)), replayed by the oracle."""
    import ray

    from ..stages.quantiles import grouped_cell_histogram

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def disc_median(hist: pa.Table) -> dict:
        groups = hist["event_type"].to_numpy(zero_copy_only=False)
        cells = np.asarray(hist["cell"], dtype=np.int64)
        ns = np.asarray(hist["n"], dtype=np.int64)
        med = {}
        for g in sorted(set(groups)):
            m = groups == g
            order = np.argsort(cells[m], kind="stable")
            gc, gn = cells[m][order], ns[m][order]
            cum = np.cumsum(gn)
            rank = int(np.ceil(cum[-1] * 0.5))
            med[g] = int(gc[int(np.searchsorted(cum, max(rank, 1)))])
        return med

    med = disc_median(grouped_cell_histogram(ds, "event_type", "value", scale=100.0))
    med_ref = ray.put(med)

    def dev_partial(b: pa.Table) -> pa.Table:
        mm = ray.get(med_ref)
        g = b["event_type"].to_numpy(zero_copy_only=False)
        cents = np.asarray(_cents(b["value"]), dtype=np.int64)
        gm = np.array([mm[x] for x in g], dtype=np.int64)
        dev = np.abs(cents - gm)
        # histogram contraction: unique (group, dev-cell) per batch
        ug, ginv = np.unique(g, return_inverse=True)
        out_g, out_c, out_n = [], [], []
        for i, gg in enumerate(ug):
            dv = dev[ginv == i]
            uc, cnt = np.unique(dv, return_counts=True)
            out_g.append(np.full(len(uc), gg, dtype=object))
            out_c.append(uc)
            out_n.append(cnt.astype(np.int64))
        return pa.table(
            {
                "event_type": pa.array(np.concatenate(out_g)),
                "cell": pa.array(np.concatenate(out_c)),
                "n_partial": pa.array(np.concatenate(out_n)),
            }
        )

    hist2 = (
        ds.map_batches(dev_partial, batch_format="pyarrow")
        .groupby(["event_type", "cell"])
        .aggregate(Sum("n_partial", alias_name="n"))
    )
    mad = disc_median(pa.Table.from_pandas(hist2.to_pandas(), preserve_index=False))
    gs = sorted(mad)
    return pa.table(
        {
            "event_type": pa.array(gs, pa.string()),
            "median_value": pa.array([med[g] / 100.0 for g in gs], pa.float64()),
            "mad": pa.array([mad[g] / 100.0 for g in gs], pa.float64()),
        }
    )


def events_value_hour_regression(sf_dir: str):
    """Distributed OLS fit (value-vs-hour slope + intercept per event_type)
    from the SAME integer sufficient statistics as
    ``events_value_hour_corr`` — one moments pass, closed-form solve per
    group, the canonical map-side-combine regression."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in ["n", "sx", "sy", "sxx", "sxy"]},
                }
            )
        # x = hour (regressor), y = cents (response)
        x = np.asarray(pc.hour(b["ts"]), dtype=np.int64)
        y = np.asarray(_cents(b["value"]), dtype=np.int64)
        g = b["event_type"].to_numpy(zero_copy_only=False)
        ug, inv = np.unique(g, return_inverse=True)
        from ..functions.numeric import group_sums_int64

        # exact int64 moments (round-3 ADVICE item 1; see events_value_hour_corr)
        sx, sy, sxx, sxy = group_sums_int64(inv, len(ug), x, y, x * x, x * y)
        return pa.table(
            {
                "event_type": pa.array(ug, pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "sx": pa.array(sx),
                "sy": pa.array(sy),
                "sxx": pa.array(sxx),
                "sxy": pa.array(sxy),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ["n", "sx", "sy", "sxx", "sxy"]])
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    # Covariance terms in PYTHON INTS (exact BIGINT analog — round-3 ADVICE
    # item 1); slope/intercept then mirror the oracle's CAST(… AS DOUBLE).
    slopes, intercepts = [], []
    for i in range(tbl.num_rows):
        n_i, sx_i, sy_i, sxx_i, sxy_i = (
            int(tbl[c][i].as_py()) for c in ("n", "sx", "sy", "sxx", "sxy")
        )
        den = n_i * sxx_i - sx_i * sx_i
        slope_raw = float(n_i * sxy_i - sx_i * sy_i) / float(den) if den > 0 else 0.0
        slopes.append(slope_raw)
        intercepts.append((float(sy_i) - slope_raw * float(sx_i)) / float(n_i))
    slope = np.array(slopes, dtype=np.float64)
    intercept = np.array(intercepts, dtype=np.float64)
    return pa.table(
        {
            "event_type": tbl["event_type"],
            "slope": _round_col(pa.array(slope / 100.0), 6),
            "intercept": _round_col(pa.array(intercept / 100.0), 6),
        }
    )


def _simgraph_edges(sf_dir: str):
    """Deterministic similarity graph: verified window pairs (Jaccard ≥ 0.5)
    — the SQL-replayable edge set the graph-analytics queries run on."""
    from ..stages.dedup import ngram_jaccard_verify

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    verified = ngram_jaccard_verify(_window_pair_table(ds, 5), ds, threshold=0.5)
    return ds, verified.map_batches(
        lambda b: pa.table({"a_id": b["a_id"], "b_id": b["b_id"]}), batch_format="pyarrow"
    )


def _triangle_count(edges) -> int:
    """Degree-oriented distributed triangle count over undirected edges
    (a_id < b_id int64 rows, deduplicated): the Suri–Vassilvitskii /
    Cohen MapReduce orientation — each edge points from its LOWER-(degree,
    id) endpoint to the higher, wedges enumerate only ordered out-pairs of
    one source, and the closing join checks the oriented third edge.  Work
    and per-partition skew drop from Σ deg² (a degree-d hub lands ~d² wedge
    rows on ONE partition key under id orientation — round-3 VERDICT item 3)
    to Σ out-deg² with out-deg ≤ O(√m).  The triangle set is orientation-
    invariant, so the result (and the SQL oracle) is unchanged."""
    from ..stages.clustering import clamped_partitions

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return 0
    n_parts = clamped_partitions(n_edges, 8)

    def both_ends(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [pa.table({"node": b["a_id"]}), pa.table({"node": b["b_id"]})]
        )

    deg = (
        edges.map_batches(both_ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .materialize()
    )
    dega = deg.map_batches(
        lambda b: pa.table({"na": b["node"], "deg_a": b["deg"]}), batch_format="pyarrow"
    )
    degb = deg.map_batches(
        lambda b: pa.table({"nb": b["node"], "deg_b": b["deg"]}), batch_format="pyarrow"
    )
    with_deg = edges.join(
        dega, join_type="inner", num_partitions=n_parts, on=("a_id",), right_on=("na",)
    ).join(degb, join_type="inner", num_partitions=n_parts, on=("b_id",), right_on=("nb",))

    def orient(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a_id"], dtype=np.int64)
        bb = np.asarray(b["b_id"], dtype=np.int64)
        da = np.asarray(b["deg_a"], dtype=np.int64)
        db = np.asarray(b["deg_b"], dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < bb))
        src = np.where(a_first, a, bb)
        dst = np.where(a_first, bb, a)
        ddeg = np.where(a_first, db, da)  # (deg, id) of dst orders wedge pairs
        return pa.table(
            {"src": pa.array(src), "dst": pa.array(dst), "ddeg": pa.array(ddeg)}
        )

    # materialize: caps concurrent hash joins at 2 (aggregator actor pools
    # starve a small CPU budget); oriented edges are 24 B/row
    d = with_deg.map_batches(orient, batch_format="pyarrow").materialize()
    d2 = d.map_batches(
        lambda b: pa.table({"src2": b["src"], "dst2": b["dst"], "ddeg2": b["ddeg"]}),
        batch_format="pyarrow",
    )
    wedges = d.join(
        d2, join_type="inner", num_partitions=n_parts, on=("src",), right_on=("src2",)
    ).map_batches(
        lambda b: b.filter(
            pc.or_(
                pc.less(b["ddeg"], b["ddeg2"]),
                pc.and_(pc.equal(b["ddeg"], b["ddeg2"]), pc.less(b["dst"], b["dst2"])),
            )
        ).select(["dst", "dst2"]),
        batch_format="pyarrow",
    )
    closing = d.map_batches(
        lambda b: pa.table({"v2": b["src"], "w2": b["dst"]}), batch_format="pyarrow"
    )
    closed = wedges.join(
        closing, join_type="inner", num_partitions=n_parts,
        on=("dst", "dst2"), right_on=("v2", "w2"),
    )
    return closed.count()


def docs_simgraph_triangles(sf_dir: str):
    """Distributed TRIANGLE COUNTING (the graph-analytics clustering
    coefficient primitive) over the verified similarity graph, via the
    degree-oriented wedge join (:func:`_triangle_count`) — work ∝ Σ
    out-deg² with out-deg ≤ O(√m), hub-skew-proof.  Output: one row
    (n_nodes, n_edges, n_triangles)."""
    ds, edges = _simgraph_edges(sf_dir)
    edges = edges.materialize()
    n_edges = edges.count()
    n_nodes = ds.count()
    n_tri = _triangle_count(edges) if n_edges else 0
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
        }
    )


def docs_simgraph_pagerank(sf_dir: str):
    """INTEGER-EXACT PageRank (3 iterations, d = 0.85, rank scale 10⁶) over
    the undirected similarity graph — the iterative groupby-aggregate graph
    algorithm, made hash-comparable: contributions are ``rank // degree``
    and the damping update is ``150000 + (850000·Σ) // 10⁶``, all int64
    floor arithmetic, so distributed summation order cannot change a bit.
    Per iteration: one partitioned join (edges ⋈ ranks) + one groupby-sum —
    the canonical Pregel-as-Dataset shape."""
    from ..stages.clustering import cpu_scaled_partitions

    ds, edges = _simgraph_edges(sf_dir)

    def flip(b: pa.Table) -> pa.Table:
        fwd = pa.table({"src": b["a_id"], "dst": b["b_id"]})
        rev = pa.table({"src": b["b_id"], "dst": b["a_id"]})
        return pa.concat_tables([fwd, rev])

    sym = edges.map_batches(flip, batch_format="pyarrow").materialize()
    n_sym = sym.count()
    deg = sym.groupby("src").aggregate(Count(alias_name="deg")).materialize()

    nodes = ds.map_batches(
        lambda b: pa.table({"node": b["doc_id"]}), batch_format="pyarrow"
    ).materialize()
    ranks = nodes.map_batches(
        lambda b: b.append_column("r", pa.array(np.full(b.num_rows, 1_000_000, dtype=np.int64))),
        batch_format="pyarrow",
    ).materialize()
    n_parts = cpu_scaled_partitions(n_sym)

    for _ in range(3):
        contrib = deg.join(
            ranks.map_batches(
                lambda b: pa.table({"rnode": b["node"], "r": b["r"]}), batch_format="pyarrow"
            ),
            join_type="inner", num_partitions=n_parts, on=("src",), right_on=("rnode",),
        ).map_batches(
            lambda b: pa.table(
                {
                    "csrc": b["src"],
                    "c": pc.divide(b["r"], pc.cast(b["deg"], pa.int64())),  # int64 floor div
                }
            ),
            batch_format="pyarrow",
        )
        sums = (
            sym.join(contrib, join_type="inner", num_partitions=n_parts, on=("src",), right_on=("csrc",))
            .map_batches(lambda b: pa.table({"node": b["dst"], "c": b["c"]}), batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="s"))
        )
        joined = nodes.join(
            sums.map_batches(
                lambda b: pa.table({"snode": b["node"], "s": b["s"]}), batch_format="pyarrow"
            ),
            join_type="left_outer", num_partitions=n_parts, on=("node",), right_on=("snode",),
        )
        ranks = joined.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "r": pc.add(
                        pa.scalar(150_000, pa.int64()),
                        pc.divide(
                            pc.multiply(
                                pa.scalar(850_000, pa.int64()),
                                pc.cast(pc.fill_null(b["s"], 0), pa.int64()),
                            ),
                            pa.scalar(1_000_000, pa.int64()),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "pagerank": b["r"]}), batch_format="pyarrow"
    )


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape (single-table filter + global aggregate — the
    simplest possible pruned-scan query, a useful lower-bound baseline for
    scan throughput): revenue from lineitems with discount in [5%, 7%] and
    quantity < 24 in one ship-year.  Exact scaled integers; one map-side
    partial per block, one tiny global sum."""
    import datetime

    lo = pa.scalar(datetime.datetime(1995, 1, 1))
    hi = pa.scalar(datetime.datetime(1996, 1, 1))
    ds = _t(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        disc = _cents(b["l_discount"])
        keep = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi)),
                pc.and_(pc.greater_equal(disc, pa.scalar(5, pa.int64())),
                        pc.less_equal(disc, pa.scalar(7, pa.int64()))),
            ),
            pc.less(b["l_quantity"], pa.scalar(24.0)),
        )
        sub = b.filter(keep)
        rev = pc.sum(
            pc.multiply(_cents(sub["l_extendedprice"]), _cents(sub["l_discount"]))
        ).as_py() or 0
        return pa.table({"rev_c4": pa.array([int(rev)], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(Sum("rev_c4", alias_name="rev_c4"))
    return pa.table(
        {"revenue": pa.array([(int(agg["rev_c4"] or 0)) / 10000.0], pa.float64())}
    )


def events_value_quantile_sketch(sf_dir: str):
    """p50/p90/p99 of ``events.value`` from the log-histogram quantile
    SKETCH (``stages/sketches.dd_registers``) — the unbounded-cardinality
    float primitive the exact cent-quantized quantile suite
    (``stages/quantiles.py``) cannot cover: register count is bounded by
    octave span × 2^7 regardless of how many distinct float64s stream
    through, and register merge is count addition (order-free → partition
    invariant bit-for-bit).  Output is the INTEGER bucket triple
    ``(q_pct, sign, e, m)`` per percentile — integer sufficient statistics,
    the hash-stable convention — whose lower bound ``sign·2^e·(1+m/128)``
    is within relative 2^-7 of the exact quantile (property-tested).  The
    DuckDB oracle replays the registers bit-exact: a recursive-doubling
    powers-of-two table assigns octaves and every op on both sides is
    EXACT in IEEE double (frexp / power-of-two division / dyadic floor —
    no transcendental ``ln`` whose last ulp could flip a bucket)."""
    from ..stages.sketches import dd_quantiles

    return dd_quantiles(_t(sf_dir, "events", ["value"]), "value", [50, 90, 99], sub_bits=7)


def events_type_value_quantile_sketch(sf_dir: str):
    """Per-event-type p50/p90/p99 from the GROUPED quantile sketch
    (``sketches.dd_group_registers`` — the common production shape: one
    bounded register table per group, shuffle ∝ groups × octave span × 2^b).
    Same exact-arithmetic SQL replay and integer-triple output contract as
    ``events_value_quantile_sketch``; per-group ranks partition the window
    cumsum in the oracle."""
    from ..stages.sketches import dd_group_quantiles

    return dd_group_quantiles(
        _t(sf_dir, "events", ["event_type", "value"]),
        "event_type",
        "value",
        [50, 90, 99],
        sub_bits=7,
    )


def docs_epoch_shuffle(sf_dir: str):
    """Deterministic epoch shuffle (``stages.sampling.epoch_shuffle``) —
    the training-loop data-ordering primitive: every document gets its exact
    1-based position in the seed-7 epoch order.  ``random_shuffle`` is an
    all-to-all whose order is neither deterministic under retries nor
    resumable; here the order is a pure function of (doc_id, seed) — one
    balanced-by-construction range sort on ``splitmix64(doc_id ^
    splitmix64(seed))`` plus the two-phase prefix scan for the position
    stamp.  The oracle replays the splitmix64 chain in HUGEINT (the HLL/CMS
    split-multiply trick) and ranks with ``ROW_NUMBER`` over the signed
    64-bit view — bit-exact."""
    from ..stages.sampling import epoch_shuffle

    ds = _t(sf_dir, "documents", ["doc_id"])
    out = epoch_shuffle(ds, "doc_id", seed=7)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "epoch_pos": b["epoch_pos"]}),
        batch_format="pyarrow",
    )


def q13_customer_distribution(sf_dir: str):
    """Two-level aggregate with a zero-preserving outer side (TPC-H Q13
    shape: distribution of customers by order count, orders filtered by a
    predicate).  Order counts contract map-side to (custkey, n) cells →
    one groupby-sum keyed by customer; the second level contracts those
    per-customer counts map-side to (c_count, partial) cells → one tiny
    groupby whose cardinality is bounded by max-orders-per-customer.  The
    LEFT JOIN's only contribution — customers with NO qualifying order —
    is a single CARDINALITY (|customer| − |custkeys seen|), so the
    customer table is never joined or shuffled at all: the c_count=0
    bucket is two dataset counts, not a row-scale outer join."""
    per_cust = (
        _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda b: (
                b.filter(pc.not_equal(b["o_orderpriority"], "1-URGENT"))
                .group_by("o_custkey")
                .aggregate([("o_custkey", "count")])
                .rename_columns(["o_custkey", "n"])
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    ).materialize()
    n_with = per_cust.count()
    n_cust = _t(sf_dir, "customer", ["c_custkey"]).count()
    dist = (
        per_cust.map_batches(
            lambda b: (
                b.select(["c_count"])
                .group_by("c_count")
                .aggregate([("c_count", "count")])
                .rename_columns(["c_count", "p"])
            ),
            batch_format="pyarrow",
        )
        .groupby("c_count")
        .aggregate(Sum("p", alias_name="custdist"))
    )
    tbl = pa.Table.from_pandas(dist.to_pandas(), preserve_index=False)
    tbl = pa.table(
        {
            "c_count": pc.cast(tbl["c_count"], pa.int64()),
            "custdist": pc.cast(tbl["custdist"], pa.int64()),
        }
    )
    n_zero = n_cust - n_with
    if n_zero > 0:
        tbl = pa.concat_tables(
            [
                tbl,
                pa.table(
                    {"c_count": pa.array([0], pa.int64()), "custdist": pa.array([n_zero], pa.int64())}
                ),
            ]
        )
    return tbl


def q15_top_supplier(sf_dir: str):
    """Argmax over a first-level aggregate (TPC-H Q15 shape: the supplier(s)
    with maximum revenue in a shipdate quarter).  Revenue per supplier
    contracts map-side to (suppkey, rev_c4) cells → one groupby-sum whose
    output is ∝ |supplier| (a dimension); the global max is ONE Max
    aggregate over that table (never a sort), and the equality filter +
    name attach run over the same dimension-sized table — the fact table
    is read once and never joined.  Exact integer c4 revenue on both
    sides, so a float sum can never create or destroy a tie."""
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-04-01")

    def partial(b: pa.Table) -> pa.Table:
        ship = np.asarray(b["l_shipdate"], dtype="datetime64[us]")
        keep = (ship >= lo) & (ship < hi)
        if not keep.any():
            return pa.table(
                {"l_suppkey": pa.array([], pa.int64()), "rev_c4": pa.array([], pa.int64())}
            )
        cents = np.asarray(_cents(b["l_extendedprice"]), dtype=np.int64)[keep]
        disc = np.asarray(_cents(b["l_discount"]), dtype=np.int64)[keep]
        sk = np.asarray(b["l_suppkey"], dtype=np.int64)[keep]
        sub = pa.table({"l_suppkey": pa.array(sk), "rev_c4": pa.array(cents * (100 - disc))})
        return (
            sub.group_by("l_suppkey")
            .aggregate([("rev_c4", "sum")])
            .rename_columns(["l_suppkey", "rev_c4"])
        )

    per_supp = (
        _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
    ).materialize()
    best = per_supp.max("rev_c4")
    top = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b["rev_c4"], best)), batch_format="pyarrow"
    ).to_pandas()
    names = pa.Table.from_pandas(
        _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas(), preserve_index=False
    )
    name_of = dict(zip(names["s_suppkey"].to_pylist(), names["s_name"].to_pylist()))
    sk = top["l_suppkey"].astype("int64").to_numpy()
    return pa.table(
        {
            "s_suppkey": pa.array(sk, pa.int64()),
            "s_name": pa.array([name_of[int(k)] for k in sk], pa.string()),
            "total_revenue": pa.array(
                top["rev_c4"].astype("int64").to_numpy() / 10000.0, pa.float64()
            ),
        }
    )


def q17_small_quantity_revenue(sf_dir: str):
    """Correlated per-group average as a two-pass broadcast (TPC-H Q17
    shape: revenue from lineitems below 20% of their part's average
    quantity).  Pass 1 contracts the brand-filtered fact map-side to
    (partkey, n, sum_qty) cells → groupby-sum → a table ∝ parts-of-brand,
    broadcast once (``ray.put``).  Pass 2 re-reads the fact and evaluates
    the correlated predicate ``10·qty·n < 2·sum_qty`` in EXACT int64
    (both sides multiply through instead of dividing, so no float average
    can flip a boundary row), emitting ONE cents cell per batch.
    l_quantity values are integer-valued doubles (1..50) — the int64 cast
    is exact on both engine and SQL sides."""
    import ray

    part = pa.Table.from_pandas(
        _t(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas(), preserve_index=False
    )
    brand_keys = np.sort(
        np.asarray(part.filter(pc.equal(part["p_brand"], "Brand#13"))["p_partkey"], dtype=np.int64)
    )
    bk_ref = ray.put(brand_keys)

    def stats_partial(b: pa.Table) -> pa.Table:
        bk = ray.get(bk_ref)
        pk = np.asarray(b["l_partkey"], dtype=np.int64)
        pos = np.searchsorted(bk, pk)
        keep = (pos < len(bk)) & (bk[np.minimum(pos, len(bk) - 1)] == pk)
        if not keep.any():
            return pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                }
            )
        pk = pk[keep]
        q = np.asarray(b["l_quantity"], dtype=np.float64)[keep].astype(np.int64)
        sub = pa.table(
            {
                "l_partkey": pa.array(pk),
                "n": pa.array(np.ones(len(pk), np.int64)),
                "sum_q": pa.array(q),
            }
        )
        return (
            sub.group_by("l_partkey")
            .aggregate([("n", "sum"), ("sum_q", "sum")])
            .rename_columns(["l_partkey", "n", "sum_q"])
        )

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = (
        _t(sf_dir, "lineitem", li_cols)
        .map_batches(stats_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_q", alias_name="sum_q"))
    ).to_pandas()
    spk = stats["l_partkey"].astype("int64").to_numpy()
    order = np.argsort(spk)
    lut_ref = ray.put(
        (
            spk[order],
            stats["n"].astype("int64").to_numpy()[order],
            stats["sum_q"].astype("int64").to_numpy()[order],
        )
    )

    def rev_partial(b: pa.Table) -> pa.Table:
        ks, ns, ss = ray.get(lut_ref)
        if len(ks) == 0:
            return pa.table({"cents": pa.array([0], pa.int64())})
        pk = np.asarray(b["l_partkey"], dtype=np.int64)
        pos = np.clip(np.searchsorted(ks, pk), 0, len(ks) - 1)
        hit = ks[pos] == pk
        q = np.asarray(b["l_quantity"], dtype=np.float64).astype(np.int64)
        small = hit & (10 * q * ns[pos] < 2 * ss[pos])
        cents = np.asarray(_cents(b["l_extendedprice"]), dtype=np.int64)
        return pa.table({"cents": pa.array([int(cents[small].sum())], pa.int64())})

    total = (
        _t(sf_dir, "lineitem", li_cols)
        .map_batches(rev_partial, batch_format="pyarrow")
        .aggregate(Sum("cents", alias_name="c"))
    )
    return pa.table({"avg_yearly": pa.array([int(total["c"]) / 700.0], pa.float64())})


def q18_large_volume_customers(sf_dir: str):
    """Group-by-HAVING semi-join back onto the fact's parent (TPC-H Q18
    shape: orders whose total quantity exceeds a threshold, enriched with
    customer attributes).  Quantities contract map-side to (orderkey, qty)
    cells → groupby-sum → HAVING filter; the surviving keys are RARE by
    construction (the far tail of the order-size distribution), so they
    broadcast as a sorted lut and orders is filtered + enriched in one
    shuffle-free pass (above ``_SEMI_BROADCAST_LIMIT`` the q3/q4
    partitioned-join duality applies).  Customer names attach from the
    dimension lut on the tiny surviving result."""
    import ray

    THRESH = 280

    def qty_partial(b: pa.Table) -> pa.Table:
        sub = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "q": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            }
        )
        return (
            sub.group_by("l_orderkey").aggregate([("q", "sum")]).rename_columns(["l_orderkey", "q"])
        )

    hot = (
        _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("q", alias_name="total_qty"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["total_qty"], THRESH)), batch_format="pyarrow"
        )
    ).to_pandas()
    if hot.empty:
        return pa.table(
            {
                "c_name": pa.array([], pa.string()),
                "c_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
                "total_qty": pa.array([], pa.int64()),
            }
        )
    hk = hot["l_orderkey"].astype("int64").to_numpy()
    order = np.argsort(hk)
    lut_ref = ray.put((hk[order], hot["total_qty"].astype("int64").to_numpy()[order]))

    def attach(b: pa.Table) -> pa.Table:
        ks, qs = ray.get(lut_ref)
        ok = np.asarray(b["o_orderkey"], dtype=np.int64)
        pos = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
        keep = ks[pos] == ok
        idx = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "c_custkey": pc.take(b["o_custkey"], idx),
                "o_orderkey": pc.take(b["o_orderkey"], idx),
                "o_totalprice": pc.take(b["o_totalprice"], idx),
                "total_qty": pa.array(qs[pos[keep]], pa.int64()),
            }
        )

    rows = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow")
        .to_pandas()
    )
    cust = pa.Table.from_pandas(
        _t(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas(), preserve_index=False
    )
    name_of = dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))
    ck = rows["c_custkey"].astype("int64").to_numpy()
    return pa.table(
        {
            "c_name": pa.array([name_of[int(k)] for k in ck], pa.string()),
            "c_custkey": pa.array(ck, pa.int64()),
            "o_orderkey": pa.array(rows["o_orderkey"].astype("int64").to_numpy(), pa.int64()),
            "o_totalprice": pa.array(rows["o_totalprice"].to_numpy(), pa.float64()),
            "total_qty": pa.array(rows["total_qty"].astype("int64").to_numpy(), pa.int64()),
        }
    )


def q19_disjunctive_revenue(sf_dir: str):
    """Disjunctive multi-predicate dimension join (TPC-H Q19 shape: revenue
    where (brand, size-range, quantity-range) matches any of three OR'd
    clauses).  The dimension ships once as THREE sorted partkey sets (one
    per clause — brand and size resolve at broadcast-build time, so the
    per-row work is three vectorized ``searchsorted`` membership tests +
    quantity range masks); each batch emits ONE exact-int c4 cell.  No
    join, no shuffle — one pass over the fact."""
    import ray

    CLAUSES = [  # (brand, size_lo, size_hi, qty_lo, qty_hi)
        ("Brand#13", 1, 5, 1, 11),
        ("Brand#25", 1, 10, 10, 20),
        ("Brand#22", 1, 15, 20, 30),
    ]
    part = pa.Table.from_pandas(
        _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas(), preserve_index=False
    )
    sets = []
    for brand, slo, shi, _qlo, _qhi in CLAUSES:
        m = pc.and_(
            pc.equal(part["p_brand"], brand),
            pc.and_(pc.greater_equal(part["p_size"], slo), pc.less_equal(part["p_size"], shi)),
        )
        sets.append(np.sort(np.asarray(part.filter(m)["p_partkey"], dtype=np.int64)))
    sets_ref = ray.put(sets)

    def partial(b: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        pk = np.asarray(b["l_partkey"], dtype=np.int64)
        q = np.asarray(b["l_quantity"], dtype=np.float64).astype(np.int64)
        keep = np.zeros(len(pk), dtype=bool)
        for (_, _, _, qlo, qhi), ks in zip(CLAUSES, ss):
            if len(ks) == 0:
                continue
            pos = np.clip(np.searchsorted(ks, pk), 0, len(ks) - 1)
            keep |= (ks[pos] == pk) & (q >= qlo) & (q <= qhi)
        if not keep.any():
            return pa.table({"rev_c4": pa.array([0], pa.int64())})
        cents = np.asarray(_cents(b["l_extendedprice"]), dtype=np.int64)[keep]
        disc = np.asarray(_cents(b["l_discount"]), dtype=np.int64)[keep]
        return pa.table({"rev_c4": pa.array([int((cents * (100 - disc)).sum())], pa.int64())})

    agg = (
        _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("rev_c4", alias_name="r"))
    )
    return pa.table({"revenue": pa.array([int(agg["r"]) / 10000.0], pa.float64())})


def q8_market_share(sf_dir: str):
    """National market share inside a region by year (TPC-H Q8 shape — the
    widest join tree in the suite: lineitem ⋈ orders ⋈ customer ⋈ nation
    ⋈ region on one arm, ⋈ supplier ⋈ nation on the other).  Every
    dimension arm resolves from broadcast sorted-array luts built once;
    orders filtered to the region's customers and the 2-year window
    becomes an orderkey→year lut (broadcast below
    ``_SEMI_BROADCAST_LIMIT``, the q7 partitioned-join duality above it),
    so the default plan has NO fact-fact exchange.  Per-batch grouped
    partials carry exact int64 c4 revenue (numerator, denominator) per
    year — two cells per batch reach the final tiny groupby; the share
    replays q14's scale-round idiom in the oracle."""
    import ray

    from ..stages.clustering import clamped_partitions

    REGION, NATION = "AFRICA", "NATION_18"
    lo = np.datetime64("1995-01-01")
    hi = np.datetime64("1996-12-31")

    nat = pa.Table.from_pandas(
        _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas(),
        preserve_index=False,
    )
    reg = pa.Table.from_pandas(
        _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas(), preserve_index=False
    )
    rkey = reg.filter(pc.equal(reg["r_name"], REGION))["r_regionkey"][0].as_py()
    region_nations = np.sort(
        np.asarray(nat.filter(pc.equal(nat["n_regionkey"], rkey))["n_nationkey"], dtype=np.int64)
    )
    target_nkey = nat.filter(pc.equal(nat["n_name"], NATION))["n_nationkey"][0].as_py()

    cust = pa.Table.from_pandas(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas(), preserve_index=False
    )
    ck = np.asarray(cust["c_custkey"], dtype=np.int64)
    cn = np.asarray(cust["c_nationkey"], dtype=np.int64)
    region_custs = np.sort(ck[np.isin(cn, region_nations)])
    rc_ref = ray.put(region_custs)

    supp = pa.Table.from_pandas(
        _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas(), preserve_index=False
    )
    sk = np.asarray(supp["s_suppkey"], dtype=np.int64)
    sn = np.asarray(supp["s_nationkey"], dtype=np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put((sk[so], sn[so]))

    def orders_window(b: pa.Table) -> pa.Table:
        rc = ray.get(rc_ref)
        od = np.asarray(b["o_orderdate"], dtype="datetime64[us]")
        ckey = np.asarray(b["o_custkey"], dtype=np.int64)
        keep = (od >= lo) & (od <= hi)
        if len(rc):
            pos = np.clip(np.searchsorted(rc, ckey), 0, len(rc) - 1)
            keep &= rc[pos] == ckey
        else:
            keep[:] = False
        idx = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "o_orderkey": pc.take(b["o_orderkey"], idx),
                "o_year": pc.cast(pc.year(pc.take(b["o_orderdate"], idx)), pa.int64()),
            }
        )

    orders_f = (
        _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(orders_window, batch_format="pyarrow")
        .materialize()
    )
    n_orders_f = orders_f.count()

    def rev_partial(b: pa.Table, okey_lut) -> pa.Table:
        empty = pa.table(
            {
                "o_year": pa.array([], pa.int64()),
                "num_c4": pa.array([], pa.int64()),
                "den_c4": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        if okey_lut is not None:
            ok, oy = ray.get(okey_lut) if isinstance(okey_lut, ray.ObjectRef) else okey_lut
            if len(ok) == 0:
                return empty
            okey = np.asarray(b["l_orderkey"], dtype=np.int64)
            pos = np.clip(np.searchsorted(ok, okey), 0, len(ok) - 1)
            keep = ok[pos] == okey
            year = oy[pos]
        else:
            keep = np.ones(b.num_rows, dtype=bool)
            year = np.asarray(b["o_year"], dtype=np.int64)
        if not keep.any():
            return empty
        sks, sns = ray.get(supp_ref)
        skey = np.asarray(b["l_suppkey"], dtype=np.int64)
        sp = np.clip(np.searchsorted(sks, skey), 0, len(sks) - 1)
        is_target = (sks[sp] == skey) & (sns[sp] == target_nkey)
        cents = np.asarray(_cents(b["l_extendedprice"]), dtype=np.int64)
        disc = np.asarray(_cents(b["l_discount"]), dtype=np.int64)
        rev = cents * (100 - disc)
        sub = pa.table(
            {
                "o_year": pa.array(year[keep]),
                "num_c4": pa.array(np.where(is_target[keep], rev[keep], 0)),
                "den_c4": pa.array(rev[keep]),
            }
        )
        return (
            sub.group_by("o_year")
            .aggregate([("num_c4", "sum"), ("den_c4", "sum")])
            .rename_columns(["o_year", "num_c4", "den_c4"])
        )

    li_cols = ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    if n_orders_f <= _SEMI_BROADCAST_LIMIT:
        odf = orders_f.to_pandas()
        ok = odf["o_orderkey"].to_numpy(dtype=np.int64)
        o = np.argsort(ok)
        okey_ref = ray.put((ok[o], odf["o_year"].to_numpy(dtype=np.int64)[o]))
        partials = _t(sf_dir, "lineitem", li_cols).map_batches(
            lambda b: rev_partial(b, okey_ref), batch_format="pyarrow"
        )
    else:
        n_parts = clamped_partitions(n_orders_f, max(8, int(ray.cluster_resources().get("CPU", 8))))
        joined = _t(sf_dir, "lineitem", li_cols).join(
            orders_f,
            join_type="inner",
            num_partitions=n_parts,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        partials = joined.map_batches(lambda b: rev_partial(b, None), batch_format="pyarrow")

    agg = partials.groupby("o_year").aggregate(
        Sum("num_c4", alias_name="num"), Sum("den_c4", alias_name="den")
    )
    adf = agg.to_pandas()
    if adf.empty:
        return pa.table(
            {
                "o_year": pa.array([], pa.int64()),
                "mkt_share": pa.array([], pa.float64()),
                "nation_revenue": pa.array([], pa.float64()),
                "total_revenue": pa.array([], pa.float64()),
            }
        )
    num = adf["num"].astype("int64").to_numpy()
    den = adf["den"].astype("int64").to_numpy()
    share = [float(int((100.0 * n_) / d_ * 10000 + 0.5)) / 10000.0 for n_, d_ in zip(num, den)]
    return pa.table(
        {
            "o_year": pa.array(adf["o_year"].astype("int64").to_numpy(), pa.int64()),
            "mkt_share": pa.array(share, pa.float64()),
            "nation_revenue": pa.array(num / 10000.0, pa.float64()),
            "total_revenue": pa.array(den / 10000.0, pa.float64()),
        }
    )


def events_mad_outliers(sf_dir: str):
    """Robust anomaly gate (the |x − median| > 3·MAD outlier rule — the
    quality-filter staple that survives heavy tails where z-scores don't).
    Reuses the two bounded cell-histogram passes of ``events_value_mad``
    (shuffle ∝ distinct cents cells, never rows) and then needs NO third
    pass: the deviation histogram already carries every |cents − median|
    count, so the outlier count per type is a driver-side sum over the
    bounded cell table.  Everything integer — strict ``> 3·MAD`` in cents
    can never be flipped by float roundoff on either side."""
    import ray

    from ..stages.quantiles import grouped_cell_histogram

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def disc_median(hist: pa.Table) -> dict:
        groups = hist["event_type"].to_numpy(zero_copy_only=False)
        cells = np.asarray(hist["cell"], dtype=np.int64)
        ns = np.asarray(hist["n"], dtype=np.int64)
        med = {}
        for g in sorted(set(groups)):
            m = groups == g
            order = np.argsort(cells[m], kind="stable")
            gc, gn = cells[m][order], ns[m][order]
            cum = np.cumsum(gn)
            rank = int(np.ceil(cum[-1] * 0.5))
            med[g] = int(gc[int(np.searchsorted(cum, max(rank, 1)))])
        return med

    med = disc_median(grouped_cell_histogram(ds, "event_type", "value", scale=100.0))
    med_ref = ray.put(med)

    def dev_partial(b: pa.Table) -> pa.Table:
        mm = ray.get(med_ref)
        g = b["event_type"].to_numpy(zero_copy_only=False)
        cents = np.asarray(_cents(b["value"]), dtype=np.int64)
        gm = np.array([mm[x] for x in g], dtype=np.int64)
        dev = np.abs(cents - gm)
        ug, ginv = np.unique(g, return_inverse=True)
        out_g, out_c, out_n = [], [], []
        for i, gg in enumerate(ug):
            dv = dev[ginv == i]
            uc, cnt = np.unique(dv, return_counts=True)
            out_g.append(np.full(len(uc), gg, dtype=object))
            out_c.append(uc)
            out_n.append(cnt.astype(np.int64))
        return pa.table(
            {
                "event_type": pa.array(np.concatenate(out_g)),
                "cell": pa.array(np.concatenate(out_c)),
                "n_partial": pa.array(np.concatenate(out_n)),
            }
        )

    hist2 = pa.Table.from_pandas(
        (
            ds.map_batches(dev_partial, batch_format="pyarrow")
            .groupby(["event_type", "cell"])
            .aggregate(Sum("n_partial", alias_name="n"))
        ).to_pandas(),
        preserve_index=False,
    )
    mad = disc_median(hist2)
    groups = hist2["event_type"].to_numpy(zero_copy_only=False)
    cells = np.asarray(hist2["cell"], dtype=np.int64)
    ns = np.asarray(hist2["n"], dtype=np.int64)
    gs = sorted(mad)
    n_tot = [int(ns[groups == g].sum()) for g in gs]
    n_out = [int(ns[(groups == g) & (cells > 3 * mad[g])].sum()) for g in gs]
    return pa.table(
        {
            "event_type": pa.array(gs, pa.string()),
            "n": pa.array(n_tot, pa.int64()),
            "n_outliers": pa.array(n_out, pa.int64()),
        }
    )


def events_user_rfm(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary quartiles — the
    classic behavioral-scoring operator).  One groupby contracts the
    stream to the per-user (max-ts, count, sum-cents) table; each of the
    three NTILE(4) assignments is ONE range sort of that users-sized
    table + the two-phase prefix scan (``stages/scan.py``) for the exact
    1-based global rank — NTILE's rank arithmetic (first ``n mod 4``
    tiles get ``⌈n/4⌉``) then replays identically on both sides, with
    ``user_id`` as the deterministic tie-break so distributed and SQL
    ranks can never diverge on ties.  Tiles re-attach by two partitioned
    user-keyed joins; nothing row-scale ever reaches the driver."""
    from ..stages.clustering import cpu_scaled_partitions
    from ..stages.scan import prefix_scan

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        sub = pa.table(
            {
                "user_id": b["user_id"],
                "rec_us": pc.cast(b["ts"], pa.int64()),
                "freq": pa.array(np.ones(b.num_rows, np.int64)),
                "mon_c": _cents(b["value"]),
            }
        )
        return (
            sub.group_by("user_id")
            .aggregate([("rec_us", "max"), ("freq", "sum"), ("mon_c", "sum")])
            .rename_columns(["user_id", "rec_us", "freq", "mon_c"])
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("rec_us", alias_name="rec_us"),
            Sum("freq", alias_name="freq"),
            Sum("mon_c", alias_name="mon_c"),
        )
    ).materialize()
    n = users.count()
    base, rem = n // 4, n % 4

    def tile_of(rank: np.ndarray) -> np.ndarray:
        # NTILE(4): the first `rem` tiles hold base+1 rows, the rest base.
        big = rem * (base + 1)
        in_big = rank <= big
        t = np.empty(len(rank), dtype=np.int64)
        if base + 1 > 0:
            t[in_big] = (rank[in_big] - 1) // (base + 1) + 1
        if base > 0:
            t[~in_big] = rem + (rank[~in_big] - big - 1) // base + 1
        return t

    def tiles_for(metric: str, out_col: str):
        ranked = prefix_scan(
            users.select_columns(["user_id", metric]),
            [metric, "user_id"],
            metric,
            out_col="_cum",
            row_col="_rn",
        )
        return ranked.map_batches(
            lambda b: pa.table(
                {
                    "user_id": b["user_id"],
                    out_col: pa.array(tile_of(np.asarray(b["_rn"], dtype=np.int64)), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    np_ = cpu_scaled_partitions(n)
    out = (
        tiles_for("rec_us", "r_tile")
        .join(tiles_for("freq", "f_tile"), join_type="inner", num_partitions=np_, on=("user_id",))
        .join(tiles_for("mon_c", "m_tile"), join_type="inner", num_partitions=np_, on=("user_id",))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_dau_wau_stickiness(sf_dir: str):
    """Exact DAU / rolling-7-day-WAU stickiness per day — the engagement
    metric whose sliding COUNT(DISTINCT) normally forces either an
    approximate sketch or a window × pairs self-join.  Here it is EXACT in
    one bucketed-run exchange: batches contract to distinct (user, day)
    pairs map-side, ``grouped_ordered_runs`` sorts each user's days once,
    and a user's contribution to every 7-day window collapses to merged
    interval DELTAS (+1 at interval start, −1 at merged-end + 7; days ≤ 6
    apart fuse because their [a, a+6] covers overlap) — so the shuffle
    carries (user, day) pairs, the driver sees only per-bucket (day, dau,
    Δwau) cells bounded by the day span, and WAU(d) is one cumulative sum.
    Stickiness is integer permille (``dau·1000 // wau``) — floor division
    on both sides, never a float ratio."""
    from ..stages.windows import grouped_ordered_runs

    day_us = 86_400_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def pairs_partial(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"], dtype=np.int64)
        d = np.asarray(b["ts"].cast(pa.int64()), dtype=np.int64) // day_us
        uniq = np.unique(np.stack([u, d], axis=1), axis=0)
        return pa.table(
            {"user_id": pa.array(uniq[:, 0], pa.int64()), "day_idx": pa.array(uniq[:, 1], pa.int64())}
        )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "day_idx": pa.array([], pa.int64()),
                "dau_n": pa.array([], pa.int64()),
                "wau_delta": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = np.asarray(g["user_id"], dtype=np.int64)
        d = np.asarray(g["day_idx"], dtype=np.int64)
        # cross-batch dedup: the bucket arrives sorted by (user, day)
        first = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[first], d[first]
        # merged-interval boundaries: new user OR day gap > 6
        new_run = np.r_[True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] > 6)]
        s_idx = np.flatnonzero(new_run)
        e_idx = np.r_[s_idx[1:], len(d)] - 1
        # per-bucket contraction of both cell kinds
        dau_days, dau_n = np.unique(d, return_counts=True)
        delta_days = np.concatenate([d[s_idx], d[e_idx] + 7])
        delta_vals = np.concatenate(
            [np.ones(len(s_idx), np.int64), np.full(len(e_idx), -1, np.int64)]
        )
        ud, inv = np.unique(delta_days, return_inverse=True)
        dsum = np.zeros(len(ud), np.int64)
        np.add.at(dsum, inv, delta_vals)
        return pa.table(
            {
                "day_idx": pa.array(np.concatenate([dau_days, ud]), pa.int64()),
                "dau_n": pa.array(
                    np.concatenate([dau_n.astype(np.int64), np.zeros(len(ud), np.int64)]), pa.int64()
                ),
                "wau_delta": pa.array(
                    np.concatenate([np.zeros(len(dau_days), np.int64), dsum]), pa.int64()
                ),
            }
        )

    pairs = ds.map_batches(pairs_partial, batch_format="pyarrow")
    cells = grouped_ordered_runs(pairs, "user_id", ("day_idx",), kernel).to_pandas()
    days = np.sort(cells.loc[cells["dau_n"] > 0, "day_idx"].unique())
    dau = cells.groupby("day_idx")["dau_n"].sum()
    deltas = cells.groupby("day_idx")["wau_delta"].sum().sort_index()
    cum_days = deltas.index.to_numpy(dtype=np.int64)
    cum = deltas.to_numpy(dtype=np.int64).cumsum()
    wau = cum[np.searchsorted(cum_days, days, side="right") - 1]
    dau_v = dau.reindex(days).to_numpy(dtype=np.int64)
    return pa.table(
        {
            "day_idx": pa.array(days, pa.int64()),
            "dau": pa.array(dau_v, pa.int64()),
            "wau": pa.array(wau, pa.int64()),
            "stickiness_pm": pa.array(dau_v * 1000 // wau, pa.int64()),
        }
    )


def events_weekly_churn(sf_dir: str):
    """Weekly churn / retention cohorts — the subscription-analytics staple
    (active users per week, how many are NEW vs returning, how many CHURN
    before the next week).  The naive form is two self-joins of the
    user-week table against itself at lag ±1; here it is ONE bucketed-run
    exchange: batches contract to distinct (user, week) pairs map-side,
    ``grouped_ordered_runs`` sorts each user's weeks once, and both lag
    comparisons collapse to vectorized neighbor compares inside the run
    (``new`` ⇔ no row at week−1, ``retained`` ⇔ a row at week+1).  Buckets
    emit (week, active, retained, new) cells bounded by the week span, so
    the driver consolidates counters, never rows.  ``churn_pm`` is integer
    permille by floor division on both sides.  The global last week retains
    nobody by construction (LEAD semantics — there is no week+1 yet)."""
    from ..stages.windows import grouped_ordered_runs

    week_us = 604_800_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def pairs_partial(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"], dtype=np.int64)
        w = np.asarray(b["ts"].cast(pa.int64()), dtype=np.int64) // week_us
        uniq = np.unique(np.stack([u, w], axis=1), axis=0)
        return pa.table(
            {"user_id": pa.array(uniq[:, 0], pa.int64()), "week_idx": pa.array(uniq[:, 1], pa.int64())}
        )

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "week_idx": pa.array([], pa.int64()),
                "active_n": pa.array([], pa.int64()),
                "retained_n": pa.array([], pa.int64()),
                "new_n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = np.asarray(g["user_id"], dtype=np.int64)
        w = np.asarray(g["week_idx"], dtype=np.int64)
        # cross-batch dedup: the bucket arrives sorted by (user, week)
        first = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[first], w[first]
        # lag/lead by one vectorized shift each: a row is NEW unless the
        # previous row is the same user at week−1; it is RETAINED iff the
        # next row is the same user at week+1.
        new = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1] + 1)]
        retained = np.r_[(u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1), False]
        uw, inv = np.unique(w, return_inverse=True)
        active = np.zeros(len(uw), np.int64)
        ret_n = np.zeros(len(uw), np.int64)
        new_n = np.zeros(len(uw), np.int64)
        np.add.at(active, inv, 1)
        np.add.at(ret_n, inv, retained.astype(np.int64))
        np.add.at(new_n, inv, new.astype(np.int64))
        return pa.table(
            {
                "week_idx": pa.array(uw, pa.int64()),
                "active_n": pa.array(active, pa.int64()),
                "retained_n": pa.array(ret_n, pa.int64()),
                "new_n": pa.array(new_n, pa.int64()),
            }
        )

    pairs = ds.map_batches(pairs_partial, batch_format="pyarrow")
    cells = grouped_ordered_runs(pairs, "user_id", ("week_idx",), kernel).to_pandas()
    agg = cells.groupby("week_idx")[["active_n", "retained_n", "new_n"]].sum().sort_index()
    active = agg["active_n"].to_numpy(dtype=np.int64)
    retained = agg["retained_n"].to_numpy(dtype=np.int64)
    new_u = agg["new_n"].to_numpy(dtype=np.int64)
    churned = active - retained
    return pa.table(
        {
            "week_idx": pa.array(agg.index.to_numpy(dtype=np.int64), pa.int64()),
            "active": pa.array(active, pa.int64()),
            "new_users": pa.array(new_u, pa.int64()),
            "retained_next": pa.array(retained, pa.int64()),
            "churned_next": pa.array(churned, pa.int64()),
            "churn_pm": pa.array(churned * 1000 // active, pa.int64()),
        }
    )


def orders_revenue_pareto(sf_dir: str):
    """Pareto 80/20 revenue concentration — the smallest top-spender set
    whose cumulative revenue reaches 80% of the total (the "how few
    customers pay for everything" audit).  Per-customer cents contract
    map-side then in one groupby (shuffle ∝ customers, not orders); the
    global descending rank + running total is the existing two-phase
    prefix scan (``stages/scan.py`` — exact int64, association-free, so
    the window-SQL replay is bit-identical); the 80% threshold row is a
    filter + min aggregate over the scanned table.  Only four scalars ever
    reach the driver.  Ties break on ``o_custkey`` so distributed and SQL
    ranks can never diverge; the permille share uses floor division on
    both sides.  Raises (never wraps) if ``total × 1000`` would exceed
    int64 — the oracle's BIGINT arithmetic fails loudly at the same point."""
    from ..stages.scan import prefix_scan

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        sub = pa.table({"o_custkey": b["o_custkey"], "rev_c": _cents(b["o_totalprice"])})
        return (
            sub.group_by("o_custkey")
            .aggregate([("rev_c", "sum")])
            .rename_columns(["o_custkey", "rev_c"])
        )

    cust = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
    )

    def add_neg(b: pa.Table) -> pa.Table:
        return b.append_column(
            "neg_rev", pa.array(-np.asarray(b["rev_c"], dtype=np.int64), pa.int64())
        )

    scanned = prefix_scan(
        cust.map_batches(add_neg, batch_format="pyarrow"),
        ["neg_rev", "o_custkey"],
        "rev_c",
        out_col="_cum",
        row_col="_rn",
    ).materialize()
    tot = scanned.aggregate(Max("_cum"), Max("_rn"))
    total, n = int(tot["max(_cum)"]), int(tot["max(_rn)"])
    if total * 1000 >= 2**63:
        raise ValueError("orders_revenue_pareto: total × 1000 exceeds int64")
    thresh = 4 * total  # cum·5 ≥ total·4 ⇔ share ≥ 80%, exact in int64
    hit = scanned.map_batches(
        lambda b: b.filter(
            pc.greater_equal(pc.multiply_checked(b["_cum"], pa.scalar(5, pa.int64())), thresh)
        ),
        batch_format="pyarrow",
    ).aggregate(Min("_rn"), Min("_cum"))
    top_n, cum80 = int(hit["min(_rn)"]), int(hit["min(_cum)"])
    return pa.table(
        {
            "total_customers": pa.array([n], pa.int64()),
            "top_n_80": pa.array([top_n], pa.int64()),
            "top_share_pm": pa.array([cum80 * 1000 // total], pa.int64()),
        }
    )


def q22_sales_opportunity(sf_dir: str):
    """TPC-H q22 topology (global-sales-opportunity): customers whose balance
    is STRICTLY above the positive-balance average and who never placed a
    HIGH-VALUE order (>300k — "never ordered at all" is vacuous here, every
    customer orders), counted per country — the scalar-subquery broadcast +
    NOT-EXISTS
    anti-join shape that completes the repo's TPC-H sweep (q2/q9/q11/q16/q20
    need the absent ``partsupp`` table; q12/q21 need ship-mode/commit-date
    columns the testdata lacks; here the country code is ``c_nationkey``
    because ``c_phone`` is likewise absent — topology preserved, documented
    deviation).  The average gate is EXACT without a float division:
    ``bal > avg ⟺ bal_c · n > total_c`` in int64 (guarded multiply — the
    oracle's BIGINT product fails loudly at the same point); the scalar
    subquery is two driver scalars, never a row; the anti-join reuses the
    broadcast-set / partitioned-left-outer duality every keyed attach in
    this engine uses (reference join semantics: mix_blink/data.py gold
    removal)."""
    import ray

    from ..stages.clustering import clamped_partitions

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def with_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "bal_c": _cents(b["c_acctbal"]),
            }
        )

    cents = cust.map_batches(with_cents, batch_format="pyarrow").materialize()
    pos = cents.map_batches(
        lambda b: b.filter(pc.greater(b["bal_c"], pa.scalar(0, pa.int64()))),
        batch_format="pyarrow",
    )
    agg = pos.aggregate(Sum("bal_c"), Count())
    tot, n = int(agg["sum(bal_c)"]), int(agg["count()"])
    ext = cents.aggregate(Max("bal_c"), Min("bal_c"))
    if max(abs(int(ext["max(bal_c)"])), abs(int(ext["min(bal_c)"]))) * n >= 2**63:
        raise ValueError("q22_sales_opportunity: bal_c × n exceeds int64")
    rich = cents.map_batches(
        lambda b: b.filter(
            pc.greater(pc.multiply_checked(b["bal_c"], pa.scalar(n, pa.int64())), tot)
        ),
        batch_format="pyarrow",
    )
    # "never ordered" is vacuous in this data (every customer orders), so the
    # NOT-EXISTS side is the HIGH-VALUE order set (>300k) — same shape as
    # customers_without_orders, non-trivial result.
    okeys = (
        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": pc.unique(
                        b.filter(pc.greater(b["o_totalprice"], 300000.0))["o_custkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_keys = okeys.count()
    if n_keys <= _ANTI_BROADCAST_LIMIT:
        keys_ref = ray.put(pa.array(sorted(set(okeys.to_pandas()["o_custkey"])), pa.int64()))

        def anti(b: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
            return b.filter(pc.invert(pc.is_in(b["c_custkey"], value_set=ks)))

        idle = rich.map_batches(anti, batch_format="pyarrow")
    else:
        marks = (
            okeys.map_batches(
                lambda b: pa.table(
                    {"o_custkey": b["o_custkey"], "has_order": pa.array([True] * b.num_rows)}
                ),
                batch_format="pyarrow",
            )
            .groupby("o_custkey")
            .aggregate(Count(alias_name="n_marks"))
        )
        idle = rich.join(
            marks,
            join_type="left_outer",
            num_partitions=clamped_partitions(n_keys, 16),
            on=("c_custkey",),
            right_on=("o_custkey",),
        ).map_batches(
            lambda b: b.filter(pc.is_null(b["n_marks"])), batch_format="pyarrow"
        )
    out = (
        idle.groupby("nationkey")
        .aggregate(Count(alias_name="numcust"), Sum("bal_c", alias_name="bal_sum"))
        .to_pandas()
    )
    if len(out) == 0:  # empty groupby loses its schema in Ray — rebuild it
        out = out.reindex(columns=["nationkey", "numcust", "bal_sum"])
    return pa.table(
        {
            "nationkey": pa.array(out["nationkey"].to_numpy(dtype=np.int64), pa.int64()),
            "numcust": pa.array(out["numcust"].to_numpy(dtype=np.int64), pa.int64()),
            "totacctbal": pa.array(out["bal_sum"].to_numpy(dtype=np.int64) / 100.0, pa.float64()),
        }
    )


def events_type_overlap_kmv(sf_dir: str, k: int = 128):
    """Audience-overlap estimates between every event-type pair via KMV /
    theta bottom-k sketches (``stages.sketches.kmv_group_registers``) — the
    set-OPERATION sketch HLL cannot provide: union AND intersection
    cardinalities from fixed-size registers, with exact integer pair algebra
    over ``theta' = min(theta_a, theta_b)``.  Per-batch bottom-k partials
    bound the exchange at ``types × k`` rows per batch (row-count and
    cardinality free); only ``types × k`` register rows reach the driver;
    every estimate is ``cnt · 2**64 // theta`` in exact integers, so the
    whole sketch — registers, thetas, all four estimates — replays
    bit-for-bit in DuckDB HUGEINT SQL (``_build_kmv_oracle``)."""
    from ..stages.sketches import kmv_estimate, kmv_group_registers

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    regs = kmv_group_registers(ds, "event_type", "user_id", k=k)
    types = sorted(regs)
    rows = {"type_a": [], "type_b": [], "est_a": [], "est_b": [], "est_union": [], "est_inter": []}
    for i, a in enumerate(types):
        theta_a, ha = regs[a]
        for b in types[i + 1 :]:
            theta_b, hb = regs[b]
            th = min(theta_a, theta_b)
            sa = {h for h in ha if h < th}
            sb = {h for h in hb if h < th}
            rows["type_a"].append(a)
            rows["type_b"].append(b)
            rows["est_a"].append(kmv_estimate(len(ha), theta_a))
            rows["est_b"].append(kmv_estimate(len(hb), theta_b))
            rows["est_union"].append(kmv_estimate(len(sa | sb), th))
            rows["est_inter"].append(kmv_estimate(len(sa & sb), th))
    return pa.table(
        {
            "type_a": pa.array(rows["type_a"], pa.string()),
            "type_b": pa.array(rows["type_b"], pa.string()),
            "est_a": pa.array(rows["est_a"], pa.int64()),
            "est_b": pa.array(rows["est_b"], pa.int64()),
            "est_union": pa.array(rows["est_union"], pa.int64()),
            "est_inter": pa.array(rows["est_inter"], pa.int64()),
        }
    )


def parts_co_purchase_lift(
    sf_dir: str,
    min_support: int = 2,
    k: int = 20,
    max_basket: int = 4096,
    broadcast_limit: int | None = None,
):
    """Market-basket co-occurrence with EXACT integer lift — the frequent-
    pattern primitive (top-k co-purchased part pairs by lift, permille).

    One bucketed-run exchange does everything (``grouped_ordered_runs`` keyed
    by order, sorted by part): duplicate (order, part) rows collapse to one
    vectorized consecutive-dup mask, per-basket pairs come from the
    triangular expansion ``all_pairs_within_runs`` (NO Python per basket —
    unlike ``grouped_run_pairs``' per-colliding-key callback, here EVERY
    order collides so the expansion must be global), and each bucket
    contracts to three cell kinds in ONE schema via the packed int64 key
    ``a·2³² + b`` (pairs), ``a·2³² + SENTINEL`` (per-part basket counts) and
    ``−1`` (basket total): only contracted cells reach the single groupby.
    Baskets longer than ``max_basket`` RAISE (pair emission is inherently
    quadratic per basket — the hot-key guard convention, never silent), as
    does any partkey ≥ 2³¹ (the packing domain).  Lift is exact permille
    floor division — ``n_ab·N·1000 // (n_a·n_b)`` — with the numerator
    guarded in Python ints to RAISE where the oracle's BIGINT product would
    fail loudly too.  Deterministic top-k by (lift desc, part_a, part_b)
    through the partial-top-k merge, so only k rows reach the driver."""
    import ray

    from ..stages.clustering import cpu_scaled_partitions
    from ..stages.topk import topk_rows
    from ..stages.windows import all_pairs_within_runs, grouped_ordered_runs, run_index

    _SENT = (1 << 32) - 1  # impossible partkey (guarded < 2**31)
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {"cell": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        parts = np.asarray(g["l_partkey"], dtype=np.int64)
        if parts.max(initial=0) >= 1 << 31 or parts.min(initial=0) < 0:
            raise ValueError(
                "parts_co_purchase_lift: partkey outside [0, 2^31) — the "
                "packed-pair cell key would collide; widen the packing"
            )
        # collapse duplicate (order, part) rows: sorted by (order, part), a
        # dup is a non-run-start row equal to its predecessor
        keep = np.ones(len(parts), dtype=bool)
        keep[1:] = parts[1:] != parts[:-1]
        keep[starts] = True
        rid = run_index(starts, ends)[keep]
        parts = parts[keep]
        s2 = np.flatnonzero(np.r_[True, rid[1:] != rid[:-1]]).astype(np.int64)
        e2 = np.r_[s2[1:], len(rid)].astype(np.int64)
        if (e2 - s2).max(initial=0) > max_basket:
            raise ValueError(
                f"parts_co_purchase_lift: basket over {max_basket} distinct "
                "parts — quadratic pair emission; raise max_basket explicitly"
            )
        li, ri = all_pairs_within_runs(s2, e2)
        cells = [parts * (1 << 32) + np.int64(_SENT), np.array([-1], dtype=np.int64)]
        weights = [np.ones(len(parts), dtype=np.int64), np.array([len(s2)], dtype=np.int64)]
        if len(li):
            key = parts[li] * (1 << 32) + parts[ri]  # sorted ⇒ a < b
            uniq, cnt = np.unique(key, return_counts=True)
            cells.append(uniq)
            weights.append(cnt.astype(np.int64))
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cells)),
                "n_partial": pa.array(np.concatenate(weights)),
            }
        )

    agg = (
        grouped_ordered_runs(ds, "l_orderkey", ("l_partkey",), kernel)
        .groupby("cell")
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()  # contracted cells: ∝ distinct pairs, re-read 3×
    )
    n_baskets = int(agg.filter(expr="cell == -1").to_pandas()["n"].iloc[0])
    pcounts = agg.map_batches(
        lambda b: pa.table(
            {
                "pk": pc.divide(b["cell"], pa.scalar(1 << 32, pa.int64())),
                "n_part": b["n"],
            }
        ).filter(
            pc.and_(
                pc.greater_equal(b["cell"], pa.scalar(0, pa.int64())),  # not the -1 basket-total cell
                pc.equal(
                    pc.bit_wise_and(b["cell"], pa.scalar(_SENT, pa.int64())),
                    pa.scalar(_SENT, pa.int64()),
                ),
            )
        ),
        batch_format="pyarrow",
    )
    pairs = agg.map_batches(
        lambda b: pa.table(
            {
                "part_a": pc.divide(b["cell"], pa.scalar(1 << 32, pa.int64())),
                "part_b": pc.bit_wise_and(b["cell"], pa.scalar(_SENT, pa.int64())),
                "n_ab": b["n"],
            }
        ).filter(
            pc.and_(
                pc.greater_equal(b["n"], pa.scalar(min_support, pa.int64())),
                pc.and_(
                    pc.greater_equal(b["cell"], pa.scalar(0, pa.int64())),
                    pc.not_equal(
                        pc.bit_wise_and(b["cell"], pa.scalar(_SENT, pa.int64())),
                        pa.scalar(_SENT, pa.int64()),
                    ),
                ),
            )
        ),
        batch_format="pyarrow",
    )
    max_nab = pairs.max("n_ab") or 0
    if max_nab * n_baskets * 1000 >= 2**63:
        raise ValueError(
            "parts_co_purchase_lift: lift numerator exceeds int64 — the "
            "oracle's BIGINT product fails loudly here too"
        )

    def lift(b: pa.Table) -> pa.Table:
        nab = np.asarray(b["n_ab"], dtype=np.int64)
        na = np.asarray(b["n_a"], dtype=np.int64)
        nb = np.asarray(b["n_b"], dtype=np.int64)
        return pa.table(
            {
                "part_a": b["part_a"],
                "part_b": b["part_b"],
                "n_ab": b["n_ab"],
                "lift_permille": pa.array(nab * n_baskets * 1000 // (na * nb)),
            }
        )

    # ── per-part basket-count attach: broadcast sorted lut below the limit
    # (the part dimension ships ONCE via ray.put; searchsorted per batch),
    # else two partitioned joins — the house duality, forced-fallback
    # parity-tested ──
    if broadcast_limit is None:
        broadcast_limit = _SEMI_BROADCAST_LIMIT
    if pcounts.count() <= broadcast_limit:
        pt = pcounts.to_pandas()
        pk = pt["pk"].to_numpy(dtype=np.int64)
        o = np.argsort(pk)
        lut_ref = ray.put((pk[o], pt["n_part"].to_numpy(dtype=np.int64)[o]))

        def attach(b: pa.Table) -> pa.Table:
            lk, lv = ray.get(lut_ref)
            a = np.asarray(b["part_a"], dtype=np.int64)
            c = np.asarray(b["part_b"], dtype=np.int64)
            pos_a = np.clip(np.searchsorted(lk, a), 0, max(len(lk) - 1, 0))
            pos_b = np.clip(np.searchsorted(lk, c), 0, max(len(lk) - 1, 0))
            if len(lk) == 0 and len(a):
                raise ValueError("parts_co_purchase_lift: empty count lut with pairs present")
            if (lk[pos_a] != a).any() or (lk[pos_b] != c).any():
                raise ValueError("parts_co_purchase_lift: pair part missing from count lut")
            return pa.table(
                {
                    "part_a": b["part_a"],
                    "part_b": b["part_b"],
                    "n_ab": b["n_ab"],
                    "n_a": pa.array(lv[pos_a]),
                    "n_b": pa.array(lv[pos_b]),
                }
            )

        j = pairs.map_batches(attach, batch_format="pyarrow")
    else:
        n_parts = cpu_scaled_partitions(pairs.count())
        pcounts_a = pcounts.map_batches(
            lambda b: pa.table({"pk": b["pk"], "n_a": b["n_part"]}), batch_format="pyarrow"
        )
        pcounts_b = pcounts.map_batches(
            lambda b: pa.table({"pk": b["pk"], "n_b": b["n_part"]}), batch_format="pyarrow"
        )
        j = pairs.join(
            pcounts_a, join_type="inner", num_partitions=n_parts, on=("part_a",), right_on=("pk",)
        )
        j = j.join(
            pcounts_b, join_type="inner", num_partitions=n_parts, on=("part_b",), right_on=("pk",)
        )

    return topk_rows(
        j.map_batches(lift, batch_format="pyarrow"),
        ["lift_permille", "part_a", "part_b"],
        [True, False, False],
        k,
    )


def events_snapshot_diff(sf_dir: str):
    """Snapshot reconciliation (data-diff) between two versions of a keyed
    table — added / removed / changed / unchanged counts per event_type.

    The two versions derive DETERMINISTICALLY from events (both sides and
    the oracle compute the identical views, so the diff itself is what's
    tested): OLD drops rows with ``event_id % 97 == 0``; NEW drops rows with
    ``event_id % 89 == 0`` and increments ``value`` by 1.0 where
    ``event_id % 11 == 0``.  The 100-TB shape: a FULL OUTER JOIN on the key
    is ONE bucketed-run exchange — both sides tagged and bucketed by
    ``hash(key)``, in-bucket sort by (key, side), run length 1 ⇒
    added/removed by side, length 2 ⇒ vectorized payload compare (value
    bit-equal, user, ts, type) ⇒ changed/unchanged — and each bucket
    contracts to (event_type, status, n) cells, so row-scale data crosses
    the exchange exactly once and only type×4-bounded cells reach the final
    groupby.  A key appearing twice on ONE side RAISES (diff requires a
    primary key; silent last-wins would lie)."""
    from ..stages.windows import grouped_ordered_runs

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])

    def tag(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], dtype=np.int64)
        val = np.asarray(b["value"], dtype=np.float64)
        ts = np.asarray(pc.cast(b["ts"], pa.int64()), dtype=np.int64)
        uid = np.asarray(b["user_id"], dtype=np.int64)
        et = b["event_type"]
        newval = np.where(eid % 11 == 0, val + 1.0, val)
        out = []
        for side, mask, v in ((0, eid % 97 != 0, val), (1, eid % 89 != 0, newval)):
            idx = pa.array(np.flatnonzero(mask))
            out.append(
                pa.table(
                    {
                        "event_id": pa.array(eid[mask]),
                        "side": pa.array(np.full(int(mask.sum()), side, np.int64)),
                        "user_id": pa.array(uid[mask]),
                        "event_type": pc.take(et, idx),
                        "ts_us": pa.array(ts[mask]),
                        "value": pa.array(v[mask]),
                    }
                )
            )
        return pa.concat_tables(out)

    def kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "status": pa.array([], pa.string()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        lens = ends - starts
        if lens.max(initial=0) > 2:
            raise ValueError(
                "events_snapshot_diff: key repeats within one snapshot — "
                "diff requires a primary key"
            )
        side = np.asarray(g["side"], dtype=np.int64)
        val = np.asarray(g["value"], dtype=np.float64)
        uid = np.asarray(g["user_id"], dtype=np.int64)
        ts = np.asarray(g["ts_us"], dtype=np.int64)
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        codes = np.asarray(enc.indices, dtype=np.int64)
        # statuses: 0 added, 1 removed, 2 changed, 3 unchanged
        two = lens == 2
        status = np.where(side[starts] == 0, 1, 0)  # singles: old-only=removed, new-only=added
        i0 = starts[two]
        if ((side[i0] != 0) | (side[i0 + 1] != 1)).any():
            raise ValueError("events_snapshot_diff: key repeats within one snapshot")
        same = (
            (val[i0] == val[i0 + 1])
            & (uid[i0] == uid[i0 + 1])
            & (ts[i0] == ts[i0 + 1])
            & (codes[i0] == codes[i0 + 1])
        )
        status[two] = np.where(same, 3, 2)
        et_run = codes[ends - 1]  # the NEW side's type when present
        cellkey = et_run * 4 + status
        uniq, cnt = np.unique(cellkey, return_counts=True)
        names = pa.array(["added", "removed", "changed", "unchanged"])
        return pa.table(
            {
                "event_type": enc.dictionary.take(pa.array(uniq // 4)),
                "status": names.take(pa.array(uniq % 4)),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = grouped_ordered_runs(
        ds.map_batches(tag, batch_format="pyarrow"), "event_id", ("side",), kernel
    )
    out = cells.groupby(["event_type", "status"]).aggregate(
        Sum("n_partial", alias_name="n")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "nation_customer_stats": nation_customer_stats,
    "orders_top10_value": orders_top10_value,
    "supplier_nation_counts": supplier_nation_counts,
    "customer_segments": customer_segments,
    "parts_by_brand": parts_by_brand,
    "region_nation_counts": region_nation_counts,
    "events_props_k_stats": events_props_k_stats,
    "events_by_type": events_by_type,
    "events_hourly_window": events_hourly_window,
    "events_union_extremes": events_union_extremes,
    "events_user_sessions": events_user_sessions,
    "events_sessionized": events_sessionized,
    "events_top3_per_type": events_top3_per_type,
    "events_lag_prev": events_lag_prev,
    "events_context_window": events_context_window,
    "events_distinct_types_running": events_distinct_types_running,
    "events_value_histogram": events_value_histogram,
    "customers_without_orders": customers_without_orders,
    "docs_normalize": docs_normalize,
    "docs_token_stats": docs_token_stats,
    "docs_repetition": docs_repetition,
    "docs_heavy_tokens": docs_heavy_tokens,
    "events_running_revenue": events_running_revenue,
    "docs_pack_bins": docs_pack_bins,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "emb_quantized_stats": emb_quantized_stats,
    "docs_sample_weighted": docs_sample_weighted,
    "emb_knn_quantized_top5": emb_knn_quantized_top5,
    "events_user_type_pivot": events_user_type_pivot,
    "emb_label_centroids": emb_label_centroids,
    "customers_order_counts": customers_order_counts,
    "docs_tokens": docs_tokens,
    "docs_decontaminate": docs_decontaminate,
    "docs_dup_spans": docs_dup_spans,
    "docs_rarity": docs_rarity,
    "docs_search_top10": docs_search_top10,
    "docs_budget_mix": docs_budget_mix,
    "docs_top_bigrams": docs_top_bigrams,
    "customers_name_neighbors": customers_name_neighbors,
    "events_funnel": events_funnel,
    "sources_distinctive_tokens": sources_distinctive_tokens,
    "events_user_paths": events_user_paths,
    "events_value_locf": events_value_locf,
    "emb_code_gram": emb_code_gram,
    "q7_nation_volume": q7_nation_volume,
    "nation_top_customer": nation_top_customer,
    "events_value_quartiles": events_value_quartiles,
    "brand_distinct_suppliers": brand_distinct_suppliers,
    "events_retention_cohorts": events_retention_cohorts,
    "docs_meta_blocking": docs_meta_blocking,
    "docs_blocking_skew": docs_blocking_skew,
    "docs_rendezvous_resharding": docs_rendezvous_resharding,
    "docs_weighted_sample": docs_weighted_sample,
    "docs_media_features": docs_media_features,
    "docs_media_dimensions": docs_media_dimensions,
    "docs_media_audio": docs_media_audio,
    "docs_media_video": docs_media_video,
    "docs_er_clusters": docs_er_clusters,
    "docs_er_clusters_capped": docs_er_clusters_capped,
    "docs_stratified_folds": docs_stratified_folds,
    "docs_search_rrf": docs_search_rrf,
    "docs_er_golden_records": docs_er_golden_records,
    "events_user_primary_type": events_user_primary_type,
    "events_type_transitions": events_type_transitions,
    "events_user_median_gap": events_user_median_gap,
    "events_user_twap": events_user_twap,
    "events_user_active_coverage": events_user_active_coverage,
    "events_user_longest_streak": events_user_longest_streak,
    "docs_blocking_quality": docs_blocking_quality,
    "users_click_purchase_full_outer": users_click_purchase_full_outer,
    "events_tumbling_late": events_tumbling_late,
    "customers_surface_link_top3": customers_surface_link_top3,
    "events_value_mode_median": events_value_mode_median,
    "q10_returned_revenue": q10_returned_revenue,
    "events_user_type_unpivot": events_user_type_unpivot,
    "users_click_and_purchase": users_click_and_purchase,
    "events_value_hour_corr": events_value_hour_corr,
    "events_type_hour_chi2": events_type_hour_chi2,
    "events_table_checksum": events_table_checksum,
    "events_benford_digits": events_benford_digits,
    "parts_skyline": parts_skyline,
    "docs_fs_match_weights": docs_fs_match_weights,
    "events_user_day_interp": events_user_day_interp,
    "docs_canopy_assign": docs_canopy_assign,
    "docs_dbscan_clusters": docs_dbscan_clusters,
    "events_user_load_gini": events_user_load_gini,
    "docs_fold_leakage_audit": docs_fold_leakage_audit,
    "emb_knn_lsh_recall": emb_knn_lsh_recall,
    "docs_fs_calibration": docs_fs_calibration,
    "docs_minhash_calibration": docs_minhash_calibration,
    "docs_nearest_neighbor": docs_nearest_neighbor,
    "docs_best_match_clusters": docs_best_match_clusters,
    "events_survival_curve": events_survival_curve,
    "events_minute_rate_ewma": events_minute_rate_ewma,
    "events_value_mad": events_value_mad,
    "events_value_hour_regression": events_value_hour_regression,
    "docs_simgraph_triangles": docs_simgraph_triangles,
    "docs_simgraph_pagerank": docs_simgraph_pagerank,
    "q6_forecast_revenue": q6_forecast_revenue,
    "docs_bpe_token_counts": docs_bpe_token_counts,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_exact_dedup_hash": docs_exact_dedup_hash,
    "docs_distinct_sources": docs_distinct_sources,
    "docs_top_sources": docs_top_sources,
    "docs_filter_long": docs_filter_long,
    "docs_fingerprint": docs_fingerprint,
    "docs_lang_id": docs_lang_id,
    "docs_quality": docs_quality,
    "docs_quality_filter": docs_quality_filter,
    "docs_truncate_tokens": docs_truncate_tokens,
    "docs_minhash_near_dup": docs_minhash_near_dup,
    "docs_simhash": docs_simhash,
    "docs_dedup_corpus": docs_dedup_corpus,
    "docs_dedup_corpus_exact": docs_dedup_corpus_exact,
    "docs_window_jaccard": docs_window_jaccard,
    "docs_window_jaccard_clusters": docs_window_jaccard_clusters,
    "jsonl_mentions": jsonl_mentions,
    "emb_knn_top5": emb_knn_top5,
    "emb_mutual_knn": emb_mutual_knn,
    "emb_knn_lsh_top5": emb_knn_lsh_top5,
    "emb_knn_ivf_top5": emb_knn_ivf_top5,
    "docs_near_dup_verified": docs_near_dup_verified,
    "docs_near_dup_windowed": docs_near_dup_windowed,
    "sources_shingle_overlap": sources_shingle_overlap,
    "docs_vocab_growth": docs_vocab_growth,
    "sources_token_waterfill": sources_token_waterfill,
    "sources_temperature_mix": sources_temperature_mix,
    "docs_wordpiece_encode": docs_wordpiece_encode,
    "docs_subset_join": docs_subset_join,
    "docs_chunk_windows": docs_chunk_windows,
    "lineitem_bloom_semi_join": lineitem_bloom_semi_join,
    "emb_norms": emb_norms,
    "emb_near_dup": emb_near_dup,
    "emb_semantic_dedup": emb_semantic_dedup,
    "docs_lm_perplexity": docs_lm_perplexity,
    "docs_dsir_importance": docs_dsir_importance,
    "emb_near_dup_exact": emb_near_dup_exact,
    "events_value_quantiles": events_value_quantiles,
    "events_range_bins": events_range_bins,
    "events_distinct_users": events_distinct_users,
    "docs_sample_hash": docs_sample_hash,
    "docs_sample_stratified": docs_sample_stratified,
    "docs_vocab_top50": docs_vocab_top50,
    "docs_top_terms": docs_top_terms,
    "docs_inverted_index": docs_inverted_index,
    "events_sliding_1h": events_sliding_1h,
    "events_purchase_asof_view": events_purchase_asof_view,
    "events_rollup": events_rollup,
    "events_cube": events_cube,
    "docs_bpe_merges": docs_bpe_merges,
    "docs_bpe_encode_fixed": docs_bpe_encode_fixed,
    "events_zorder_cells": events_zorder_cells,
    "docs_simjoin_exact": docs_simjoin_exact,
    "customers_name_edit1": customers_name_edit1,
    "docs_er_cluster_purity": docs_er_cluster_purity,
    "docs_er_rand_index": docs_er_rand_index,
    "customers_pagerank": customers_pagerank,
    "customers_wl_fingerprint": customers_wl_fingerprint,
    "docs_search_bm25": docs_search_bm25,
    "sources_lexical_diversity": sources_lexical_diversity,
    "events_top3_values_dense": events_top3_values_dense,
    "q4_order_priority": q4_order_priority,
    "q14_promo_share": q14_promo_share,
    "docs_regex_scrub": docs_regex_scrub,
    "events_p95_filter": events_p95_filter,
    "docs_split_assign": docs_split_assign,
    "docs_split_leakage_safe": docs_split_leakage_safe,
    "nation_order_revenue": nation_order_revenue,
    "events_approx_distinct_users": events_approx_distinct_users,
    "events_cms_user_counts": events_cms_user_counts,
    "events_salted_type_join": events_salted_type_join,
    "events_interval_join_windows": events_interval_join_windows,
    "events_sliding_distinct_users": events_sliding_distinct_users,
    "events_value_quantile_sketch": events_value_quantile_sketch,
    "events_type_value_quantile_sketch": events_type_value_quantile_sketch,
    "events_value_cume_dist": events_value_cume_dist,
    "users_click_no_purchase": users_click_no_purchase,
    "docs_epoch_shuffle": docs_epoch_shuffle,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q8_market_share": q8_market_share,
    "q22_sales_opportunity": q22_sales_opportunity,
    "events_mad_outliers": events_mad_outliers,
    "events_user_rfm": events_user_rfm,
    "events_dau_wau_stickiness": events_dau_wau_stickiness,
    "events_weekly_churn": events_weekly_churn,
    "orders_revenue_pareto": orders_revenue_pareto,
    "events_type_overlap_kmv": events_type_overlap_kmv,
    "parts_co_purchase_lift": parts_co_purchase_lift,
    "events_snapshot_diff": events_snapshot_diff,
}


ORACLE_SQL = {
    "q7_nation_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
                   / 1000000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
          AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
          AND n1.n_name <> n2.n_name
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    "nation_top_customer": """
        SELECT n_name, c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) / 100.0 AS acctbal
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey
                   ) AS rn
            FROM customer
        ) JOIN nation ON c_nationkey = n_nationkey
        WHERE rn = 1
    """,
    "events_value_quartiles": """
        SELECT event_type, quartile, count(*) AS n,
               CAST(round(min(value) * 1000000) AS BIGINT) / 1000000.0 AS lo,
               CAST(round(max(value) * 1000000) AS BIGINT) / 1000000.0 AS hi
        FROM (
            SELECT event_type, value,
                   ntile(4) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS quartile
            FROM events
        )
        GROUP BY event_type, quartile
    """,
    "brand_distinct_suppliers": """
        SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "events_retention_cohorts": """
        WITH d AS (
            SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
            FROM events
        ), c AS (
            SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
        )
        SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
               count(*) AS n_users
        FROM d JOIN c USING (user_id)
        GROUP BY c.cohort_day, d.day - c.cohort_day
    """,
    "users_click_and_purchase": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
    "events_user_load_gini": """
        WITH pu AS (
            SELECT user_id, CAST(count(*) AS HUGEINT) AS c FROM events GROUP BY user_id
        ), h AS (
            SELECT c, CAST(count(*) AS HUGEINT) AS m FROM pu GROUP BY c
        ), w AS (
            SELECT c, m,
                   COALESCE(sum(m) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
            FROM h
        ), agg AS (
            SELECT sum(c * (m * p + (m * (m + 1)) // 2)) AS s1,
                   sum(c * m) AS s, sum(m) AS n
            FROM w
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               CAST(s AS BIGINT) AS total_events,
               CAST((1000 * (2 * s1 - (n + 1) * s)) // (n * s) AS BIGINT) AS gini_permille
        FROM agg
    """,
    "docs_dbscan_clusters": """
        WITH RECURSIVE toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), blk AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 20
        ), cand AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            JOIN blk ON a.gram = blk.gram
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        ), cg AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT c.a_id, c.b_id
            FROM cand c JOIN cg a ON a.doc_id = c.a_id JOIN cg b ON b.doc_id = c.b_id
            WHERE 2 * len(list_intersect(a.grams, b.grams))
                  >= len(list_distinct(list_concat(a.grams, b.grams)))
        ), e AS (
            SELECT a_id AS u, b_id AS v FROM p UNION ALL SELECT b_id, a_id FROM p
        ), deg AS (
            SELECT u AS v, count(*) AS d FROM e GROUP BY u
        ), core AS (
            SELECT v FROM deg WHERE d >= 4
        ), cce AS (
            SELECT p.a_id, p.b_id FROM p
            JOIN core c1 ON c1.v = p.a_id JOIN core c2 ON c2.v = p.b_id
        ), ee AS (
            SELECT a_id AS src, b_id AS dst FROM cce
            UNION ALL SELECT b_id, a_id FROM cce
        ), reach(node, m) AS (
            SELECT v, v FROM core
            UNION
            SELECT ee.dst, r.m FROM reach r JOIN ee ON ee.src = r.node
        ), clab AS (
            SELECT node AS v, min(m) AS cluster_id FROM reach GROUP BY node
        ), border AS (
            SELECT e.u AS v, min(cl.cluster_id) AS cluster_id
            FROM e JOIN core c ON c.v = e.v JOIN clab cl ON cl.v = e.v
            WHERE e.u NOT IN (SELECT v FROM core)
            GROUP BY e.u
        )
        SELECT d.doc_id,
               CASE WHEN c.v IS NOT NULL THEN 'core'
                    WHEN b.v IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               CAST(COALESCE(cl.cluster_id, b.cluster_id, -1) AS BIGINT) AS cluster_id
        FROM documents d
        LEFT JOIN core c ON c.v = d.doc_id
        LEFT JOIN clab cl ON cl.v = d.doc_id
        LEFT JOIN border b ON b.v = d.doc_id
    """,
    "docs_nearest_neighbor": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), blk AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 20
        ), cand AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            JOIN blk ON a.gram = blk.gram
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        ), cg AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), pj AS (
            SELECT c.a_id, c.b_id,
                   CAST(len(list_intersect(ca.grams, cb.grams)) AS BIGINT) AS inter,
                   CAST(greatest(len(list_distinct(list_concat(ca.grams, cb.grams))), 1)
                        AS BIGINT) AS uni
            FROM cand c JOIN cg ca ON ca.doc_id = c.a_id JOIN cg cb ON cb.doc_id = c.b_id
        ), orient AS (
            SELECT a_id AS doc_id, b_id AS nbr, inter, uni FROM pj
            UNION ALL SELECT b_id, a_id, inter, uni FROM pj
        ), ranked AS (
            SELECT doc_id, nbr, inter, uni, 1000 * inter // uni AS p,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY 1000 * inter // uni DESC, nbr) AS rn
            FROM orient
        )
        SELECT doc_id, nbr AS nbr_id, inter, uni, p AS jaccard_permille
        FROM ranked WHERE rn = 1
    """,
    "events_survival_curve": """
        WITH RECURSIVE lu AS (
            SELECT user_id, max(epoch_us(ts)) // 86400000000 AS d
            FROM events GROUP BY user_id
        ), h AS (
            SELECT d, CAST(count(*) AS BIGINT) AS churned FROM lu GROUP BY d
        ), w AS (
            SELECT d, churned,
                   CAST(sum(churned) OVER (ORDER BY d DESC) AS BIGINT) AS at_risk,
                   CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
            FROM h
        ), rec(rn, s) AS (
            SELECT CAST(0 AS BIGINT), CAST(1000000 AS BIGINT)
            UNION ALL
            SELECT w.rn, rec.s * (w.at_risk - w.churned) // w.at_risk
            FROM rec JOIN w ON w.rn = rec.rn + 1
        )
        SELECT w.d AS day, w.at_risk, w.churned, rec.s AS survival_ppm
        FROM w JOIN rec ON rec.rn = w.rn
    """,
    "docs_canopy_assign": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), cells AS (
            SELECT DISTINCT doc_id, t[i] AS w
            FROM toks, unnest(range(1, len(t) + 1)) AS r(i)
        ), df AS (
            SELECT w, CAST(count(*) AS BIGINT) AS df FROM cells GROUP BY w
        ), ranked AS (
            SELECT c.doc_id, c.w, d.df,
                   row_number() OVER (PARTITION BY c.doc_id ORDER BY d.df, c.w) AS rn
            FROM cells c JOIN df d USING (w)
        ), pick AS (
            SELECT doc_id, w AS canopy_token, df AS canopy_df FROM ranked WHERE rn = 1
        ), sz AS (
            SELECT canopy_token, CAST(count(*) AS BIGINT) AS canopy_size
            FROM pick GROUP BY canopy_token
        )
        SELECT p.doc_id, p.canopy_token, p.canopy_df, s.canopy_size
        FROM pick p JOIN sz s USING (canopy_token)
    """,
    "events_user_day_interp": """
        WITH e0 AS (
            SELECT user_id, epoch_us(ts) AS t,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events
        ), ded AS (
            SELECT user_id, t, c FROM e0 WHERE rn = 1
        ), spans AS (
            SELECT user_id, min(t) AS lo, max(t) AS hi FROM ded GROUP BY user_id
        ), grid AS (
            SELECT s.user_id, d * 86400000000 AS g
            FROM spans s, unnest(range((s.lo + 86399999999) // 86400000000,
                                       s.hi // 86400000000 + 1)) AS r(d)
        ), iv AS (
            SELECT user_id, t AS t0, c AS v0,
                   coalesce(LEAD(t) OVER w, t + 1) AS t1,
                   coalesce(LEAD(c) OVER w, c) AS v1
            FROM ded WINDOW w AS (PARTITION BY user_id ORDER BY t)
        )
        SELECT g.user_id, make_timestamp(g.g) AS grid_ts,
               (iv.v0 * (iv.t1 - g.g) + iv.v1 * (g.g - iv.t0)) // (iv.t1 - iv.t0) AS value_c
        FROM grid g JOIN iv ON iv.user_id = g.user_id
                           AND g.g >= iv.t0 AND g.g < iv.t1
    """,
    "docs_fs_match_weights": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), blk AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 20
        ), cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            JOIN blk ON a.gram = blk.gram
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        ), cg AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), pj AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(ca.grams, cb.grams)) AS BIGINT) AS inter,
                   CAST(len(list_distinct(list_concat(ca.grams, cb.grams))) AS BIGINT) AS uni
            FROM cand c JOIN cg ca ON ca.doc_id = c.doc_a JOIN cg cb ON cb.doc_id = c.doc_b
        ), f AS (
            SELECT p.doc_a, p.doc_b,
                   CASE WHEN 10 * p.inter >= 7 * p.uni THEN 1 ELSE 0 END AS is_match,
                   CASE WHEN da.lang = db.lang THEN 1 ELSE 0 END AS agree_lang,
                   CASE WHEN da.source = db.source THEN 1 ELSE 0 END AS agree_source,
                   CASE WHEN da.n_chars // 64 = db.n_chars // 64 THEN 1 ELSE 0 END AS agree_len
            FROM pj p JOIN documents da ON da.doc_id = p.doc_a
                      JOIN documents db ON db.doc_id = p.doc_b
        ), s AS (
            SELECT CAST(sum(is_match) AS HUGEINT) AS n_m,
                   CAST(count(*) - sum(is_match) AS HUGEINT) AS n_u,
                   CAST(sum(is_match * agree_lang) AS HUGEINT) AS am1,
                   CAST(sum((1 - is_match) * agree_lang) AS HUGEINT) AS au1,
                   CAST(sum(is_match * agree_source) AS HUGEINT) AS am2,
                   CAST(sum((1 - is_match) * agree_source) AS HUGEINT) AS au2,
                   CAST(sum(is_match * agree_len) AS HUGEINT) AS am3,
                   CAST(sum((1 - is_match) * agree_len) AS HUGEINT) AS au3
            FROM f
        )
        SELECT f.doc_a, f.doc_b,
               CAST(f.agree_lang AS BIGINT) AS agree_lang,
               CAST(f.agree_source AS BIGINT) AS agree_source,
               CAST(f.agree_len AS BIGINT) AS agree_len,
               CAST(f.is_match AS BIGINT) AS is_match,
               CAST((1000000::HUGEINT
                     * (CASE WHEN f.agree_lang = 1 THEN s.am1 + 1 ELSE s.n_m - s.am1 + 1 END) * (s.n_u + 2)
                     * (CASE WHEN f.agree_source = 1 THEN s.am2 + 1 ELSE s.n_m - s.am2 + 1 END) * (s.n_u + 2)
                     * (CASE WHEN f.agree_len = 1 THEN s.am3 + 1 ELSE s.n_m - s.am3 + 1 END) * (s.n_u + 2))
                    // ((CASE WHEN f.agree_lang = 1 THEN s.au1 + 1 ELSE s.n_u - s.au1 + 1 END) * (s.n_m + 2)
                      * (CASE WHEN f.agree_source = 1 THEN s.au2 + 1 ELSE s.n_u - s.au2 + 1 END) * (s.n_m + 2)
                      * (CASE WHEN f.agree_len = 1 THEN s.au3 + 1 ELSE s.n_u - s.au3 + 1 END) * (s.n_m + 2))
                    AS BIGINT) AS weight_ppm
        FROM f, s
    """,
    "parts_skyline": """
        WITH p AS (
            SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
            FROM part
        )
        SELECT a.p_partkey, a.p_size, a.price_c FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.p_size >= a.p_size AND b.price_c <= a.price_c
              AND (b.p_size > a.p_size OR b.price_c < a.price_c)
        )
    """,
    "events_benford_digits": """
        WITH c AS (
            SELECT abs(CAST(round(value * 100) AS BIGINT)) AS v FROM events
            WHERE CAST(round(value * 100) AS BIGINT) <> 0
        ),
        d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
        g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
        SELECT g.digit, g.n,
               CAST((1000 * g.n) // t.tot AS BIGINT) AS share_permille
        FROM g, t
    """,
    "events_type_hour_chi2": """
        WITH cells AS (
            SELECT event_type, hour(ts) AS hr, CAST(count(*) AS HUGEINT) AS o
            FROM events GROUP BY event_type, hour(ts)
        ),
        tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM events),
        rm AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY event_type),
        cm AS (SELECT hr, sum(o) AS c FROM cells GROUP BY hr),
        grid AS (
            SELECT rm.event_type, cm.hr, rm.r, cm.c, COALESCE(cl.o, 0) AS o
            FROM rm CROSS JOIN cm
            LEFT JOIN cells cl ON cl.event_type = rm.event_type AND cl.hr = cm.hr
        ),
        chi AS (
            SELECT sum((1000 * (t.n * g.o - g.r * g.c) * (t.n * g.o - g.r * g.c))
                       // (t.n * g.r * g.c)) AS chi2_milli
            FROM grid g, tot t
        )
        SELECT CAST(t.n AS BIGINT) AS n_events,
               (SELECT count(*) FROM rm) AS n_types,
               (SELECT count(*) FROM cm) AS n_hours,
               CAST(((SELECT count(*) FROM rm) - 1)
                    * ((SELECT count(*) FROM cm) - 1) AS BIGINT) AS df,
               CAST(chi.chi2_milli AS BIGINT) AS chi2_milli
        FROM chi, tot t
    """,
    "events_value_hour_corr": """
        WITH s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
                   CAST(sum(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sy,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)
                            * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx,
                   CAST(sum(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS syy,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)
                            * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxy
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               CAST(round(
                   CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                        THEN (n * sxy - sx * sy)
                             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                        ELSE 0 END * 1000000) AS BIGINT) / 1000000.0 AS r
        FROM s
    """,
    "q6_forecast_revenue": """
        SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    "docs_simgraph_triangles": """
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.5
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_edges,
               (SELECT CAST(count(*) AS BIGINT)
                FROM p e1 JOIN p e2 ON e1.b_id = e2.a_id
                JOIN p e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id) AS n_triangles
    """,
    "docs_simgraph_pagerank": """
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.5
        ), e AS (
            SELECT a_id AS src, b_id AS dst FROM p
            UNION ALL SELECT b_id, a_id FROM p
        ), d AS (
            SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
        ), n0 AS (
            SELECT doc_id AS node FROM documents
        ), r0 AS (
            SELECT node, CAST(1000000 AS BIGINT) AS r FROM n0
        ), s1 AS (
            SELECT e.dst AS node, CAST(sum(r0.r // d.deg) AS BIGINT) AS s
            FROM e JOIN d ON d.src = e.src JOIN r0 ON r0.node = e.src GROUP BY e.dst
        ), r1 AS (
            SELECT n0.node,
                   CAST(150000 + (850000 * COALESCE(s1.s, 0)) // 1000000 AS BIGINT) AS r
            FROM n0 LEFT JOIN s1 ON s1.node = n0.node
        ), s2 AS (
            SELECT e.dst AS node, CAST(sum(r1.r // d.deg) AS BIGINT) AS s
            FROM e JOIN d ON d.src = e.src JOIN r1 ON r1.node = e.src GROUP BY e.dst
        ), r2 AS (
            SELECT n0.node,
                   CAST(150000 + (850000 * COALESCE(s2.s, 0)) // 1000000 AS BIGINT) AS r
            FROM n0 LEFT JOIN s2 ON s2.node = n0.node
        ), s3 AS (
            SELECT e.dst AS node, CAST(sum(r2.r // d.deg) AS BIGINT) AS s
            FROM e JOIN d ON d.src = e.src JOIN r2 ON r2.node = e.src GROUP BY e.dst
        ), r3 AS (
            SELECT n0.node,
                   CAST(150000 + (850000 * COALESCE(s3.s, 0)) // 1000000 AS BIGINT) AS r
            FROM n0 LEFT JOIN s3 ON s3.node = n0.node
        )
        SELECT node AS doc_id, r AS pagerank FROM r3
    """,
    "events_value_mad": """
        WITH cells AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cell FROM events
        ), med AS (
            SELECT event_type, quantile_disc(cell, 0.5) AS m
            FROM cells GROUP BY event_type
        ), mad AS (
            SELECT c.event_type, quantile_disc(abs(c.cell - med.m), 0.5) AS d
            FROM cells c JOIN med ON c.event_type = med.event_type
            GROUP BY c.event_type
        )
        SELECT med.event_type, med.m / 100.0 AS median_value, mad.d / 100.0 AS mad
        FROM med JOIN mad ON med.event_type = mad.event_type
    """,
    "events_value_hour_regression": """
        WITH s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sx,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
                   CAST(sum(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxx,
                   CAST(sum(CAST(hour(ts) AS BIGINT)
                            * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxy
            FROM events GROUP BY event_type
        ), fit AS (
            SELECT event_type, n, sx, sy,
                   CASE WHEN (n * sxx - sx * sx) > 0
                        THEN (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
                        ELSE 0 END AS slope_raw
            FROM s
        )
        SELECT event_type,
               CAST(round(slope_raw / 100.0 * 1000000) AS BIGINT) / 1000000.0 AS slope,
               CAST(round((sy - slope_raw * sx) / n / 100.0 * 1000000) AS BIGINT) / 1000000.0
                   AS intercept
        FROM fit
    """,
    "events_minute_rate_ewma": """
        WITH RECURSIVE c AS (
            SELECT epoch_us(ts) // 60000000 AS minute, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY epoch_us(ts) // 60000000
        ), o AS (
            SELECT minute, n, row_number() OVER (ORDER BY minute) AS rn FROM c
        ), e(rn, minute, n, ewma) AS (
            SELECT rn, minute, n, CAST(n AS DOUBLE) FROM o WHERE rn = 1
            UNION ALL
            SELECT o.rn, o.minute, o.n, (e.ewma + o.n) * 0.5
            FROM e JOIN o ON o.rn = e.rn + 1
        )
        SELECT minute, n, ewma FROM e
    """,
    "events_value_mode_median": """
        WITH cells AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cell
            FROM events
        ), modes AS (
            SELECT event_type, cell FROM (
                SELECT event_type, cell,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY count(*) DESC, cell) AS rn
                FROM cells GROUP BY event_type, cell
            ) WHERE rn = 1
        ), med AS (
            SELECT event_type, quantile_cont(cell, 0.5) AS m FROM cells GROUP BY event_type
        )
        SELECT modes.event_type, modes.cell / 100.0 AS mode_value,
               med.m / 100.0 AS median_cont
        FROM modes JOIN med ON modes.event_type = med.event_type
    """,
    "q10_returned_revenue": """
        SELECT c_custkey, c_name, n_name,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))) DESC, c_custkey
        LIMIT 20
    """,
    "events_user_type_unpivot": """
        WITH wide AS (
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        )
        SELECT user_id, 'click' AS event_type, n_click AS n FROM wide
        UNION ALL SELECT user_id, 'error', n_error FROM wide
        UNION ALL SELECT user_id, 'purchase', n_purchase FROM wide
        UNION ALL SELECT user_id, 'signup', n_signup FROM wide
        UNION ALL SELECT user_id, 'view', n_view FROM wide
    """,
    "customers_surface_link_top3": """
        WITH cg AS (
            SELECT c_custkey AS cid,
                   ((CAST(ascii(substr(c_name, CAST(i AS INT), 1)) AS HUGEINT) * 1099511628211
                     + ascii(substr(c_name, CAST(i AS INT) + 1, 1))) * 1099511628211
                     + ascii(substr(c_name, CAST(i AS INT) + 2, 1)))
                   % 18446744073709551616 AS h
            FROM customer, unnest(range(1, len(c_name) - 1)) AS r(i)
        ), sg AS (
            SELECT s_suppkey AS sid,
                   ((CAST(ascii(substr(s_name, CAST(i AS INT), 1)) AS HUGEINT) * 1099511628211
                     + ascii(substr(s_name, CAST(i AS INT) + 1, 1))) * 1099511628211
                     + ascii(substr(s_name, CAST(i AS INT) + 2, 1)))
                   % 18446744073709551616 AS h
            FROM supplier, unnest(range(1, len(s_name) - 1)) AS r(i)
        ), cf AS (
            SELECT cid, CAST(h % 64 AS BIGINT) AS col,
                   CAST(sum(((h // 4294967296) % 2) * 2 - 1) AS BIGINT) AS v
            FROM cg GROUP BY cid, h % 64
        ), sfeat AS (
            SELECT sid, CAST(h % 64 AS BIGINT) AS col,
                   CAST(sum(((h // 4294967296) % 2) * 2 - 1) AS BIGINT) AS v
            FROM sg GROUP BY sid, h % 64
        ), d AS (
            SELECT cf.cid, sfeat.sid, CAST(sum(cf.v * sfeat.v) AS BIGINT) AS dot
            FROM cf JOIN sfeat ON cf.col = sfeat.col
            GROUP BY cf.cid, sfeat.sid
        ), fullx AS (
            SELECT c.c_custkey, s.s_suppkey, COALESCE(d.dot, 0) AS dot
            FROM customer c CROSS JOIN supplier s
            LEFT JOIN d ON d.cid = c.c_custkey AND d.sid = s.s_suppkey
        )
        SELECT c_custkey, CAST(rank AS BIGINT) AS rank, s_suppkey, dot FROM (
            SELECT c_custkey, s_suppkey, dot,
                   row_number() OVER (PARTITION BY c_custkey
                                      ORDER BY dot DESC, s_suppkey) AS rank
            FROM fullx
        ) WHERE rank <= 3
    """,
    "users_click_purchase_full_outer": """
        WITH c AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
            FROM events WHERE event_type = 'click' GROUP BY user_id
        ), p AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        )
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(c.n_clicks, 0) AS n_clicks,
               COALESCE(p.n_purchases, 0) AS n_purchases
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
    "events_tumbling_late": """
        WITH wm AS (SELECT max(epoch_us(ts)) - 600000000 AS watermark FROM events)
        SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM events, wm
        WHERE (epoch_us(ts) // 600000000 + 1) * 600000000 <= wm.watermark
        GROUP BY (epoch_us(ts) // 600000000) * 600000000
    """,
    "docs_blocking_quality": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
        ), toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM corpus WHERE trim(text) <> ''
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), blk AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 20
        ), cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            JOIN blk ON a.gram = blk.gram
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_records,
               (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id < 50) AS n_true_pairs,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(count(*) FILTER (doc_a < 50 AND doc_b = doc_a + 1000000) AS BIGINT)
                   AS n_true_found
        FROM cand
    """,
    "docs_er_clusters": """
        WITH RECURSIVE toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), blk AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 20
        ), cand AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            JOIN blk ON a.gram = blk.gram
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        ), cg AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT c.a_id, c.b_id
            FROM cand c JOIN cg a ON a.doc_id = c.a_id JOIN cg b ON b.doc_id = c.b_id
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.7
        ), e AS (
            SELECT a_id AS src, b_id AS dst FROM p
            UNION ALL SELECT b_id, a_id FROM p
        ), reach(node, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, r.m FROM reach r JOIN e ON e.src = r.node
        )
        SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
    """,
    "docs_lm_perplexity": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), bg AS (
            SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS g
            FROM toks, unnest(range(1, len(t))) AS r(i)
        ), uni AS (
            SELECT t[i] AS w, CAST(count(*) AS BIGINT) AS n
            FROM toks, unnest(range(1, len(t) + 1)) AS r(i) GROUP BY t[i]
        ), bi AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY g
        ), v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni)
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(round(avg(-ln((bi.n + 1.0) / (uni.n + 1.0 * v.v))) * 1000000)
                    AS BIGINT) / 1000000.0 AS avg_nll
        FROM bg JOIN bi USING (g) JOIN uni ON uni.w = bg.w1 CROSS JOIN v
        GROUP BY bg.doc_id
    """,
    "docs_dsir_importance": """
        WITH tgt AS (
            SELECT doc_id, text FROM documents
            WHERE source = (SELECT min(source) FROM documents)
        ), toks_r AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), toks_t AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM tgt WHERE trim(text) <> ''
        ), bg AS (
            SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS g
            FROM toks_r, unnest(range(1, len(t))) AS r(i)
        ), uni_r AS (
            SELECT t[i] AS w, CAST(count(*) AS BIGINT) AS n
            FROM toks_r, unnest(range(1, len(t) + 1)) AS r(i) GROUP BY t[i]
        ), bi_r AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY g
        ), v_r AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni_r
        ), uni_t AS (
            SELECT t[i] AS w, CAST(count(*) AS BIGINT) AS n
            FROM toks_t, unnest(range(1, len(t) + 1)) AS r(i) GROUP BY t[i]
        ), bi_t AS (
            SELECT t[i] || ' ' || t[i+1] AS g, CAST(count(*) AS BIGINT) AS n
            FROM toks_t, unnest(range(1, len(t))) AS r(i) GROUP BY g
        ), v_t AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni_t)
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(round(sum(
                   -ln((COALESCE(bi_r.n, 0) + 1.0) / (COALESCE(uni_r.n, 0) + 1.0 * v_r.v))
                   + ln((COALESCE(bi_t.n, 0) + 1.0) / (COALESCE(uni_t.n, 0) + 1.0 * v_t.v))
               ) * 1000000) AS BIGINT) / 1000000.0 AS log_w
        FROM bg
        LEFT JOIN bi_r ON bi_r.g = bg.g
        LEFT JOIN uni_r ON uni_r.w = bg.w1
        LEFT JOIN bi_t ON bi_t.g = bg.g
        LEFT JOIN uni_t ON uni_t.w = bg.w1
        CROSS JOIN v_r CROSS JOIN v_t
        GROUP BY bg.doc_id
    """,
    "docs_media_video": """
        WITH v AS (
            SELECT doc_id,
                   (((doc_id % 20) * 2500) * 1000) // (1000 + (doc_id % 10) * 100) AS dur_ms
            FROM documents
        )
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CAST(least(dur_ms // 1000, 16) AS BIGINT) AS n_frames
        FROM v WHERE dur_ms // 1000 > 0
    """,
    "docs_media_audio": """
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CAST(8000 + (doc_id % 8) * 4000 AS BIGINT) AS sample_rate,
               CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
               CAST(16 AS BIGINT) AS bits_per_sample,
               CAST(((doc_id % 32) * (1 + doc_id % 2) * 2 * 1000)
                    // ((8000 + (doc_id % 8) * 4000) * (1 + doc_id % 2) * 2)
                    AS BIGINT) AS wav_duration_ms
        FROM documents
    """,
    "docs_media_dimensions": """
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
               CAST(doc_id % 640 + 1 AS BIGINT) AS width,
               CAST(doc_id % 480 + 1 AS BIGINT) AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 35 END AS BIGINT) AS n_bytes
        FROM documents
    """,
    "docs_media_features": """
        WITH e AS (
            SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS code
            FROM documents, unnest(range(1, len(text) + 1)) AS r(i)
            WHERE trim(text) <> ''
        )
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CAST(count(*) AS BIGINT) AS n_bytes,
               CAST(sum(code) AS BIGINT) AS byte_sum
        FROM e WHERE code BETWEEN 0 AND 127 GROUP BY doc_id
    """,
    "docs_blocking_skew": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), sz AS (
            SELECT gram, CAST(count(*) AS HUGEINT) AS s FROM g GROUP BY gram
        )
        SELECT CAST(s AS BIGINT) AS block_size,
               count(*) AS n_blocks,
               CAST(count(*) * ((s * (s - 1)) // 2) AS BIGINT) AS pair_work
        FROM sz GROUP BY s
    """,
    "docs_meta_blocking": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), blk AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 20
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared_blocks
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            JOIN blk ON a.gram = blk.gram
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, shared_blocks FROM pairs WHERE shared_blocks >= 2
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
               CAST(round(avg(l_quantity) * 10000) AS BIGINT) / 10000.0 AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": """
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey
        ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))) DESC, l_orderkey
        LIMIT 10
    """,
    "nation_customer_stats": """
        SELECT n_name, count(*) AS n_customers,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "orders_top10_value": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "supplier_nation_counts": """
        SELECT n_name, count(*) AS n_suppliers FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "customer_segments": """
        SELECT c_mktsegment, count(*) AS n,
               CAST(round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / (count(*) * 100.0) * 10000) AS BIGINT) / 10000.0 AS avg_acctbal
        FROM customer GROUP BY c_mktsegment
    """,
    "parts_by_brand": """
        SELECT p_brand, count(*) AS n_parts,
               sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0 AS total_retail,
               max(p_size) AS max_size
        FROM part GROUP BY p_brand
    """,
    "region_nation_counts": """
        SELECT r_name, count(*) AS n_suppliers
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "events_props_k_stats": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
        GROUP BY event_type
    """,
    "events_by_type": """
        SELECT event_type, count(*) AS n, CAST(round(sum(value) * 100) AS BIGINT) / 100.0 AS total_value,
               CAST(round(max(value) * 1000000) AS BIGINT) / 1000000.0 AS max_value
        FROM events GROUP BY event_type
    """,
    "events_hourly_window": """
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
               CAST(round(sum(value) * 100) AS BIGINT) / 100.0 AS total_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "events_union_extremes": """
        SELECT event_id, value FROM events WHERE value > 99.0
        UNION ALL
        SELECT event_id, value FROM events WHERE value < 1.0
    """,
    "events_user_sessions": """
        SELECT user_id, count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
        FROM events GROUP BY user_id
    """,
    "events_top3_per_type": """
        SELECT event_type, event_id,
               CAST(round(value * 1000000) AS BIGINT) / 1000000.0 AS value
        FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rn
            FROM events
        ) WHERE rn <= 3
    """,
    "events_sessionized": """
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM g
        )
        SELECT user_id, session_idx, count(*) AS n_events,
               epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
        FROM s GROUP BY user_id, session_idx
    """,
    "docs_normalize": """
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
        FROM documents
    """,
    "emb_code_gram": """
        WITH v AS (
            SELECT vec_id,
                   unnest(range(1, len(embedding) + 1)) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS val
            FROM embeddings
        ), s AS (
            SELECT dim, min(val) AS mn, max(val) AS mx FROM v GROUP BY dim
        ), c AS (
            SELECT vec_id, dim - 1 AS dim0,
                   CAST(floor((val - mn)
                              * (CASE WHEN mx > mn THEN 255.0 / (mx - mn)
                                      ELSE 0.0 END) + 0.5) AS BIGINT) AS code
            FROM v JOIN s USING (dim)
        )
        SELECT a.dim0 AS dim_i, b.dim0 AS dim_j,
               CAST(sum(a.code * b.code) AS BIGINT) AS g
        FROM c a JOIN c b ON a.vec_id = b.vec_id AND b.dim0 >= a.dim0
        GROUP BY a.dim0, b.dim0
    """,
    "emb_quantized_stats": """
        WITH v AS (
            SELECT vec_id,
                   unnest(range(1, len(embedding) + 1)) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS val
            FROM embeddings
        ), s AS (
            SELECT dim, min(val) AS mn, max(val) AS mx FROM v GROUP BY dim
        ), c AS (
            SELECT vec_id,
                   CAST(floor((val - mn)
                              * (CASE WHEN mx > mn THEN 255.0 / (mx - mn)
                                      ELSE 0.0 END) + 0.5) AS BIGINT) AS code
            FROM v JOIN s USING (dim)
        )
        SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
               CAST(min(code) AS BIGINT) AS code_min,
               CAST(max(code) AS BIGINT) AS code_max
        FROM c GROUP BY vec_id
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
                   / 1000000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1995-07-01'
          AND o_orderdate < TIMESTAMP '2000-07-01'
        GROUP BY n_name
    """,
    "docs_pack_bins": """
        WITH RECURSIVE t AS (
            SELECT source, doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n,
                   row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents WHERE trim(text) <> ''
        ), p AS (
            SELECT source, doc_id, n, rn,
                   CAST(0 AS BIGINT) AS bin_idx, n AS fill
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.source, t.doc_id, t.n, t.rn,
                   CASE WHEN p.fill + t.n <= 256 THEN p.bin_idx
                        ELSE p.bin_idx + 1 END,
                   CASE WHEN p.fill + t.n <= 256 THEN p.fill + t.n
                        ELSE t.n END
            FROM p JOIN t ON t.source = p.source AND t.rn = p.rn + 1
        )
        SELECT source, doc_id, bin_idx FROM p
    """,
    "events_running_revenue": """
        SELECT event_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        OVER (ORDER BY ts, event_id) AS BIGINT) AS run_cents,
               CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS row_num
        FROM events
    """,
    "docs_heavy_tokens": """
        WITH tok AS (
            SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents WHERE trim(text) <> ''
        ), tot AS (SELECT count(*) AS n FROM tok)
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok, tot GROUP BY token, n
        HAVING count(*) >= 0.033 * n
    """,
    "docs_repetition": """
        WITH base AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n
            FROM documents WHERE trim(text) <> ''
        ), tokc AS (
            SELECT doc_id, max(c) AS max_tok FROM (
                SELECT doc_id, tok, count(*) AS c
                FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
                GROUP BY doc_id, tok
            ) GROUP BY doc_id
        ), bigc AS (
            SELECT doc_id, max(c) AS max_big FROM (
                SELECT doc_id, bg, count(*) AS c FROM (
                    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
                    FROM (SELECT doc_id, toks,
                                 unnest(generate_series(1, n - 1)) AS i
                          FROM base WHERE n >= 2)
                ) GROUP BY doc_id, bg
            ) GROUP BY doc_id
        )
        SELECT b.doc_id,
               b.n AS n_tokens,
               CAST(b.n - len(list_distinct(b.toks)) AS DOUBLE) / b.n
                   AS dup_token_frac,
               CAST(tokc.max_tok AS DOUBLE) / b.n AS top_token_frac,
               CASE WHEN b.n >= 2
                    THEN CAST(bigc.max_big AS DOUBLE) / (b.n - 1)
                    ELSE 0.0 END AS top_bigram_frac
        FROM base b
        JOIN tokc USING (doc_id)
        LEFT JOIN bigc USING (doc_id)
    """,
    "docs_token_stats": """
        SELECT doc_id, length(text) AS n_chars,
               array_length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents
    """,
    "docs_decontaminate": """
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 4), ' ') AS gram
              FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM t)),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 13 = 0),
        train AS (SELECT * FROM g WHERE doc_id % 13 <> 0),
        hits AS (SELECT doc_id, count(*) AS n_hits FROM train
                 WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id),
        tot AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(tot.n_grams, 0) AS n_grams,
               COALESCE(hits.n_hits, 0) AS n_hits,
               COALESCE(hits.n_hits, 0) > 0 AS flagged
        FROM documents d
        LEFT JOIN tot ON d.doc_id = tot.doc_id
        LEFT JOIN hits ON d.doc_id = hits.doc_id
        WHERE d.doc_id % 13 <> 0
    """,
    "docs_dup_spans": """
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                   FROM documents),
        g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 4), ' ') AS gram
              FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM t)),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        per AS (SELECT doc_id, count(*) AS n_grams,
                       count(*) FILTER (WHERE gram IN (SELECT gram FROM dup)) AS n_dup_grams
                FROM g GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(per.n_grams, 0) AS n_grams,
               COALESCE(per.n_dup_grams, 0) AS n_dup_grams,
               CASE WHEN COALESCE(per.n_grams, 0) = 0 THEN 0.0
                    ELSE CAST(per.n_dup_grams AS DOUBLE) / per.n_grams END AS dup_frac
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    "docs_rarity": """
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
        cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
        per AS (SELECT tok.doc_id, count(*) AS n_toks,
                       CAST(sum((SELECT total FROM tot) // cnt.c) AS BIGINT) AS inv_sum
                FROM tok JOIN cnt ON tok.w = cnt.w GROUP BY tok.doc_id)
        SELECT d.doc_id,
               COALESCE(per.n_toks, 0) AS n_toks,
               COALESCE(per.inv_sum, 0) AS inv_sum,
               CASE WHEN per.n_toks IS NULL THEN 0.0
                    ELSE CAST(per.inv_sum AS DOUBLE) / per.n_toks END AS rarity
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    "docs_search_top10": """
        WITH q(term) AS (VALUES ('merge'), ('scan'), ('window')),
        t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM documents),
        n AS (SELECT count(*) AS n_docs FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
        df AS (SELECT w AS term, count(DISTINCT doc_id) AS df FROM tok
               WHERE w IN (SELECT term FROM q) GROUP BY w),
        tf AS (SELECT doc_id, w AS term, count(*) AS tf FROM tok
               WHERE w IN (SELECT term FROM q) GROUP BY doc_id, w),
        sc AS (SELECT tf.doc_id,
                      CAST(sum(tf.tf * ((SELECT n_docs FROM n) * 1000 // df.df)) AS BIGINT) AS score
               FROM tf JOIN df ON tf.term = df.term GROUP BY tf.doc_id)
        SELECT doc_id, score FROM sc WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 10
    """,
    "sources_distinctive_tokens": """
        WITH tok AS (SELECT source,
                            unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
                     FROM documents),
        st AS (SELECT source, w, count(*) AS tf FROM tok GROUP BY source, w),
        stot AS (SELECT source, CAST(sum(tf) AS BIGINT) AS s_total FROM st GROUP BY source),
        ct AS (SELECT w, CAST(sum(tf) AS BIGINT) AS ctf FROM st GROUP BY w),
        tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM st),
        lift AS (SELECT st.source, st.w AS token, CAST(st.tf AS BIGINT) AS tf,
                        st.tf * (SELECT total FROM tot) * 1000 // (ct.ctf * stot.s_total) AS lift_q
                 FROM st JOIN ct ON st.w = ct.w JOIN stot ON st.source = stot.source),
        r AS (SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY lift_q DESC, token) AS rn
              FROM lift)
        SELECT source, token, tf, CAST(lift_q AS BIGINT) AS lift_q FROM r WHERE rn <= 3
    """,
    "events_value_locf": """
        SELECT event_id, user_id,
               COALESCE(
                   last_value(CASE WHEN event_type = 'error' THEN NULL
                                   ELSE CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING),
                   -1) AS filled_cents
        FROM events
    """,
    "events_user_paths": """
        WITH r AS (SELECT user_id, event_type,
                          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                          count(*) OVER (PARTITION BY user_id) AS n_events
                   FROM events)
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path,
               CAST(min(n_events) AS BIGINT) AS n_events
        FROM r WHERE rn <= 8 GROUP BY user_id
    """,
    "customers_name_neighbors": """
        WITH s AS (SELECT c_custkey, c_name,
                          row_number() OVER (ORDER BY c_name, c_custkey) AS rn
                   FROM customer),
        p AS (SELECT a.c_custkey AS a_custkey, b.c_custkey AS b_custkey,
                     CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
              FROM s a JOIN s b ON b.rn > a.rn AND b.rn <= a.rn + 2)
        SELECT a_custkey, b_custkey, dist FROM p WHERE dist <= 2
    """,
    "events_funnel": """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        v AS (SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id)
        SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
                    WHEN c.user_id IS NOT NULL THEN 2
                    WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage,
               count(*) AS n_users
        FROM u
        LEFT JOIN v ON u.user_id = v.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p ON u.user_id = p.user_id
        GROUP BY 1
    """,
    "docs_budget_mix": """
        WITH t AS (SELECT doc_id, source,
                          CAST(array_length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_toks
                   FROM documents),
        c AS (SELECT doc_id, source, n_toks,
                     CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_toks
              FROM t)
        SELECT doc_id, source, n_toks, cum_toks FROM c WHERE cum_toks <= 1500
    """,
    "docs_top_bigrams": """
        WITH t AS (SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents),
        b AS (SELECT array_to_string(list_slice(toks, i, i + 1), ' ') AS bigram
              FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t))
        SELECT bigram, count(*) AS n FROM b GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 20
    """,
    "docs_tokens": """
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents WHERE doc_id < 20
    """,
    "docs_bpe_token_counts": """
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
        FROM documents
    """,
    "docs_exact_dedup": """
        SELECT text, min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "docs_exact_dedup_hash": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "docs_distinct_sources": "SELECT DISTINCT source FROM documents",
    "docs_top_sources": """
        SELECT source, count(*) AS n_docs FROM documents
        GROUP BY source ORDER BY n_docs DESC, source LIMIT 5
    """,
    "docs_filter_long": "SELECT doc_id, n_chars FROM documents WHERE n_chars > 300",
    "docs_fingerprint": "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
    "jsonl_mentions": f"""
        WITH ex AS (
            SELECT "doc-id" AS doc_id, unnest(examples, recursive := false) AS ex
            FROM read_json_auto('{_JSONL_FIXTURE_PATH}')
        ), ent AS (
            SELECT doc_id, ex.id AS example_id, ex.text AS text,
                   unnest(ex.entities, recursive := false) AS e
            FROM ex
        )
        SELECT doc_id, example_id,
               e."start" AS start, e."end" AS "end",
               substring(text, e."start" + 1, e."end" - e."start") AS surface,
               array_to_string(e.label, ',') AS labels_key,
               array_to_string(e.hard_negatives, ',') AS hard_neg_key
        FROM ent
    """,
    "emb_norms": """
        SELECT vec_id, CAST(round(sqrt(list_dot_product(embedding, embedding)) * 10000) AS BIGINT) / 10000.0 AS l2_norm
        FROM embeddings
    """,
    "emb_near_dup_exact": """
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[])) * 10000) AS BIGINT) / 10000.0 AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    "emb_knn_top5": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5)
        SELECT query_id, vec_id, rank FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
                   ) AS rank
            FROM q CROSS JOIN embeddings e
        ) WHERE rank <= 5
    """,
    "sources_token_waterfill": """
        WITH c AS (
            SELECT source,
                   CAST(sum(array_length(
                       regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) * 3 // 5 AS b FROM c),
        o AS (
            SELECT source, n_tokens,
                   row_number() OVER (ORDER BY n_tokens, source) AS rn,
                   CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source) AS BIGINT) AS pre,
                   CAST(count(*) OVER () AS BIGINT) AS n
            FROM c
        ),
        brk AS (
            SELECT min(rn) AS rn FROM o, tot
            WHERE (pre - n_tokens) + (n - rn + 1) * n_tokens > tot.b
        ),
        cap AS (
            SELECT CASE WHEN brk.rn IS NULL THEN (SELECT max(n_tokens) FROM c)
                        ELSE (SELECT (tot.b - (o.pre - o.n_tokens)) // (o.n - o.rn + 1)
                              FROM o, tot WHERE o.rn = brk.rn)
                   END AS L
            FROM brk
        )
        SELECT c.source, c.n_tokens,
               CAST(cap.L AS BIGINT) AS cap,
               CAST(least(c.n_tokens, cap.L) AS BIGINT) AS allocated,
               CAST(CASE WHEN c.n_tokens > cap.L THEN 1 ELSE 0 END AS BIGINT) AS capped
        FROM c, cap
    """,
    "sources_temperature_mix": """
        WITH RECURSIVE c AS (
            SELECT source,
                   CAST(sum(array_length(
                       regexp_split_to_array(trim(text), '\\s+'))) AS HUGEINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (SELECT sum(n_tokens) * 3 // 5 AS b FROM c),
        newton(source, n_tokens, x) AS (
            SELECT source, n_tokens, n_tokens FROM c WHERE n_tokens > 0
            UNION ALL
            SELECT source, n_tokens, (x + n_tokens // x) // 2
            FROM newton WHERE (x + n_tokens // x) // 2 < x
        ),
        w AS (
            SELECT c.source, c.n_tokens,
                   COALESCE((SELECT min(x) FROM newton n WHERE n.source = c.source), 0) AS wt
            FROM c
        ),
        ws AS (SELECT sum(wt) AS s FROM w)
        SELECT w.source,
               CAST(w.n_tokens AS BIGINT) AS n_tokens,
               CAST(w.wt AS BIGINT) AS weight,
               CAST((tot.b * w.wt) // ws.s AS BIGINT) AS allocated
        FROM w, tot, ws
    """,
    "sources_shingle_overlap": """
        WITH t AS (
            SELECT source,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
            FROM documents
        ), p AS (
            SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i FROM t
        ), sh AS (
            SELECT DISTINCT source,
                   toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
            FROM p
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
    """,
    "emb_mutual_knn": """
        WITH r AS (
            SELECT a.vec_id AS src, e.vec_id AS dst,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.embedding, e.embedding) DESC,
                                e.vec_id
                   ) AS rank
            FROM embeddings a CROSS JOIN embeddings e
            WHERE e.vec_id <> a.vec_id
        ), k AS (SELECT * FROM r WHERE rank <= 3)
        SELECT x.src AS a_id, x.dst AS b_id,
               CAST(x.rank AS BIGINT) AS rank_ab,
               CAST(y.rank AS BIGINT) AS rank_ba
        FROM k x JOIN k y ON y.src = x.dst AND y.dst = x.src
        WHERE x.src < x.dst
    """,
    "emb_knn_ivf_top5": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5)
        SELECT query_id, vec_id, rank FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
                   ) AS rank
            FROM q CROSS JOIN embeddings e
        ) WHERE rank <= 5
    """,
    "events_user_type_pivot": """
        SELECT user_id,
               CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
               CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "emb_label_centroids": """
        WITH v AS (
            SELECT label,
                   unnest(range(1, len(embedding) + 1)) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS val
            FROM embeddings
        ), a AS (
            SELECT label, dim, sum(val) AS s, count(*) AS n FROM v GROUP BY label, dim
        )
        SELECT CAST(label AS BIGINT) AS label, CAST(max(n) AS BIGINT) AS n_vecs,
               CAST(round(sqrt(sum((s / n) * (s / n))) * 10000) AS BIGINT) / 10000.0
                   AS centroid_norm
        FROM a GROUP BY label
    """,
    "customers_order_counts": """
        SELECT c_custkey,
               CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders
        FROM customer
        LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) o
               ON c_custkey = o.o_custkey
    """,
    "emb_knn_quantized_top5": """
        WITH v AS (
            SELECT vec_id,
                   unnest(range(1, len(embedding) + 1)) AS dim,
                   unnest(CAST(embedding AS DOUBLE[])) AS val
            FROM embeddings
        ), s AS (
            SELECT dim, min(val) AS mn, max(val) AS mx FROM v GROUP BY dim
        ), d AS (
            SELECT vec_id,
                   list(mn + floor((val - mn)
                                   * (CASE WHEN mx > mn THEN 255.0 / (mx - mn)
                                           ELSE 0.0 END) + 0.5)
                             * ((mx - mn) / 255.0)
                        ORDER BY dim) AS de
            FROM v JOIN s USING (dim) GROUP BY vec_id
        ), q AS (SELECT vec_id AS query_id, de AS qe FROM d WHERE vec_id < 5)
        SELECT query_id, vec_id, rank FROM (
            SELECT q.query_id, d.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qe, d.de) DESC, d.vec_id
                   ) AS rank
            FROM q CROSS JOIN d
        ) WHERE rank <= 5
    """,
    "events_lag_prev": """
        SELECT user_id, event_id,
               coalesce(lag(event_id) OVER w, -1) AS prev_event_id,
               coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "events_context_window": """
        SELECT user_id, event_id,
               string_agg(event_type, '>') OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ctx
        FROM events
    """,
    "events_user_longest_streak": """
        WITH o AS (
            SELECT user_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 - row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS grp,
                   event_type
            FROM events
        ), s AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS streak
            FROM o GROUP BY user_id, event_type, grp
        )
        SELECT user_id, max(streak) AS max_streak FROM s GROUP BY user_id
    """,
    "events_user_median_gap": """
        WITH gp AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap
            FROM events
        ), r AS (
            SELECT user_id, gap,
                   row_number() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
                   CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_gaps
            FROM gp WHERE gap IS NOT NULL
        )
        SELECT user_id, gap AS median_gap_us, n_gaps
        FROM r WHERE rn = (n_gaps + 1) // 2
    """,
    "events_user_active_coverage": """
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS prev
            FROM events
        )
        SELECT user_id,
               CAST(sum(CASE WHEN prev IS NULL THEN 300000000
                             ELSE least(300000000, ts_us - prev) END) AS BIGINT)
                   AS covered_us,
               count(*) AS n_events,
               CAST(1 + sum(CASE WHEN prev IS NOT NULL
                                  AND ts_us - prev >= 300000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_islands
        FROM e GROUP BY user_id
    """,
    "events_user_twap": """
        WITH o AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS nxt
            FROM events
        ), s AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN nxt IS NULL THEN 0
                                 ELSE cents * (nxt - ts_us) END) AS BIGINT) AS num,
                   CAST(max(ts_us) - min(ts_us) AS BIGINT) AS dur_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM o GROUP BY user_id
        )
        SELECT user_id, num // dur_us AS twap_cents, dur_us, n_events
        FROM s WHERE n_events >= 2 AND dur_us > 0
    """,
    "events_type_transitions": """
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type,
                   event_type AS next_type
            FROM events
        ) WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """,
    "events_user_primary_type": """
        SELECT user_id, primary_type, n_events FROM (
            SELECT user_id,
                   first_value(event_type) OVER (
                       PARTITION BY user_id ORDER BY c DESC, event_type
                   ) AS primary_type,
                   CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS n_events,
                   row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
            FROM (
                SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2
            )
        ) WHERE rn = 1
    """,
    "events_distinct_types_running": """
        SELECT user_id, event_id,
               CAST(sum(first_occ) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN row_number() OVER (
                       PARTITION BY user_id, event_type ORDER BY ts, event_id
                   ) = 1 THEN 1 ELSE 0 END AS first_occ
            FROM events
        )
    """,
    "events_value_histogram": """
        SELECT CAST(floor(value) AS BIGINT) AS bucket, count(*) AS n
        FROM events GROUP BY 1
    """,
    "customers_without_orders": """
        SELECT c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    "lineitem_bloom_semi_join": """
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey
                        AND o.o_totalprice > 300000.0)
        GROUP BY l_orderkey
    """,
    "docs_chunk_windows": """
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents WHERE trim(text) <> ''
        ), s AS (
            SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS st FROM t
        )
        SELECT doc_id,
               st // 40 AS chunk_idx,
               array_to_string(list_slice(toks, st + 1, st + 50), ' ') AS chunk_text,
               least(len(toks) - st, 50) AS n_tokens
        FROM s
    """,
    "docs_window_jaccard": """
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), j AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) AS jac
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
        )
        SELECT a_id, b_id, CAST(round(jac * 1000000) AS BIGINT) / 1000000.0 AS jaccard
        FROM j WHERE jac >= 0.2
    """,
    "docs_window_jaccard_clusters": """
        WITH RECURSIVE g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.5
        ), e AS (
            SELECT a_id AS src, b_id AS dst FROM p
            UNION ALL SELECT b_id, a_id FROM p
        ), reach(node, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, r.m FROM reach r JOIN e ON e.src = r.node
        )
        SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
    """,
    "docs_er_clusters_capped": """
        WITH RECURSIVE g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.5
        ), e AS (
            SELECT a_id AS src, b_id AS dst FROM p
            UNION ALL SELECT b_id, a_id FROM p
        ), reach(node, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, r.m FROM reach r JOIN e ON e.src = r.node
        ), labels AS (
            SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
        ), ranked AS (
            SELECT doc_id, cluster_id,
                   (row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id) - 1)
                       // 3 AS chunk
            FROM labels
        )
        SELECT doc_id, cluster_id,
               min(doc_id) OVER (PARTITION BY cluster_id, chunk) AS capped_id
        FROM ranked
    """,
    "docs_dedup_corpus_exact": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
            UNION ALL SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 20
        ), reps AS (SELECT text, min(doc_id) AS rep_id FROM corpus GROUP BY text)
        SELECT c.doc_id, r.rep_id AS dropped_for, 'exact_dup_of' AS reason
        FROM corpus c JOIN reps r ON c.text = r.text
        WHERE c.doc_id <> r.rep_id
    """,
    "events_value_quantiles": """
        SELECT event_type,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) / 100.0 AS p50,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) / 100.0 AS p90,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) / 100.0 AS p99
        FROM events GROUP BY event_type
    """,
    "events_range_bins": """
        WITH bins AS (
            SELECT unnest(generate_series(0, 39)) AS bin_id
        ), b2 AS (
            SELECT bin_id, bin_id * 25.0 AS lo, (bin_id + 1) * 25.0 AS hi FROM bins
        )
        SELECT b2.bin_id, b2.lo, b2.hi, count(*) AS n,
               sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM events e JOIN b2 ON e.value >= b2.lo AND e.value < b2.hi
        GROUP BY b2.bin_id, b2.lo, b2.hi
    """,
    "events_distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "docs_sample_hash": """
        SELECT doc_id, source, n_chars FROM documents
        WHERE (doc_id % 2147483647) * 48271 % 2147483647 % 10 = 3
    """,
    "docs_sample_stratified": """
        SELECT doc_id, source, sample_h FROM (
            SELECT doc_id, source,
                   (doc_id % 2147483647) * 48271 % 2147483647 AS sample_h,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id % 2147483647) * 48271 % 2147483647, doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= 5
    """,
    "docs_vocab_top50": """
        SELECT token, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents
        ) GROUP BY token ORDER BY n DESC, token LIMIT 50
    """,
    "docs_top_terms": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
        ), df AS (
            SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
        )
        SELECT doc_id, token, tf, df FROM (
            SELECT tf.doc_id, tf.token, tf.tf, df.df,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.token
                   ) AS rn
            FROM tf JOIN df USING (token)
        ) WHERE rn <= 3
    """,
    "docs_inverted_index": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
            FROM documents
        ), p AS (
            SELECT DISTINCT doc_id, token FROM tok
        )
        SELECT token, count(*) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM p GROUP BY token
    """,
    "events_sliding_1h": """
        SELECT user_id, event_id,
               count(*) OVER w AS n_1h,
               sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    "events_purchase_asof_view": """
        WITH views AS (
            SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
            QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
        ), p AS (
            SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id AS purchase_id, p.user_id,
               COALESCE(v.event_id, -1) AS view_id,
               COALESCE(date_diff('microsecond', v.ts, p.ts), -1) AS gap_us
        FROM p ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    "events_rollup": """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), 'ALL') AS day,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM events
        GROUP BY ROLLUP(event_type, CAST(date_trunc('day', ts) AS DATE))
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
        )
        GROUP BY o_orderpriority
    """,
    "q14_promo_share": """
        WITH rev AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4,
                   p_type
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ), sums AS (
            SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c4 ELSE 0 END) AS BIGINT) AS p,
                   CAST(sum(rev_c4) AS BIGINT) AS t
            FROM rev
        )
        SELECT CAST(round((100.0 * p) / t * 10000) AS BIGINT) / 10000.0 AS promo_share,
               p / 10000.0 AS promo_revenue,
               t / 10000.0 AS total_revenue
        FROM sums
    """,
    "docs_regex_scrub": """
        SELECT doc_id,
               regexp_replace(text, '\\b(key|hash|index)\\b', '<MASK>', 'g') AS scrubbed,
               CAST(length(regexp_extract_all(text, '\\b(key|hash|index)\\b')) AS BIGINT) AS n_masked
        FROM documents
    """,
    "events_p95_filter": """
        WITH thresh AS (
            SELECT quantile_disc(CAST(round(value * 100) AS BIGINT), 0.95) AS p95c FROM events
        )
        SELECT event_type, count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM events, thresh
        WHERE CAST(round(value * 100) AS BIGINT) > p95c
        GROUP BY event_type
    """,
    "docs_split_assign": """
        SELECT source,
               CASE WHEN h % 10 < 8 THEN 'train'
                    WHEN h % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM (
            SELECT source, n_chars,
                   (doc_id % 2147483647) * 48271 % 2147483647 AS h
            FROM documents
        )
        GROUP BY 1, 2
    """,
    "events_cube": """
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(hr AS VARCHAR), 'ALL') AS hour,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM (SELECT event_type, EXTRACT(hour FROM ts) AS hr, value FROM events)
        GROUP BY CUBE (event_type, hr)
    """,
    "events_interval_join_windows": """
        WITH w AS (
            SELECT i AS window_id,
                   TIMESTAMP '2024-01-01 00:00:00' + i * (INTERVAL 233 MINUTE) AS ws,
                   TIMESTAMP '2024-01-01 00:00:00' + i * (INTERVAL 233 MINUTE)
                     + (45 + (67 * i) % 300) * (INTERVAL 1 MINUTE) AS we
            FROM (SELECT unnest(generate_series(0, 179)) AS i)
        )
        SELECT w.window_id, count(*) AS n_events,
               sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS total_value
        FROM w JOIN events e ON e.ts >= w.ws AND e.ts < w.we
        GROUP BY w.window_id
    """,
    "events_salted_type_join": """
        WITH dim AS (
            SELECT DISTINCT event_type AS t_type, length(event_type) AS weight
            FROM events
        )
        SELECT user_id, count(*) AS n_events,
               sum(CAST(round(e.value * 100) AS BIGINT) * d.weight) / 100.0
                 AS weighted_value
        FROM events e JOIN dim d ON e.event_type = d.t_type
        GROUP BY user_id
    """,
    "events_top3_values_dense": """
        WITH cells AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cell,
                   count(*) AS n
            FROM events GROUP BY event_type, cell
        ), r AS (
            SELECT *, dense_rank() OVER (PARTITION BY event_type
                                         ORDER BY cell DESC) AS rk
            FROM cells
        )
        SELECT event_type, cell / 100.0 AS value, n, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 3
    """,
    "sources_lexical_diversity": """
        WITH tok AS (SELECT source,
                            unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
                     FROM documents),
        st AS (SELECT source, w, count(*) AS n_w FROM tok GROUP BY source, w),
        m AS (SELECT source,
                     CAST(sum(n_w) AS BIGINT) AS n_tokens,
                     count(*) AS distinct_tokens,
                     sum(n_w * (n_w - 1)) AS pairs
              FROM st GROUP BY source)
        SELECT source, n_tokens, distinct_tokens,
               CAST(pairs * 1000000 // greatest(n_tokens * (n_tokens - 1), 1)
                    AS BIGINT) AS simpson_q
        FROM m
    """,
    "docs_search_bm25": """
        WITH q(term) AS (VALUES ('merge'), ('scan'), ('window')),
        tok AS (SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
                FROM documents),
        nn AS (SELECT count(*) AS n_docs FROM documents),
        tt AS (SELECT count(*) AS t_tokens FROM tok),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        df AS (SELECT w AS term, count(DISTINCT doc_id) AS df FROM tok
               WHERE w IN (SELECT term FROM q) GROUP BY w),
        tf AS (SELECT doc_id, w AS term, count(*) AS tf FROM tok
               WHERE w IN (SELECT term FROM q) GROUP BY doc_id, w),
        sc AS (SELECT tf.doc_id,
                      sum(((SELECT n_docs FROM nn) * 1000 // df.df)
                          * ((44 * tf.tf * (SELECT t_tokens FROM tt) * 1000)
                             // (20 * tf.tf * (SELECT t_tokens FROM tt)
                                 + 6 * (SELECT t_tokens FROM tt)
                                 + 18 * dl.dl * (SELECT n_docs FROM nn)))) AS score
               FROM tf JOIN df ON tf.term = df.term
                       JOIN dl ON tf.doc_id = dl.doc_id
               GROUP BY tf.doc_id)
        SELECT doc_id, CAST(score AS BIGINT) AS score
        FROM sc WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 10
    """,
    "docs_er_cluster_purity": """
        WITH RECURSIVE g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.5
        ), e AS (
            SELECT a_id AS src, b_id AS dst FROM p
            UNION ALL SELECT b_id, a_id FROM p
        ), reach(node, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, r.m FROM reach r JOIN e ON e.src = r.node
        ), labels AS (
            SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
        ), cells AS (
            SELECT l.cluster_id, d.source, count(*) AS n_cs
            FROM labels l JOIN documents d ON d.doc_id = l.doc_id
            GROUP BY l.cluster_id, d.source
        )
        SELECT cluster_id,
               CAST(sum(n_cs) AS BIGINT) AS n_c,
               CAST(sum(n_cs * n_cs) AS BIGINT) AS purity_num,
               CAST(max(n_cs) AS BIGINT) AS max_ncs,
               count(*) AS n_sources
        FROM cells GROUP BY cluster_id
    """,
    "docs_er_rand_index": """
        WITH RECURSIVE g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.5
        ), e AS (
            SELECT a_id AS src, b_id AS dst FROM p
            UNION ALL SELECT b_id, a_id FROM p
        ), reach(node, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, r.m FROM reach r JOIN e ON e.src = r.node
        ), labels AS (
            SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
        ), cells AS (
            SELECT l.cluster_id, d.source, CAST(count(*) AS HUGEINT) AS n_cs
            FROM labels l JOIN documents d ON d.doc_id = l.doc_id
            GROUP BY l.cluster_id, d.source
        ), tp AS (
            SELECT sum((n_cs * (n_cs - 1)) // 2) AS tp FROM cells
        ), pr AS (
            SELECT sum((a * (a - 1)) // 2) AS pr
            FROM (SELECT sum(n_cs) AS a FROM cells GROUP BY cluster_id)
        ), pcs AS (
            SELECT sum((b * (b - 1)) // 2) AS pc2
            FROM (SELECT CAST(count(*) AS HUGEINT) AS b FROM documents GROUP BY source)
        ), nn AS (
            SELECT CAST(count(*) AS HUGEINT) AS n,
                   (CAST(count(*) AS HUGEINT) * (count(*) - 1)) // 2 AS c2
            FROM documents
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
               CAST(c2 AS BIGINT) AS pair_total,
               CAST(tp AS BIGINT) AS tp_pairs,
               CAST(pr AS BIGINT) AS cluster_pairs,
               CAST(pc2 AS BIGINT) AS class_pairs,
               CAST((1000 * (c2 - pr - pc2 + 2 * tp)) // c2 AS BIGINT) AS rand_permille,
               CAST(2 * (tp * c2 - pr * pc2) AS BIGINT) AS ari_num,
               CAST(c2 * (pr + pc2) - 2 * pr * pc2 AS BIGINT) AS ari_den
        FROM tp, pr, pcs, nn
    """,
    "customers_name_edit1": """
        WITH c AS (
            SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 600
        )
        SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
               CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        FROM c a JOIN c b ON b.c_custkey > a.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    "docs_simjoin_exact": """
        WITH g AS (
            SELECT doc_id,
                   list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
            FROM documents
            WHERE doc_id < 600 AND trim(text) <> ''
        ), j AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                     / greatest(len(a.toks) + len(b.toks)
                                - len(list_intersect(a.toks, b.toks)), 1) AS jac
            FROM g a JOIN g b ON b.doc_id > a.doc_id
        )
        SELECT a_id, b_id,
               CAST(round(jac * 1000000) AS BIGINT) / 1000000.0 AS jaccard
        FROM j WHERE jac >= 0.4
    """,
    "docs_subset_join": """
        WITH g AS (
            SELECT doc_id,
                   list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
            FROM documents
            WHERE doc_id < 300 AND trim(text) <> ''
        ), v AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                     / greatest(len(a.toks), 1) AS c
            FROM g a JOIN g b ON a.doc_id <> b.doc_id
        )
        SELECT a_id, b_id,
               CAST(round(c * 1000000) AS BIGINT) / 1000000.0 AS containment
        FROM v WHERE c >= 1.0
    """,
    "docs_split_leakage_safe": """
        WITH RECURSIVE g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.5
        ), e AS (
            SELECT a_id AS src, b_id AS dst FROM p
            UNION ALL SELECT b_id, a_id FROM p
        ), reach(node, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.dst, r.m FROM reach r JOIN e ON e.src = r.node
        ), labels AS (
            SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
        ), a AS (
            SELECT doc_id, cluster_id,
                   CASE WHEN (cluster_id % 2147483647) * 48271 % 2147483647 % 10 < 8
                        THEN 'train'
                        WHEN (cluster_id % 2147483647) * 48271 % 2147483647 % 10 = 8
                        THEN 'val' ELSE 'test' END AS split
            FROM labels
        )
        SELECT split, count(*) AS n_docs,
               count(DISTINCT cluster_id) AS n_clusters,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        FROM a GROUP BY split
    """,
    "nation_order_revenue": """
        SELECT n_name, count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "events_value_cume_dist": """
        SELECT event_id, event_type,
               cume_dist() OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(round(value * 100) AS BIGINT)
               ) AS cume
        FROM events
    """,
    "users_click_no_purchase": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 200.0
    """,
    # docs_minhash_near_dup, docs_simhash, emb_knn_lsh_top5, emb_near_dup,
    # linkage_*: not SQL-expressible → rows-only checks (sketches / seeded
    # LSH / iterative algo).
}


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"


def _build_text_oracles() -> None:
    """docs_quality / docs_lang_id ARE deterministic arithmetic over regex and
    token counts — fully SQL-expressible.  The SQL is generated from the SAME
    stopword tables the engine uses (``stages.text_analysis._STOPWORDS``) so
    the two sides cannot drift.  Both engines are RE2-based (Arrow and DuckDB),
    so ``\\w``/``\\s`` semantics agree."""
    from ..stages.text_analysis import _STOPWORDS

    all_stop = _sql_list(set().union(*_STOPWORDS.values()))
    score_expr = (
        "(0.4 * length_score + 0.3 * (1.0 - punct_ratio) "
        "+ 0.3 * greatest(least(1.0 - abs(mean_word_len - 5.0) / 5.0, 1.0), 0.0))"
    )
    quality_ctes = f"""
        WITH t AS (
            SELECT doc_id,
                   lower(text) AS tl,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
            FROM documents
        ), f AS (
            SELECT doc_id,
                   length(tl) AS n_chars,
                   len(regexp_extract_all(tl, '[^\\w\\s]')) AS n_punct,
                   len(toks) AS n_tok,
                   CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) AS tok_len_sum,
                   len(list_filter(toks, x -> list_contains({all_stop}, x))) AS n_stop
            FROM t
        ), r AS (
            SELECT doc_id,
                   n_punct / greatest(n_chars, 1) AS punct_ratio,
                   n_stop / greatest(n_tok, 1) AS stopword_ratio,
                   tok_len_sum / greatest(n_tok, 1) AS mean_word_len,
                   least(n_tok / 50.0, 1.0) AS length_score
            FROM f
        )"""

    ORACLE_SQL["docs_quality"] = f"""{quality_ctes}
        SELECT doc_id,
               CAST(round(punct_ratio * 1000000) AS BIGINT) / 1000000.0 AS punct_ratio,
               CAST(round(stopword_ratio * 1000000) AS BIGINT) / 1000000.0 AS stopword_ratio,
               CAST(round(mean_word_len * 1000000) AS BIGINT) / 1000000.0 AS mean_word_len,
               CAST(round({score_expr} * 1000000) AS BIGINT) / 1000000.0 AS quality_score
        FROM r
    """

    ORACLE_SQL["docs_sample_weighted"] = f"""{quality_ctes}
        SELECT doc_id FROM r
        WHERE ((((doc_id % 2147483647) * 48271 % 2147483647)
                 * 48271 % 2147483647) * 48271 % 2147483647)
              < (floor({score_expr} * 10000 + 0.5) / 10000.0) * 2147483647
    """

    langs = [lang for lang, words in _STOPWORDS.items() if words]  # engine vote order
    vote_cols = ",\n                   ".join(
        f"len(list_filter(toks, x -> list_contains({_sql_list(_STOPWORDS[lang])}, x))) AS v_{lang}"
        for lang in langs
    )
    # First-max-wins cascade in the engine's argmax order; han-share override
    # to 'zh' applies LAST in the engine (so it beats everything) ⇒ FIRST here.
    cascade = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(f"v_{lang} >= v_{other}" for other in langs[i + 1 :])
        cascade.append(f"WHEN {conds} THEN '{lang}'" if conds else f"ELSE '{lang}'")
    cascade_sql = "\n                    ".join(cascade)
    max_expr = "greatest(" + ", ".join(f"v_{lang}" for lang in langs) + ")"
    ORACLE_SQL["docs_lang_id"] = f"""
        WITH t AS (
            SELECT doc_id,
                   lower(text) AS tl,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
            FROM documents
        ), v AS (
            SELECT doc_id,
                   {vote_cols},
                   len(regexp_extract_all(tl, '[一-鿿]')) AS han,
                   length(tl) AS n_chars
            FROM t
        )
        SELECT doc_id,
               CASE WHEN han / greatest(n_chars, 1) > 0.2 THEN 'zh'
                    WHEN {max_expr} = 0 THEN 'unknown'
                    {cascade_sql}
               END AS lang_pred
        FROM v
    """

    ORACLE_SQL["docs_quality_filter"] = f"""{quality_ctes}, v AS (
            SELECT doc_id,
                   {vote_cols},
                   len(regexp_extract_all(tl, '[一-鿿]')) AS han,
                   length(tl) AS n_chars
            FROM t
        )
        SELECT r.doc_id FROM r JOIN v USING (doc_id)
        WHERE {score_expr} >= 0.5
          AND (CASE WHEN han / greatest(n_chars, 1) > 0.2 THEN 'zh'
                    WHEN {max_expr} = 0 THEN 'unknown'
                    {cascade_sql}
               END) = 'en'
    """

    ORACLE_SQL["docs_truncate_tokens"] = """
        SELECT doc_id,
               array_to_string(list_slice(regexp_split_to_array(trim(text), '\\s+'), 1, 20), ' ') AS text_trunc,
               least(len(regexp_split_to_array(trim(text), '\\s+')), 20) AS n_tokens_kept
        FROM documents
    """


_build_text_oracles()


def _build_hll_oracle(p: int = 12) -> None:
    """The HLL sketch IS deterministic integer+float arithmetic — replay it
    exactly in DuckDB.  splitmix64 runs in HUGEINT mod-2^64 (the 64×64-bit
    multiply is split into 32-bit halves so the int128 product never
    overflows; verified bit-exact against the numpy path over 5000 ids),
    rho comes from an exact power-of-two join (no float log2), and the
    estimator replays ``stages.sketches._estimate`` including the
    linear-counting branch.  Generated next to the engine's own constants so
    the two sides cannot drift."""
    m = 1 << p
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    pow2 = ", ".join(f"({k}, CAST({1 << k} AS HUGEINT))" for k in range(64))
    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["events_approx_distinct_users"] = f"""
        WITH pow2(k, p2) AS (VALUES {pow2}),
        v AS (
            SELECT DISTINCT event_type, CAST(user_id AS HUGEINT) AS uid
            FROM events
        ),
        s1 AS (SELECT event_type,
                      (((uid % {m64}) + {m64}) % {m64} + {c1}) % {m64} AS x
               FROM v),
        s2 AS (SELECT event_type, {mulmod("xor(x, x >> 30)", c2)} AS x FROM s1),
        s3 AS (SELECT event_type, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        hashed AS (SELECT event_type, xor(x, x >> 31) AS h FROM s3),
        rows_rho AS (
            SELECT event_type,
                   h >> {64 - p} AS reg,
                   CASE WHEN (h * {m}) % {m64} = 0 THEN {64 - p + 1}
                        ELSE 64 - (SELECT max(k) FROM pow2
                                   WHERE p2 <= (h * {m}) % {m64})
                   END AS rho
            FROM hashed
        ),
        merged AS (
            SELECT event_type, reg, max(rho) AS rho
            FROM rows_rho GROUP BY event_type, reg
        ),
        est AS (
            SELECT event_type,
                   count(*) AS nonzero,
                   {m} - count(*) AS zeros,
                   sum(power(2.0::DOUBLE, -rho)) AS snz
            FROM merged GROUP BY event_type
        )
        SELECT event_type,
               CAST(round(
                   CASE WHEN (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {m}))
                             * {m} * {m} / (snz + zeros) <= 2.5::DOUBLE * {m}
                             AND zeros > 0
                        THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                        ELSE (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {m}))
                             * {m} * {m} / (snz + zeros)
                   END) AS BIGINT) AS approx_distinct
        FROM est
    """


_build_hll_oracle()


def _build_pagerank_oracle() -> None:
    """Bit-exact SQL replay of ``customers_pagerank``: edges from the same
    HUGEINT splitmix64 chain as ``_build_hll_oracle`` (multiply split into
    32-bit halves so the int128 product never overflows), then the four
    damped iterations UNROLLED as a CTE chain — DuckDB disallows aggregates
    inside a recursive term, and the iteration count is a constant anyway.
    All arithmetic is non-negative HUGEINT floor division, identical to the
    engine's int64 path; the final BIGINT cast raises exactly where the
    engine's hub-sum guard does."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    hops = []
    for i in range(PAGERANK_ITERS):
        prev, cur = f"r{i}", f"r{i + 1}"
        hops.append(
            f"""{cur} AS (
            SELECT n2.v AS v, {PAGERANK_BASE} + (85 * COALESCE(s.c, 0)) // 100 AS r
            FROM nodes n2 LEFT JOIN (
                SELECT e.dst AS v, sum({prev}.r // {PAGERANK_OUT_DEG}) AS c
                FROM edges e JOIN {prev} ON {prev}.v = e.src
                GROUP BY e.dst) s ON s.v = n2.v)"""
        )
    ORACLE_SQL["customers_pagerank"] = f"""
        WITH nodes AS (SELECT CAST(c_custkey AS HUGEINT) AS v FROM customer),
        nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM customer),
        ks(k) AS (VALUES (0), (1), (2)),
        x0 AS (SELECT v, (v * 8 + k) % {m64} AS x FROM nodes, ks),
        s1 AS (SELECT v, (x + {c1}) % {m64} AS x FROM x0),
        s2 AS (SELECT v, {mulmod("xor(x, x >> 30)", c2)} AS x FROM s1),
        s3 AS (SELECT v, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        edges AS (SELECT v AS src,
                         xor(x, x >> 31) % (SELECT n FROM nn) AS dst
                  FROM s3),
        r0 AS (SELECT v, CAST({PAGERANK_SCALE} AS HUGEINT) AS r FROM nodes),
        {", ".join(hops)}
        SELECT CAST(v AS BIGINT) AS c_custkey,
               CAST(r AS BIGINT) AS rank_scaled
        FROM r{PAGERANK_ITERS}
    """


_build_pagerank_oracle()


def _build_wl_oracle() -> None:
    """Bit-exact SQL replay of ``customers_wl_fingerprint``: the same
    HUGEINT splitmix64 multiply-split chain as the PageRank oracle (edges
    AND every color hash), the multiset sum as ``sum(h) % 2⁶⁴`` (the engine
    splits each hash into 32-bit halves so int64 partials never wrap — the
    recombined value is identical by construction), both refinement rounds
    UNROLLED, signed two's-complement fold on output."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def sm_chain(prefix: str, src: str, in_col: str, out: str) -> list[str]:
        return [
            f"{prefix}a AS (SELECT v, ({in_col} + {c1}) % {m64} AS x FROM {src})",
            f"{prefix}b AS (SELECT v, {mulmod('xor(x, x >> 30)', c2)} AS x FROM {prefix}a)",
            f"{prefix}c AS (SELECT v, {mulmod('xor(x, x >> 27)', c3)} AS x FROM {prefix}b)",
            f"{out} AS (SELECT v, xor(x, x >> 31) AS h FROM {prefix}c)",
        ]

    ctes = [
        "nodes AS (SELECT CAST(c_custkey AS HUGEINT) AS v FROM customer)",
        "nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM customer)",
        "ks(k) AS (VALUES (0), (1), (2))",
        f"x0 AS (SELECT v, (v * 8 + k) % {m64} AS x FROM nodes, ks)",
        f"e1 AS (SELECT v, (x + {c1}) % {m64} AS x FROM x0)",
        f"e2 AS (SELECT v, {mulmod('xor(x, x >> 30)', c2)} AS x FROM e1)",
        f"e3 AS (SELECT v, {mulmod('xor(x, x >> 27)', c3)} AS x FROM e2)",
        "edges AS (SELECT v AS src, xor(x, x >> 31) % (SELECT n FROM nn) AS dst FROM e3)",
        "col0 AS (SELECT n.v, CAST(COALESCE(d.c, 0) AS HUGEINT) AS col FROM nodes n "
        "LEFT JOIN (SELECT dst AS v, count(*) AS c FROM edges GROUP BY dst) d ON d.v = n.v)",
    ]
    for r in range(WL_ROUNDS):
        ctes += sm_chain(f"o{r}", f"col{r}", "col", f"oh{r}")
        ctes.append(
            f"s{r} AS (SELECT e.dst AS v, sum(oh.h) % {m64} AS s "
            f"FROM edges e JOIN oh{r} oh ON oh.v = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"z{r} AS (SELECT oh.v, xor(oh.h, COALESCE(s.s, 0)) AS zx "
            f"FROM oh{r} oh LEFT JOIN s{r} s ON s.v = oh.v)"
        )
        ctes += sm_chain(f"q{r}", f"z{r}", "zx", f"qq{r}")
        ctes.append(f"col{r + 1} AS (SELECT v, h AS col FROM qq{r})")
    ORACLE_SQL["customers_wl_fingerprint"] = f"""
        WITH {", ".join(ctes)}
        SELECT CAST(CASE WHEN col >= CAST(9223372036854775808 AS HUGEINT)
                         THEN col - {m64} ELSE col END AS BIGINT) AS wl_color,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM col{WL_ROUNDS} GROUP BY 1
    """


_build_wl_oracle()


def _build_wordpiece_oracle() -> None:
    """SQL replay of ``docs_wordpiece_encode``: maximal munch as a
    precomputed longest-match table per (word, position) — row_number over
    piece length; ties are impossible because equal-length pieces matching
    the same substring are the same piece — walked by a recursive CTE (each
    state has exactly one successor: a deterministic functional-graph walk,
    no aggregate needed inside the recursion).  The VALUES list is generated
    from the same ``stages.bpe`` constants the engine reads, so the two
    sides cannot drift."""
    from ..stages.bpe import WORDPIECE_CONT, WORDPIECE_INITIAL

    vals = ", ".join(
        [f"('{p}', 0)" for p in WORDPIECE_INITIAL] + [f"('{p}', 1)" for p in WORDPIECE_CONT]
    )
    ORACLE_SQL["docs_wordpiece_encode"] = f"""
        WITH RECURSIVE words AS (
            SELECT w AS word, CAST(count(*) AS BIGINT) AS n_corpus
            FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
                  FROM documents)
            GROUP BY w
        ),
        vocab(raw, cont) AS (VALUES {vals}),
        pos_dom AS (
            SELECT word, unnest(range(1, length(word) + 1)) AS pos FROM words
        ),
        step AS (
            SELECT word, pos, raw FROM (
                SELECT p.word, p.pos, v.raw,
                       row_number() OVER (PARTITION BY p.word, p.pos
                                          ORDER BY length(v.raw) DESC) AS rn
                FROM pos_dom p JOIN vocab v
                  ON v.cont = CASE WHEN p.pos > 1 THEN 1 ELSE 0 END
                 AND substring(p.word, p.pos, length(v.raw)) = v.raw
            ) WHERE rn = 1
        ),
        st(word, pos, np, pieces) AS (
            SELECT word, 1, 0, '' FROM words
            UNION ALL
            SELECT s.word, s.pos + length(t.raw), s.np + 1,
                   s.pieces || CASE WHEN s.np > 0 THEN ' ' ELSE '' END ||
                   CASE WHEN s.pos > 1 THEN '##' ELSE '' END || t.raw
            FROM st s JOIN step t ON t.word = s.word AND t.pos = s.pos
        ),
        fin AS (
            SELECT word, pos, np, pieces,
                   row_number() OVER (PARTITION BY word ORDER BY pos DESC) AS rn
            FROM st
        )
        SELECT w.word, w.n_corpus,
               CASE WHEN f.pos = length(w.word) + 1 THEN f.pieces
                    ELSE '[UNK]' END AS pieces,
               CAST(CASE WHEN f.pos = length(w.word) + 1 THEN f.np
                         ELSE 1 END AS BIGINT) AS n_pieces,
               CAST(CASE WHEN f.pos = length(w.word) + 1 THEN 0
                         ELSE 1 END AS BIGINT) AS is_unk
        FROM words w JOIN fin f ON f.word = w.word AND f.rn = 1
    """


_build_wordpiece_oracle()


def _build_cms_oracle(depth: int = 4, width: int = 2048, n_probes: int = 20) -> None:
    """Replay the Count-Min sketch exactly in DuckDB: per-key exact counts
    (the map-side contraction), the splitmix64(key ^ seed) chain per depth
    row in HUGEINT mod-2^64 (same split-multiply trick as the HLL oracle),
    counter cells via GROUP BY (r, idx), and the min-over-rows estimate with
    missing cells coalesced to 0.  Seeds are the engine's own
    ``sketches.CMS_SEEDS`` literals so the two sides cannot drift."""
    from ..stages.sketches import CMS_SEEDS

    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    seeds = ", ".join(f"({r}, CAST({CMS_SEEDS[r]} AS HUGEINT))" for r in range(depth))
    probes = ", ".join(f"(CAST({u} AS HUGEINT))" for u in range(n_probes))

    def chain(src: str, key: str, keep: str) -> str:
        """CTE chain hashing ``key`` from ``src`` per seed, carrying ``keep``."""
        return f"""
        {src}_s1 AS (SELECT r, {keep}, (xor({key}, s) + {c1}) % {m64} AS x
                     FROM {src} CROSS JOIN seeds),
        {src}_s2 AS (SELECT r, {keep}, {mulmod("xor(x, x >> 30)", c2)} AS x FROM {src}_s1),
        {src}_s3 AS (SELECT r, {keep}, {mulmod("xor(x, x >> 27)", c3)} AS x FROM {src}_s2),
        {src}_h AS (SELECT r, {keep}, xor(x, x >> 31) % {width} AS idx FROM {src}_s3)"""

    ORACLE_SQL["events_cms_user_counts"] = f"""
        WITH seeds(r, s) AS (VALUES {seeds}),
        k AS (SELECT ((CAST(user_id AS HUGEINT) % {m64}) + {m64}) % {m64} AS uid,
                     count(*) AS n
              FROM events GROUP BY user_id),
        {chain("k", "uid", "n")},
        cells AS (SELECT r, idx, sum(n) AS c FROM k_h GROUP BY r, idx),
        p(uid) AS (VALUES {probes}),
        {chain("p", "uid", "uid")},
        est AS (SELECT p_h.uid, min(coalesce(cells.c, 0)) AS est
                FROM p_h LEFT JOIN cells
                  ON cells.r = p_h.r AND cells.idx = p_h.idx
                GROUP BY p_h.uid)
        SELECT CAST(uid AS BIGINT) AS user_id, CAST(est AS BIGINT) AS est_count
        FROM est
    """


_build_cms_oracle()


def _build_epoch_shuffle_oracle(seed: int = 7) -> None:
    """Replay ``stages.sampling.epoch_shuffle`` exactly: the per-row
    splitmix64 chain in HUGEINT mod-2^64 (same split-multiply trick as the
    HLL/CMS oracles), the engine's int64 VIEW of the hash via an explicit
    two's-complement fold, and ``ROW_NUMBER`` over ``(signed hash, doc_id)``
    — the identical total order, so positions hash-match bit-exactly.  The
    seed pre-mix ``splitmix64(seed)`` is computed with the ENGINE's own
    kernel and inlined, so the two sides cannot drift."""
    from ..stages.sketches import splitmix64

    seed_mix = int(splitmix64(np.array([seed], dtype=np.uint64))[0])
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    # Golden records replay the full ER chain as a CTE, then survivorship:
    # mode source (ties -> smallest), min-doc representative, member count.
    ORACLE_SQL["docs_er_golden_records"] = f"""
        WITH lab AS ({ORACLE_SQL["docs_er_clusters"]}),
        j AS (
            SELECT l.cluster_id, d.doc_id, d.source
            FROM lab l JOIN documents d ON d.doc_id = l.doc_id
        ), m AS (
            SELECT cluster_id, source, CAST(count(*) AS BIGINT) AS c
            FROM j GROUP BY 1, 2
        ), pick AS (
            SELECT cluster_id, source AS canonical_source,
                   row_number() OVER (
                       PARTITION BY cluster_id ORDER BY c DESC, source
                   ) AS rn
            FROM m
        )
        SELECT s.cluster_id, p.canonical_source, s.rep_doc, s.n_members
        FROM (
            SELECT cluster_id,
                   CAST(min(doc_id) AS BIGINT) AS rep_doc,
                   CAST(count(*) AS BIGINT) AS n_members
            FROM j GROUP BY 1
        ) s JOIN pick p ON p.cluster_id = s.cluster_id AND p.rn = 1
    """

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["docs_epoch_shuffle"] = f"""
        WITH s1 AS (
            SELECT doc_id,
                   (xor(CAST(doc_id AS HUGEINT), CAST({seed_mix} AS HUGEINT))
                    + {c1}) % {m64} AS x
            FROM documents
        ),
        s2 AS (SELECT doc_id, {mulmod("xor(x, x >> 30)", c2)} AS x FROM s1),
        s3 AS (SELECT doc_id, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        hashed AS (
            SELECT doc_id,
                   CASE WHEN xor(x, x >> 31) >= CAST(9223372036854775808 AS HUGEINT)
                        THEN xor(x, x >> 31) - {m64}
                        ELSE xor(x, x >> 31) END AS sk
            FROM s3
        )
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY sk, doc_id) AS BIGINT) AS epoch_pos
        FROM hashed
    """


_build_epoch_shuffle_oracle()


def _build_stratified_folds_oracle() -> None:
    """Replay ``docs_stratified_folds``: the un-seeded splitmix64 chain in
    HUGEINT, the engine's signed int64 view via the two's-complement fold,
    and (row_number() − 1) % 5 partitioned by source over the identical
    (sk, doc_id) total order."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["docs_stratified_folds"] = f"""
        WITH s1 AS (
            SELECT doc_id, source,
                   (CAST(doc_id AS HUGEINT) + {c1}) % {m64} AS x
            FROM documents
        ),
        s2 AS (SELECT doc_id, source, {mulmod("xor(x, x >> 30)", c2)} AS x FROM s1),
        s3 AS (SELECT doc_id, source, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        hashed AS (
            SELECT doc_id, source,
                   CASE WHEN xor(x, x >> 31) >= CAST(9223372036854775808 AS HUGEINT)
                        THEN xor(x, x >> 31) - {m64}
                        ELSE xor(x, x >> 31) END AS sk
            FROM s3
        )
        SELECT doc_id, source,
               CAST((row_number() OVER (
                        PARTITION BY source ORDER BY sk, doc_id) - 1) % 5 AS BIGINT)
                   AS fold
        FROM hashed
    """


_build_stratified_folds_oracle()


def _build_fold_leakage_oracle() -> None:
    """Compose the registered stratified-folds oracle verbatim with the ER
    chain's candidate + trigram-verify CTEs; normalize to fold_a <= fold_b."""
    ORACLE_SQL["docs_fold_leakage_audit"] = f"""
        WITH f AS ({ORACLE_SQL["docs_stratified_folds"]}),
        toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents WHERE trim(text) <> ''
        ), g AS (
            SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
            FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
        ), blk AS (
            SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 20
        ), cand AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            JOIN blk ON a.gram = blk.gram
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        ), cg AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), p AS (
            SELECT c.a_id, c.b_id
            FROM cand c JOIN cg a ON a.doc_id = c.a_id JOIN cg b ON b.doc_id = c.b_id
            WHERE 10 * len(list_intersect(a.grams, b.grams))
                  >= 7 * len(list_distinct(list_concat(a.grams, b.grams)))
        )
        SELECT least(fa.fold, fb.fold) AS fold_a,
               greatest(fa.fold, fb.fold) AS fold_b,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM p JOIN f fa ON fa.doc_id = p.a_id JOIN f fb ON fb.doc_id = p.b_id
        GROUP BY 1, 2
    """


_build_fold_leakage_oracle()


def _build_rrf_oracle() -> None:
    """Compose the two registered ranking oracles verbatim (so the fusion
    can never drift from its inputs), rank each with row_number over the
    same (score DESC, doc_id) total order, FULL OUTER JOIN, RRF-sum with
    integer floor division, top-10."""
    ORACLE_SQL["docs_search_rrf"] = f"""
        WITH a AS ({ORACLE_SQL["docs_search_top10"]}),
        b AS ({ORACLE_SQL["docs_search_bm25"]}),
        ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM a),
        rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM b),
        u AS (
            SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
                   COALESCE(1000000000 // (60 + ra.r), 0)
                       + COALESCE(1000000000 // (60 + rb.r), 0) AS rrf_scaled,
                   COALESCE(ra.r, 0) AS rank_tfidf,
                   COALESCE(rb.r, 0) AS rank_bm25
            FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
        )
        SELECT doc_id,
               CAST(rrf_scaled AS BIGINT) AS rrf_scaled,
               CAST(rank_tfidf AS BIGINT) AS rank_tfidf,
               CAST(rank_bm25 AS BIGINT) AS rank_bm25
        FROM u ORDER BY rrf_scaled DESC, doc_id LIMIT 10
    """


_build_rrf_oracle()


def _build_rendezvous_oracle() -> None:
    """Replay ``docs_rendezvous_resharding``: the HUGEINT splitmix64 chain
    over unnested (doc, shard) inputs 32·d + s, both argmaxes as
    row_number() OVER (PARTITION BY doc ORDER BY h DESC, s) — unsigned
    HUGEINT order matches numpy's uint64 comparison, and the s ASC tie-break
    matches numpy's first-argmax."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    shard_vals = ", ".join(f"({s})" for s in range(9))
    ORACLE_SQL["docs_rendezvous_resharding"] = f"""
        WITH ks(s) AS (VALUES {shard_vals}),
        x0 AS (
            SELECT doc_id, s,
                   (CAST(doc_id AS HUGEINT) * 32 + s + {c1}) % {m64} AS x
            FROM documents, ks
        ),
        s2 AS (SELECT doc_id, s, {mulmod("xor(x, x >> 30)", c2)} AS x FROM x0),
        s3 AS (SELECT doc_id, s, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        hashed AS (SELECT doc_id, s, xor(x, x >> 31) AS h FROM s3),
        old AS (
            SELECT doc_id, s AS old_shard FROM (
                SELECT doc_id, s,
                       row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
                FROM hashed WHERE s < 8
            ) WHERE rn = 1
        ),
        neww AS (
            SELECT doc_id, s AS new_shard FROM (
                SELECT doc_id, s,
                       row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
                FROM hashed
            ) WHERE rn = 1
        )
        SELECT CAST(o.old_shard AS BIGINT) AS old_shard,
               CAST(n.new_shard AS BIGINT) AS new_shard,
               count(*) AS n_docs
        FROM old o JOIN neww n ON n.doc_id = o.doc_id
        GROUP BY o.old_shard, n.new_shard
    """


_build_rendezvous_oracle()


def _build_checksum_oracle() -> None:
    """Replay ``events_table_checksum``: the 4-application splitmix64 chain
    (event_id → ⊕ts → ⊕user → ⊕cents) generated programmatically in
    HUGEINT (3 CTEs per application, same multiply-split as every hash
    oracle), then sum % 2⁶⁴ per type and the signed two's-complement fold.
    Cents normalize to [0, 2⁶⁴) with the ((c % m)+m) % m idiom because
    value can be negative."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    carry = "event_type, tsn, usn, cen"
    ctes = [
        f"""t0 AS (
            SELECT event_type,
                   CAST(event_id AS HUGEINT) AS ev,
                   CAST(epoch_us(ts) AS HUGEINT) AS tsn,
                   CAST(user_id AS HUGEINT) AS usn,
                   ((CAST(round(value * 100) AS HUGEINT) % {m64}) + {m64}) % {m64} AS cen
            FROM events)"""
    ]
    prev = "t0"
    for i, field in enumerate([None, "tsn", "usn", "cen"]):
        base = "ev" if i == 0 else "xor(x, x >> 31)"
        inexpr = base if field is None else f"xor({base}, {field})"
        ctes.append(f"c{i}a AS (SELECT {carry}, ({inexpr} + {c1}) % {m64} AS x FROM {prev})")
        ctes.append(f"c{i}b AS (SELECT {carry}, {mulmod('xor(x, x >> 30)', c2)} AS x FROM c{i}a)")
        ctes.append(f"c{i}c AS (SELECT {carry}, {mulmod('xor(x, x >> 27)', c3)} AS x FROM c{i}b)")
        prev = f"c{i}c"
    ORACLE_SQL["events_table_checksum"] = f"""
        WITH {", ".join(ctes)},
        agg AS (
            SELECT event_type, count(*) AS n_rows,
                   sum(xor(x, x >> 31)) % {m64} AS cs
            FROM {prev} GROUP BY event_type
        )
        SELECT event_type, n_rows,
               CAST(CASE WHEN cs >= CAST(9223372036854775808 AS HUGEINT)
                         THEN cs - {m64} ELSE cs END AS BIGINT) AS checksum
        FROM agg
    """


_build_checksum_oracle()


def _build_weighted_sample_oracle() -> None:
    """Replay ``docs_weighted_sample``: HUGEINT splitmix64 chain over
    doc_id, priority = h // weight (unsigned floor division on both sides —
    all values non-negative), ORDER BY (priority, doc_id) LIMIT 20."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["docs_weighted_sample"] = f"""
        WITH x0 AS (
            SELECT doc_id, n_chars,
                   (CAST(doc_id AS HUGEINT) + {c1}) % {m64} AS x
            FROM documents
        ),
        s2 AS (SELECT doc_id, n_chars, {mulmod("xor(x, x >> 30)", c2)} AS x FROM x0),
        s3 AS (SELECT doc_id, n_chars, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        pri AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                   xor(x, x >> 31) // CAST(n_chars AS HUGEINT) AS p
            FROM s3
        )
        SELECT doc_id, weight, CAST(p AS BIGINT) AS priority
        FROM pri ORDER BY p, doc_id LIMIT 20
    """


_build_weighted_sample_oracle()


def _build_vocab_growth_oracle() -> None:
    """Replay `docs_vocab_growth`: the splitmix64 % 32 crawl-day chain in
    HUGEINT (identical to the `docs_near_dup_windowed` day CTE), a token's
    first day as min(day), then the per-day count + running sum."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["docs_vocab_growth"] = f"""
        WITH d1 AS (SELECT doc_id,
                           (CAST(doc_id AS HUGEINT) + {c1}) % {m64} AS x
                    FROM documents),
        d2 AS (SELECT doc_id, {mulmod("xor(x, x >> 30)", c2)} AS x FROM d1),
        d3 AS (SELECT doc_id, {mulmod("xor(x, x >> 27)", c3)} AS x FROM d2),
        days AS (SELECT doc_id,
                        CAST(xor(x, x >> 31) % 32 AS BIGINT) AS day
                 FROM d3),
        tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM documents
        ),
        f AS (
            SELECT w, min(day) AS day
            FROM tok JOIN days USING (doc_id) GROUP BY w
        ),
        c AS (SELECT day, CAST(count(*) AS BIGINT) AS new_tokens FROM f GROUP BY day)
        SELECT day, new_tokens,
               CAST(sum(new_tokens) OVER (ORDER BY day) AS BIGINT) AS vocab_size
        FROM c
    """


_build_vocab_growth_oracle()


def _build_bpe_encode_oracle() -> None:
    """Sequential ``replace()`` over '|'-joined characters replays the
    fixed-merge BPE segmentation exactly: SQL replace is non-overlapping
    left-to-right — the same leftmost-greedy semantics as the engine's
    run-parity merge kernel.  Generated from ``_BPE_FIXED_MERGES`` so the
    two sides share one literal."""
    expr = "regexp_replace(tok, '(.)', '\\1|', 'g') || '</w>'"
    for lf, rt in _BPE_FIXED_MERGES:
        expr = f"replace({expr}, '{lf}|{rt}', '{lf}{rt}')"
    ORACLE_SQL["docs_bpe_encode_fixed"] = f"""
        WITH src AS (
            SELECT doc_id, replace(text, '|', '') AS text FROM documents
        ), t AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
            FROM src WHERE trim(text) <> ''
        ), seg AS (
            SELECT doc_id, {expr} AS s FROM t
        )
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(len(string_split(s, '|'))) AS BIGINT) AS n_subwords
        FROM seg GROUP BY doc_id
    """


_build_bpe_encode_oracle()


def _build_zorder_oracle() -> None:
    """Bit-interleave replay: z = Σ_k ((u>>k)&1)<<(2k+1) | ((h>>k)&1)<<(2k),
    written as a sum of integer terms (DuckDB has no bit-interleave)."""
    terms = []
    for k in range(8):
        terms.append(f"(((u >> {k}) & 1) * {1 << (2 * k + 1)})")
        terms.append(f"(((h >> {k}) & 1) * {1 << (2 * k)})")
    z = " + ".join(terms)
    ORACLE_SQL["events_zorder_cells"] = f"""
        WITH d AS (
            SELECT user_id % 256 AS u, EXTRACT(hour FROM ts) AS h FROM events
        ), zd AS (
            SELECT ({z}) // 64 AS zcell, u, h FROM d
        )
        SELECT zcell, count(*) AS n,
               min(u) AS u_min, max(u) AS u_max,
               min(h) AS h_min, max(h) AS h_max
        FROM zd GROUP BY zcell
    """


_build_zorder_oracle()


def _build_hll_sliding_oracle(p: int = 8) -> None:
    """The sliding-window HLL replay: same splitmix64 HUGEINT chain as
    ``_build_hll_oracle``, with the group being the WINDOW hour — each active
    hour collects the distinct users of hours [wh-2h, wh] via a range join,
    then registers, max-merge and the estimator replay exactly."""
    m = 1 << p
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    pow2 = ", ".join(f"({k}, CAST({1 << k} AS HUGEINT))" for k in range(64))
    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["events_sliding_distinct_users"] = f"""
        WITH pow2(k, p2) AS (VALUES {pow2}),
        hours AS (SELECT DISTINCT date_trunc('hour', ts) AS wh FROM events),
        v AS (
            SELECT DISTINCT h.wh, CAST(e.user_id AS HUGEINT) AS uid
            FROM events e JOIN hours h
              ON date_trunc('hour', e.ts) <= h.wh
             AND date_trunc('hour', e.ts) >= h.wh - INTERVAL 2 HOUR
        ),
        s1 AS (SELECT wh,
                      (((uid % {m64}) + {m64}) % {m64} + {c1}) % {m64} AS x
               FROM v),
        s2 AS (SELECT wh, {mulmod("xor(x, x >> 30)", c2)} AS x FROM s1),
        s3 AS (SELECT wh, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        hashed AS (SELECT wh, xor(x, x >> 31) AS h FROM s3),
        rows_rho AS (
            SELECT wh,
                   h >> {64 - p} AS reg,
                   CASE WHEN (h * {m}) % {m64} = 0 THEN {64 - p + 1}
                        ELSE 64 - (SELECT max(k) FROM pow2
                                   WHERE p2 <= (h * {m}) % {m64})
                   END AS rho
            FROM hashed
        ),
        merged AS (
            SELECT wh, reg, max(rho) AS rho
            FROM rows_rho GROUP BY wh, reg
        ),
        est AS (
            SELECT wh,
                   count(*) AS nonzero,
                   {m} - count(*) AS zeros,
                   sum(power(2.0::DOUBLE, -rho)) AS snz
            FROM merged GROUP BY wh
        )
        SELECT wh AS hour,
               CAST(round(
                   CASE WHEN (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {m}))
                             * {m} * {m} / (snz + zeros) <= 2.5::DOUBLE * {m}
                             AND zeros > 0
                        THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                        ELSE (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {m}))
                             * {m} * {m} / (snz + zeros)
                   END) AS BIGINT) AS approx_distinct
        FROM est
    """


_build_hll_sliding_oracle()


def _build_kmv_oracle(k: int = 128) -> None:
    """Replay the KMV / theta set-operation sketch bit-exact in DuckDB.

    Same splitmix64 HUGEINT chain as ``_build_hll_oracle`` over distinct
    ``(event_type, user_id)``; theta is the k-th smallest DISTINCT hash per
    type via ``row_number()`` (or 2**64 — a HUGEINT literal — when fewer
    than k survive, the exact mode), registers every hash STRICTLY below
    theta, pair algebra over ``theta' = least(theta_a, theta_b)`` with set
    union / intersection as UNION-ALL-distinct / equi-join counts, and every
    estimate the identical exact integer ``cnt * 2**64 // theta`` the engine
    computes (``sketches.kmv_estimate``), so the hash matches bit for bit."""
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["events_type_overlap_kmv"] = f"""
        WITH v AS (
            SELECT DISTINCT event_type,
                   ((CAST(user_id AS HUGEINT) % {m64}) + {m64}) % {m64} AS uid
            FROM events
        ),
        s1 AS (SELECT event_type, (uid + {c1}) % {m64} AS x FROM v),
        s2 AS (SELECT event_type, {mulmod("xor(x, x >> 30)", c2)} AS x FROM s1),
        s3 AS (SELECT event_type, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        hashed AS (SELECT DISTINCT event_type, xor(x, x >> 31) AS h FROM s3),
        ranked AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM hashed
        ),
        theta AS (
            SELECT event_type,
                   CASE WHEN count(*) >= {k}
                        THEN max(CASE WHEN rn = {k} THEN h END)
                        ELSE {m64} END AS th
            FROM ranked GROUP BY event_type
        ),
        regs AS (
            SELECT r.event_type, r.h
            FROM ranked r JOIN theta t ON r.event_type = t.event_type
            WHERE r.h < t.th
        ),
        cnts AS (SELECT event_type, count(*) AS cnt FROM regs GROUP BY event_type),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.th AS tha, b.th AS thb,
                   CASE WHEN a.th < b.th THEN a.th ELSE b.th END AS thm
            FROM theta a JOIN theta b ON a.event_type < b.event_type
        ),
        sa AS (SELECT p.type_a, p.type_b, r.h
               FROM pairs p JOIN regs r
                 ON r.event_type = p.type_a AND r.h < p.thm),
        sb AS (SELECT p.type_a, p.type_b, r.h
               FROM pairs p JOIN regs r
                 ON r.event_type = p.type_b AND r.h < p.thm),
        uni AS (
            SELECT type_a, type_b, count(DISTINCT h) AS cu
            FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) u
            GROUP BY type_a, type_b
        ),
        intr AS (
            SELECT sa.type_a, sa.type_b, count(*) AS ci
            FROM sa JOIN sb
              ON sa.type_a = sb.type_a AND sa.type_b = sb.type_b AND sa.h = sb.h
            GROUP BY sa.type_a, sa.type_b
        )
        SELECT p.type_a, p.type_b,
               CAST((ca.cnt * {m64}) // p.tha AS BIGINT) AS est_a,
               CAST((cb.cnt * {m64}) // p.thb AS BIGINT) AS est_b,
               CAST((coalesce(uni.cu, 0) * {m64}) // p.thm AS BIGINT) AS est_union,
               CAST((coalesce(intr.ci, 0) * {m64}) // p.thm AS BIGINT) AS est_inter
        FROM pairs p
        JOIN cnts ca ON ca.event_type = p.type_a
        JOIN cnts cb ON cb.event_type = p.type_b
        LEFT JOIN uni  ON uni.type_a = p.type_a AND uni.type_b = p.type_b
        LEFT JOIN intr ON intr.type_a = p.type_a AND intr.type_b = p.type_b
    """


_build_kmv_oracle()


# Snapshot diff: the same two deterministic views the engine derives, a
# FULL OUTER JOIN on the key, status by NULL-side / payload compare (value
# compared as IEEE doubles — the +1.0 mutation is exact on both engines),
# counts per (NEW-side-preferred) event_type × status.
ORACLE_SQL["events_snapshot_diff"] = """
    WITH old AS (
        SELECT event_id, user_id, event_type, ts, value
        FROM events WHERE event_id % 97 <> 0
    ),
    new AS (
        SELECT event_id, user_id, event_type, ts,
               CASE WHEN event_id % 11 = 0 THEN value + 1.0 ELSE value END AS value
        FROM events WHERE event_id % 89 <> 0
    ),
    j AS (
        SELECT coalesce(n.event_type, o.event_type) AS event_type,
               CASE WHEN o.event_id IS NULL THEN 'added'
                    WHEN n.event_id IS NULL THEN 'removed'
                    WHEN o.value <> n.value OR o.user_id <> n.user_id
                         OR o.ts <> n.ts OR o.event_type <> n.event_type
                    THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
    )
    SELECT event_type, status, CAST(count(*) AS BIGINT) AS n
    FROM j GROUP BY event_type, status
"""


# Market-basket lift: distinct (order, part) baskets, self-join pairs with
# a < b, support ≥ 2, lift as the same exact BIGINT permille floor division
# the engine computes (both sides raise on BIGINT/int64 overflow), top-20 by
# the total (lift desc, part_a, part_b) order.
ORACLE_SQL["parts_co_purchase_lift"] = """
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS nb FROM b),
    f AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM b GROUP BY p),
    pr AS (
        SELECT b1.p AS part_a, b2.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
        FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p
        GROUP BY b1.p, b2.p
        HAVING count(*) >= 2
    )
    SELECT part_a, part_b, n_ab,
           (n_ab * (SELECT nb FROM nn) * 1000) // (ca.np * cb.np) AS lift_permille
    FROM pr
    JOIN f ca ON ca.p = pr.part_a
    JOIN f cb ON cb.p = pr.part_b
    ORDER BY lift_permille DESC, part_a, part_b
    LIMIT 20
"""


def _build_dd_quantile_oracle(sub_bits: int = 7) -> None:
    """Replay the log-histogram quantile sketch bit-exact in DuckDB.

    The octave of each value comes from a RECURSIVE-DOUBLING powers-of-two
    table (p(e) = p(e−1)·2 starting at the smallest subnormal 5e-324 — every
    doubling is exact, unlike ``pow()`` whose rounding at extreme exponents
    is unspecified): x joins the unique row with ``p ≤ |x| < 2p``.  The
    sub-bucket is ``floor((|x|/p − 1)·2^b)`` — |x|/p is a power-of-two
    division (exact), the subtraction and the dyadic multiply are exact, so
    the integer cell matches numpy's frexp-based kernel
    (``sketches._dd_cells``) bit-for-bit.  Rank = integer ceil division
    ``(q·n + 99) // 100`` on BOTH sides (no float rank drift); output is the
    integer (q_pct, sign, e, m) bucket triple per percentile."""
    sb = 1 << sub_bits
    ORACLE_SQL["events_value_quantile_sketch"] = f"""
        WITH RECURSIVE pow2(e, p) AS (
            SELECT -1074, 5e-324
            UNION ALL
            SELECT e + 1, p * 2 FROM pow2 WHERE e < 1023
        ),
        v AS (SELECT value AS x FROM events),
        cells AS (
            SELECT (CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END)
                   * (CASE WHEN x = 0 THEN 0
                      ELSE (p2.e + 1100) * {sb}
                           + CAST(floor((abs(x) / p2.p - 1.0) * {sb}.0) AS BIGINT)
                      END) AS cell,
                   count(*) AS n
            FROM v LEFT JOIN pow2 p2
              ON x <> 0 AND p2.p <= abs(x) AND abs(x) < p2.p * 2
            GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
        ranked AS (SELECT cell, CAST(sum(n) OVER (ORDER BY cell) AS BIGINT) AS cum
                   FROM cells),
        q(q_pct) AS (VALUES (50), (90), (99)),
        pick AS (
            SELECT q.q_pct, min(r.cell) AS cell
            FROM q CROSS JOIN tot JOIN ranked r
              ON r.cum >= greatest((q.q_pct * tot.nt + 99) // 100, 1)
            GROUP BY q.q_pct
        )
        SELECT CAST(q_pct AS BIGINT) AS q_pct,
               CAST(CASE WHEN cell > 0 THEN 1 WHEN cell < 0 THEN -1 ELSE 0 END
                    AS BIGINT) AS sign,
               CAST(CASE WHEN cell = 0 THEN 0 ELSE abs(cell) // {sb} - 1100 END
                    AS BIGINT) AS e,
               CAST(CASE WHEN cell = 0 THEN 0 ELSE abs(cell) % {sb} END
                    AS BIGINT) AS m
        FROM pick
        ORDER BY q_pct
    """


def _build_dd_group_quantile_oracle(sub_bits: int = 7) -> None:
    """Grouped twin of ``_build_dd_quantile_oracle``: same exact-arithmetic
    cell assignment, with registers, totals, window cumsum, and ranks all
    PARTITIONed BY the group column."""
    sb = 1 << sub_bits
    ORACLE_SQL["events_type_value_quantile_sketch"] = f"""
        WITH RECURSIVE pow2(e, p) AS (
            SELECT -1074, 5e-324
            UNION ALL
            SELECT e + 1, p * 2 FROM pow2 WHERE e < 1023
        ),
        v AS (SELECT event_type AS g, value AS x FROM events),
        cells AS (
            SELECT g,
                   (CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END)
                   * (CASE WHEN x = 0 THEN 0
                      ELSE (p2.e + 1100) * {sb}
                           + CAST(floor((abs(x) / p2.p - 1.0) * {sb}.0) AS BIGINT)
                      END) AS cell,
                   count(*) AS n
            FROM v LEFT JOIN pow2 p2
              ON x <> 0 AND p2.p <= abs(x) AND abs(x) < p2.p * 2
            GROUP BY 1, 2
        ),
        tot AS (SELECT g, CAST(sum(n) AS BIGINT) AS nt FROM cells GROUP BY g),
        ranked AS (SELECT g, cell,
                          CAST(sum(n) OVER (PARTITION BY g ORDER BY cell) AS BIGINT) AS cum
                   FROM cells),
        q(q_pct) AS (VALUES (50), (90), (99)),
        pick AS (
            SELECT t.g, q.q_pct, min(r.cell) AS cell
            FROM q CROSS JOIN tot t JOIN ranked r
              ON r.g = t.g AND r.cum >= greatest((q.q_pct * t.nt + 99) // 100, 1)
            GROUP BY 1, 2
        )
        SELECT g AS event_type,
               CAST(q_pct AS BIGINT) AS q_pct,
               CAST(CASE WHEN cell > 0 THEN 1 WHEN cell < 0 THEN -1 ELSE 0 END
                    AS BIGINT) AS sign,
               CAST(CASE WHEN cell = 0 THEN 0 ELSE abs(cell) // {sb} - 1100 END
                    AS BIGINT) AS e,
               CAST(CASE WHEN cell = 0 THEN 0 ELSE abs(cell) % {sb} END
                    AS BIGINT) AS m
        FROM pick
        ORDER BY event_type, q_pct
    """


_build_dd_quantile_oracle()
_build_dd_group_quantile_oracle()


def _build_simhash_oracle() -> None:
    """SimHash is deterministic arithmetic too: per char-3-gram polynomial
    hash (``functions.hashing.char_ngram_hashes``) → 64 per-bit majority
    votes → fingerprint.  Replayed in DuckDB with the SAME ``_P`` constant
    imported from the engine (so the two sides cannot drift): gram hash =
    ``(b0·P² + b1·P + b2) mod 2^64`` over HUGEINT (bytes < 256, so no int128
    overflow), bit votes via a 64-row pow2 cross join, fingerprint as the
    sum of winning powers of two.  Assumes ASCII text (char == byte, true of
    the synth ``documents`` table) and rows ≥ 3 chars (no ``include_short``
    fallback rows; min synth doc length is 47)."""
    from ..functions.hashing import _P

    p_int = int(_P)
    m = 1 << 64
    p1, p2c = p_int % m, (p_int * p_int) % m
    m64 = "CAST(18446744073709551616 AS HUGEINT)"
    pow2 = ", ".join(f"({k}, CAST({1 << k} AS HUGEINT))" for k in range(64))
    ORACLE_SQL["docs_simhash"] = f"""
        WITH pow2(bit, p2) AS (VALUES {pow2}),
        t AS (SELECT doc_id, lower(text) AS tl FROM documents),
        pos AS (SELECT doc_id, tl, unnest(range(1, length(tl) - 1)) AS p FROM t),
        g AS (SELECT doc_id,
                     (CAST(ord(substr(tl, p, 1)) AS HUGEINT) * {p2c}
                      + CAST(ord(substr(tl, p + 1, 1)) AS HUGEINT) * {p1}
                      + ord(substr(tl, p + 2, 1))) % {m64} AS h
              FROM pos),
        votes AS (
            SELECT doc_id, bit,
                   sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM g CROSS JOIN pow2 GROUP BY doc_id, bit
        ),
        fp AS (
            SELECT doc_id, sum(CASE WHEN s > 0 THEN p2 ELSE 0 END) AS f
            FROM votes JOIN pow2 USING (bit) GROUP BY doc_id
        )
        SELECT doc_id,
               lower(lpad(hex(CAST(f AS HUGEINT)), 16, '0')) AS simhash_hex
        FROM fp
    """


_build_simhash_oracle()


def _build_minhash_oracle() -> None:
    """The 'seeded' MinHash+LSH near-dup pipeline is ALSO deterministic
    arithmetic end-to-end, so it gets a full DuckDB replay: token polynomial
    hashes (``hash_strings``: length-seeded, 64-byte cap), word-3-shingle
    rolling hashes, 128 affine permutations (coefficients embedded from
    ``_perm_coeffs(128, 42)`` — the SAME RandomState draw the engine uses),
    per-band slice equality for candidates (true slice equality == the
    engine's 64-bit band-key equality modulo negligible hash collisions), and
    the all-perm signature-Jaccard verify.  All mod-2^64 products use the
    32-bit-split trick so HUGEINT never overflows.  Assumes every document
    has ≥ 3 tokens (no short-row shingle branch; synth min is 10) and ASCII
    text (char == byte)."""
    from ..functions.hashing import _P, _SEED_MIX, _perm_coeffs

    p_int, mix = int(_P), int(_SEED_MIX)
    m = 1 << 64
    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"(((({col} % 4294967296) * {hi}) % 4294967296) "
            f"* 4294967296 + {col} * {lo}) % {m64}"
        )

    powt = ", ".join(f"({k}, CAST({pow(p_int, k, m)} AS HUGEINT))" for k in range(65))
    a, b = _perm_coeffs(128, 42)
    perms = ", ".join(
        f"({j}, {int(a[j]) >> 32}, {int(a[j]) & 0xFFFFFFFF}, CAST({int(b[j])} AS HUGEINT))"
        for j in range(128)
    )
    p2 = pow(p_int, 2, m)

    def make_ctes(src: str) -> str:
        return f"""powt(e, pe) AS (VALUES {powt}),
        perms(j, a_hi, a_lo, bc) AS (VALUES {perms}),
        t AS (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM {src}),
        tok AS (SELECT doc_id, unnest(toks) AS w,
                       unnest(range(1, len(toks) + 1)) AS ti FROM t),
        tokb AS (SELECT doc_id, ti, w, least(length(w), 64) AS L,
                        unnest(range(1, least(length(w), 64) + 1)) AS i FROM tok),
        bysum AS (
            SELECT doc_id, ti, any_value(L) AS L,
                   (CAST(any_value(length(w)) AS HUGEINT) * {p_int} + {mix})
                       % {m64} AS h0,
                   sum(CAST(ord(substr(w, CAST(i AS INTEGER), 1)) AS HUGEINT)
                       * powt.pe) AS bsum
            FROM tokb JOIN powt ON powt.e = L - i
            GROUP BY doc_id, ti
        ),
        tokh AS (
            SELECT doc_id, ti,
                   ((((((h0 % 4294967296) * (pe >> 32)) % 4294967296) * 4294967296
                      + h0 * (pe & 4294967295)) % {m64}) + bsum) % {m64} AS th
            FROM bysum JOIN powt ON powt.e = L
        ),
        sh AS (
            SELECT t0.doc_id AS doc_id,
                   ({mulmod("t0.th", p2)} + {mulmod("t1.th", p_int)} + t2.th)
                       % {m64} AS s
            FROM tokh t0
            JOIN tokh t1 ON t1.doc_id = t0.doc_id AND t1.ti = t0.ti + 1
            JOIN tokh t2 ON t2.doc_id = t0.doc_id AND t2.ti = t0.ti + 2
        ),
        sig AS (
            SELECT doc_id, j,
                   min(((((((s % 4294967296) * a_hi) % 4294967296) * 4294967296
                        + s * a_lo) % {m64}) + bc) % {m64}) AS sv
            FROM sh CROSS JOIN perms GROUP BY doc_id, j
        ),
        siga AS (SELECT doc_id, list(sv ORDER BY j) AS sg FROM sig GROUP BY doc_id),
        cand AS (
            SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                   len(list_filter(range(1, 129), i -> x.sg[i] = y.sg[i])) AS k
            FROM siga x JOIN siga y ON x.doc_id < y.doc_id
            WHERE len(list_filter(range(0, 16),
                  bd -> x.sg[bd*8+1 : bd*8+8] = y.sg[bd*8+1 : bd*8+8])) > 0
        )"""

    ORACLE_SQL["docs_minhash_near_dup"] = f"""
        WITH {make_ctes("documents")}
        SELECT a_id, b_id,
               CAST(round(k / 128.0 * 1000000) AS BIGINT) / 1000000.0 AS est_jaccard
        FROM cand WHERE k >= 64
    """
    ORACLE_SQL["docs_minhash_calibration"] = f"""
        WITH {make_ctes("documents")},
        shd AS (SELECT doc_id, list_distinct(list(s)) AS ss FROM sh GROUP BY doc_id),
        pj AS (
            SELECT c.a_id, c.b_id, CAST(c.k AS BIGINT) AS sig_agree,
                   CAST(len(list_intersect(xa.ss, xb.ss)) AS BIGINT) AS inter,
                   CAST(len(list_distinct(list_concat(xa.ss, xb.ss))) AS BIGINT) AS uni
            FROM cand c JOIN shd xa ON xa.doc_id = c.a_id
                        JOIN shd xb ON xb.doc_id = c.b_id
        )
        SELECT a_id, b_id, sig_agree,
               CAST(1000 * sig_agree // 128 AS BIGINT) AS est_permille,
               inter, uni,
               CAST(1000 * inter // uni AS BIGINT) AS exact_permille
        FROM pj
    """
    # Full two-stage pipeline: LSH candidates at est >= 0.3, exact char-3-gram
    # Jaccard verify at 0.4 (gram algebra identical to docs_window_jaccard's
    # proven SQL twin).
    ORACLE_SQL["docs_near_dup_verified"] = f"""
        WITH {make_ctes("documents")},
        keep AS (SELECT a_id, b_id FROM cand WHERE k / 128.0 >= 0.3),
        g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), v AS (
            SELECT keep.a_id, keep.b_id,
                   CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                     / greatest(len(list_distinct(list_concat(ga.grams, gb.grams))), 1) AS jac
            FROM keep
            JOIN g ga ON ga.doc_id = keep.a_id
            JOIN g gb ON gb.doc_id = keep.b_id
        )
        SELECT a_id, b_id,
               CAST(round(jac * 1000000) AS BIGINT) / 1000000.0 AS jaccard
        FROM v WHERE jac >= 0.4
    """
    # Time-windowed near-dup: the SAME candidate + verify replay gated by the
    # deterministic crawl-day view (splitmix64(doc_id) % 32 — the engine's
    # `_crawl_day`, replayed term-by-term in HUGEINT) at |Δday| ≤ 7.  The
    # engine's cell-mixed banding finds exactly the within-window subset of
    # `cand` (cells differ ≤ 1 whenever |Δday| ≤ 7), so filtering the global
    # candidate set here is the identical pair set.
    c1 = 0x9E3779B97F4A7C15
    c2, c3 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    ORACLE_SQL["docs_near_dup_windowed"] = f"""
        WITH {make_ctes("documents")},
        keep AS (SELECT a_id, b_id FROM cand WHERE k / 128.0 >= 0.3),
        d1 AS (SELECT doc_id,
                      (CAST(doc_id AS HUGEINT) + {c1}) % {m64} AS x
               FROM documents),
        d2 AS (SELECT doc_id, {mulmod("xor(x, x >> 30)", c2)} AS x FROM d1),
        d3 AS (SELECT doc_id, {mulmod("xor(x, x >> 27)", c3)} AS x FROM d2),
        days AS (SELECT doc_id,
                        CAST(xor(x, x >> 31) % 32 AS BIGINT) AS day
                 FROM d3),
        win AS (
            SELECT keep.a_id, keep.b_id, da.day AS day_a, db.day AS day_b
            FROM keep
            JOIN days da ON da.doc_id = keep.a_id
            JOIN days db ON db.doc_id = keep.b_id
            WHERE abs(da.day - db.day) <= 7
        ),
        g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM documents
        ), v AS (
            SELECT win.a_id, win.b_id, win.day_a, win.day_b,
                   CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                     / greatest(len(list_distinct(list_concat(ga.grams, gb.grams))), 1) AS jac
            FROM win
            JOIN g ga ON ga.doc_id = win.a_id
            JOIN g gb ON gb.doc_id = win.b_id
        )
        SELECT a_id, b_id, day_a, day_b,
               CAST(round(jac * 1000000) AS BIGINT) / 1000000.0 AS jaccard
        FROM v WHERE jac >= 0.4
    """
    # The FULL corpus dedup (exact contraction → LSH candidates over
    # representatives → gram verify at 0.5 → min-label connected components →
    # drop list with reasons).  Every stage reuses a replay proven above;
    # closure via the recursive-CTE pattern from docs_window_jaccard_clusters.
    ORACLE_SQL["docs_dedup_corpus"] = f"""
        WITH RECURSIVE reps AS (
            SELECT min(doc_id) AS doc_id, text
            FROM documents GROUP BY text
        ),
        {make_ctes("reps")},
        keep AS (SELECT a_id, b_id FROM cand WHERE k >= 64),
        g AS (
            SELECT doc_id,
                   CASE WHEN length(text) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, length(text) - 2),
                                 i -> substring(text, i, 3)))
                        WHEN length(text) > 0 THEN [text]
                        ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM reps
        ),
        ver AS (
            SELECT keep.a_id, keep.b_id
            FROM keep
            JOIN g ga ON ga.doc_id = keep.a_id
            JOIN g gb ON gb.doc_id = keep.b_id
            WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                    / greatest(len(list_distinct(list_concat(ga.grams, gb.grams))), 1)
                  >= 0.5
        ),
        e AS (
            SELECT a_id AS src, b_id AS dst FROM ver
            UNION ALL SELECT b_id, a_id FROM ver
        ),
        reach(node, mlab) AS (
            SELECT doc_id, doc_id FROM reps
            UNION
            SELECT e.dst, r.mlab FROM reach r JOIN e ON e.src = r.node
        ),
        lab AS (SELECT node, min(mlab) AS label FROM reach GROUP BY node)
        SELECT d.doc_id, r.doc_id AS dropped_for, 'exact_dup_of' AS reason
        FROM documents d JOIN reps r USING (text)
        WHERE d.doc_id <> r.doc_id
        UNION ALL
        SELECT node AS doc_id, label AS dropped_for, 'near_dup_of' AS reason
        FROM lab WHERE node <> label
    """


_build_minhash_oracle()


def _lsh_knn_sql() -> str:
    """Random-hyperplane LSH k-NN is deterministic given the seed: the plane
    matrix (``RandomState(42).randn(64, 64)``, the engine's exact draw for
    64-dim embeddings) is embedded as literals, bucket keys replayed as
    sign-bit sums, candidates = share-a-bucket-in-any-table PER QUERY, and
    ranking mirrors the brute-force oracle (cosine DESC, vec_id ASC).  Sign
    parity is safe: the minimum |projection| on the synth embeddings is
    ~3.6e-5, eight orders above f64 rounding noise.  Assumes 64-dim
    embeddings (true of the synth table at every SF)."""
    from ..stages.ann import AnnConfig

    cfg = AnnConfig()
    planes = np.random.RandomState(cfg.seed).randn(64, cfg.n_tables * cfg.n_planes)
    rows = []
    for t in range(cfg.n_tables):
        for j in range(cfg.n_planes):
            col = planes[:, t * cfg.n_planes + j]
            pv = "[" + ", ".join(repr(float(x)) for x in col) + "]"
            rows.append(f"({t}, {j}, {pv}::DOUBLE[])")
    planes_values = ", ".join(rows)
    return f"""
        WITH planes(t, j, pv) AS (VALUES {planes_values}),
        keys AS (
            SELECT e.vec_id, p.t,
                   sum(CASE WHEN list_dot_product(e.embedding, p.pv) > 0
                            THEN (1 << p.j) ELSE 0 END) AS bkey
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id, p.t
        ),
        qk AS (SELECT vec_id AS query_id, t, bkey FROM keys WHERE vec_id < 5),
        cand AS (
            SELECT DISTINCT qk.query_id, k2.vec_id
            FROM qk JOIN keys k2 ON k2.t = qk.t AND k2.bkey = qk.bkey
        ),
        ranked AS (
            SELECT c.query_id, c.vec_id,
                   row_number() OVER (
                       PARTITION BY c.query_id
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                c.vec_id
                   ) AS rank
            FROM cand c
            JOIN embeddings q ON q.vec_id = c.query_id
            JOIN embeddings e ON e.vec_id = c.vec_id
        )
        SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5
    """


ORACLE_SQL["emb_knn_lsh_top5"] = _lsh_knn_sql()


def _build_lsh_recall_oracle() -> None:
    """Compose the registered brute-force and LSH k-NN oracles verbatim;
    recall@5 per query as a LEFT JOIN + matched count."""
    ORACLE_SQL["emb_knn_lsh_recall"] = f"""
        WITH bf AS ({ORACLE_SQL["emb_knn_top5"]}),
        lsh AS ({ORACLE_SQL["emb_knn_lsh_top5"]})
        SELECT b.query_id,
               CAST(count(l.vec_id) AS BIGINT) AS n_hits,
               CAST(1000 * count(l.vec_id) // 5 AS BIGINT) AS recall_permille
        FROM bf b LEFT JOIN lsh l
             ON l.query_id = b.query_id AND l.vec_id = b.vec_id
        GROUP BY b.query_id
    """


_build_lsh_recall_oracle()


def _build_fs_calibration_oracle() -> None:
    """Compose the registered Fellegi-Sunter oracle verbatim; group by the
    distinct weights, precision as integer floor permille."""
    ORACLE_SQL["docs_fs_calibration"] = f"""
        WITH fs AS ({ORACLE_SQL["docs_fs_match_weights"]})
        SELECT weight_ppm,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(is_match) AS BIGINT) AS n_matches,
               CAST(1000 * sum(is_match) // count(*) AS BIGINT) AS precision_permille
        FROM fs GROUP BY weight_ppm
    """


_build_fs_calibration_oracle()


def _build_best_match_oracle() -> None:
    """Compose the registered nearest-neighbor oracle verbatim into the
    recursive min-label closure over its (doc, best-neighbor) edges."""
    ORACLE_SQL["docs_best_match_clusters"] = f"""
        WITH RECURSIVE nn AS ({ORACLE_SQL["docs_nearest_neighbor"]}),
        ee AS (
            SELECT doc_id AS src, nbr_id AS dst FROM nn
            UNION SELECT nbr_id, doc_id FROM nn
        ),
        nodes AS (SELECT DISTINCT src AS v FROM ee),
        reach(node, m) AS (
            SELECT v, v FROM nodes
            UNION
            SELECT ee.dst, r.m FROM reach r JOIN ee ON ee.src = r.node
        )
        SELECT node AS doc_id, CAST(min(m) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """


_build_best_match_oracle()


def _emb_lsh_scored_cte() -> str:
    """Shared replay prefix for the embedding-LSH family: the single
    12-plane sign sketch (``RandomState(42).randn(64, 12).astype(float32)``,
    embedded exactly — repr round-trips each f32 as a double), bucket =
    12-bit key equality, then in-bucket exact float64 cosine.  Sign parity
    is safe: min |projection| on the synth embeddings is ~2e-4, ~20× the
    engine's own dot-product noise floor."""
    from ..stages.dedup import DedupConfig

    cfg = DedupConfig()
    planes = np.random.RandomState(cfg.seed).randn(64, 12).astype(np.float32)
    rows = []
    for j in range(12):
        pv = "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"
        rows.append(f"({j}, {pv}::DOUBLE[])")
    planes_values = ", ".join(rows)
    return f"""
        WITH planes(j, pv) AS (VALUES {planes_values}),
        keys AS (
            SELECT e.vec_id,
                   sum(CASE WHEN list_dot_product(e.embedding, p.pv) > 0
                            THEN (1 << p.j) ELSE 0 END) AS bkey
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id
        ),
        cand AS (
            SELECT x.vec_id AS a_id, y.vec_id AS b_id
            FROM keys x JOIN keys y ON x.bkey = y.bkey AND x.vec_id < y.vec_id
        ),
        scored AS (
            SELECT c.a_id, c.b_id,
                   list_cosine_similarity(ea.embedding, eb.embedding) AS cos
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.a_id
            JOIN embeddings eb ON eb.vec_id = c.b_id
        )
    """


def _emb_near_dup_sql(threshold: float = 0.95) -> str:
    """Embedding-LSH near-dup replay — cosine-threshold parity is safe at
    0.95: max in-bucket cosine on the synth embeddings is ~0.35."""
    return (
        _emb_lsh_scored_cte()
        + f"""
        SELECT a_id, b_id,
               CAST(round(cos * 1000000) AS BIGINT) / 1000000.0 AS cosine
        FROM scored WHERE cos >= {threshold}
    """
    )


def _emb_semantic_dedup_sql(threshold: float) -> str:
    """SemDeDup replay: the keep-lowest-id drop rule over the scored LSH
    pairs — a vector drops iff some lower-id bucket-mate has cosine ≥ τ."""
    return (
        _emb_lsh_scored_cte()
        + f""",
        drops AS (
            SELECT b_id AS vec_id, CAST(min(a_id) AS BIGINT) AS dup_of
            FROM scored WHERE cos >= {threshold} GROUP BY b_id
        )
        SELECT e.vec_id,
               CASE WHEN d.vec_id IS NULL THEN 'kept' ELSE 'dropped' END AS status,
               COALESCE(d.dup_of, -1) AS dup_of
        FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.vec_id
    """
    )


ORACLE_SQL["emb_near_dup"] = _emb_near_dup_sql()
ORACLE_SQL["emb_semantic_dedup"] = _emb_semantic_dedup_sql(0.3)

ORACLE_SQL["q13_customer_distribution"] = """
    WITH oc AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, COALESCE(n, 0) AS c_count
        FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    )
    GROUP BY c_count
"""

ORACLE_SQL["q15_top_supplier"] = """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_c4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_c4 / 10000.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rev_c4 = (SELECT max(rev_c4) FROM rev)
"""

ORACLE_SQL["q17_small_quantity_revenue"] = """
    WITH pl AS (
        SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
    ), st AS (
        SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s
        FROM pl GROUP BY l_partkey
    )
    SELECT CAST(sum(cents) AS BIGINT) / 700.0 AS avg_yearly
    FROM pl JOIN st ON l_partkey = k
    WHERE 10 * q * n < 2 * s
"""

ORACLE_SQL["q18_large_volume_customers"] = """
    WITH tq AS (
        SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING total_qty > 280
    )
    SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
    FROM tq JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
"""

ORACLE_SQL["q19_disjunctive_revenue"] = """
    WITH f AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    )
    SELECT CAST(sum(rev_c4) AS BIGINT) / 10000.0 AS revenue FROM f
"""

ORACLE_SQL["events_dau_wau_stickiness"] = """
    WITH pairs AS (
        SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx, user_id
        FROM events
    ), dau AS (
        SELECT day_idx, CAST(count(*) AS BIGINT) AS dau FROM pairs GROUP BY day_idx
    ), wau AS (
        SELECT d.day_idx, CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM (SELECT DISTINCT day_idx FROM pairs) d
        JOIN pairs p ON p.day_idx BETWEEN d.day_idx - 6 AND d.day_idx
        GROUP BY d.day_idx
    )
    SELECT dau.day_idx, dau.dau, wau.wau,
           CAST(dau.dau * 1000 // wau.wau AS BIGINT) AS stickiness_pm
    FROM dau JOIN wau ON dau.day_idx = wau.day_idx
"""

ORACLE_SQL["events_mad_outliers"] = """
    WITH cells AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cell FROM events
    ), med AS (
        SELECT event_type, quantile_disc(cell, 0.5) AS m
        FROM cells GROUP BY event_type
    ), mad AS (
        SELECT c.event_type, quantile_disc(abs(c.cell - med.m), 0.5) AS d
        FROM cells c JOIN med ON c.event_type = med.event_type
        GROUP BY c.event_type
    )
    SELECT c.event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN abs(c.cell - med.m) > 3 * mad.d THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM cells c
    JOIN med ON c.event_type = med.event_type
    JOIN mad ON c.event_type = mad.event_type
    GROUP BY c.event_type
"""

ORACLE_SQL["events_user_rfm"] = """
    WITH u AS (
        SELECT user_id,
               CAST(max(epoch_us(ts)) AS BIGINT) AS rec_us,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mon_c
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(NTILE(4) OVER (ORDER BY rec_us, user_id) AS BIGINT) AS r_tile,
           CAST(NTILE(4) OVER (ORDER BY freq, user_id) AS BIGINT) AS f_tile,
           CAST(NTILE(4) OVER (ORDER BY mon_c, user_id) AS BIGINT) AS m_tile
    FROM u
"""

ORACLE_SQL["events_weekly_churn"] = """
    WITH pairs AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week_idx
        FROM events
    ), w AS (
        SELECT user_id, week_idx,
               LAG(week_idx)  OVER (PARTITION BY user_id ORDER BY week_idx) AS prv,
               LEAD(week_idx) OVER (PARTITION BY user_id ORDER BY week_idx) AS nxt
        FROM pairs
    )
    SELECT week_idx,
           CAST(count(*) AS BIGINT) AS active,
           CAST(sum(CASE WHEN prv = week_idx - 1 THEN 0 ELSE 1 END) AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN nxt = week_idx + 1 THEN 1 ELSE 0 END) AS BIGINT) AS retained_next,
           CAST(count(*) - sum(CASE WHEN nxt = week_idx + 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS churned_next,
           CAST((count(*) - sum(CASE WHEN nxt = week_idx + 1 THEN 1 ELSE 0 END)) * 1000
                // count(*) AS BIGINT) AS churn_pm
    FROM w GROUP BY week_idx
"""

ORACLE_SQL["orders_revenue_pareto"] = """
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        FROM orders GROUP BY o_custkey
    ), tot AS (
        SELECT CAST(sum(rev_c) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n FROM cust
    ), ranked AS (
        SELECT CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS rn
        FROM cust
    ), hit AS (
        SELECT CAST(min(rn) AS BIGINT) AS top_n, CAST(min(cum) AS BIGINT) AS cum80
        FROM ranked, tot WHERE cum * 5 >= t * 4
    )
    SELECT tot.n AS total_customers,
           hit.top_n AS top_n_80,
           CAST(hit.cum80 * 1000 // tot.t AS BIGINT) AS top_share_pm
    FROM tot, hit
"""

ORACLE_SQL["q22_sales_opportunity"] = """
    WITH bal AS (
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
    ), avgt AS (
        SELECT CAST(sum(bal_c) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS n
        FROM bal WHERE bal_c > 0
    )
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(bal_c) AS BIGINT) / 100.0 AS totacctbal
    FROM bal, avgt
    WHERE bal_c * n > tot
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = bal.c_custkey AND o_totalprice > 300000)
    GROUP BY nationkey
"""

ORACLE_SQL["q8_market_share"] = """
    WITH j AS (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c4,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'AFRICA'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ), s AS (
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_18' THEN rev_c4 ELSE 0 END) AS BIGINT) AS num,
               CAST(sum(rev_c4) AS BIGINT) AS den
        FROM j GROUP BY o_year
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(round((100.0 * num) / den * 10000) AS BIGINT) / 10000.0 AS mkt_share,
           num / 10000.0 AS nation_revenue,
           den / 10000.0 AS total_revenue
    FROM s
"""

# The jsonl_mentions oracle reads the fixture path directly — make sure the
# fixture exists as soon as this module is imported (the driver may run the
# oracle SQL before the Ray-side query).
from ..sources.jsonl import write_toy_fixture as _write_toy_fixture  # noqa: E402

_write_toy_fixture(_JSONL_FIXTURE_PATH)

"""Distributed prefix scan: bit-identical to a sequential scan at any layout."""

import numpy as np
import pyarrow as pa
import ray

from mix_blink_ray.stages.scan import prefix_scan


def _run(tbl: pa.Table, n_blocks: int):
    ds = ray.data.from_arrow(tbl).repartition(n_blocks)
    out = prefix_scan(ds, ["k"], "v", out_col="run", row_col="rn").to_pandas()
    return out.sort_values("rn").reset_index(drop=True)


def test_prefix_scan_matches_sequential():
    rng = np.random.default_rng(2)
    n = 5_000
    keys = rng.permutation(n).astype(np.int64)
    vals = rng.integers(-1000, 1000, size=n, dtype=np.int64)
    tbl = pa.table({"k": keys, "v": vals})
    order = np.argsort(keys, kind="stable")
    expect_run = np.cumsum(vals[order])
    for blocks in (1, 4, 13):
        out = _run(tbl, blocks)
        assert (out["run"].to_numpy() == expect_run).all()
        assert (out["rn"].to_numpy() == np.arange(1, n + 1)).all()
        assert (out["k"].to_numpy() == keys[order]).all()


def test_prefix_scan_layout_invariant():
    rng = np.random.default_rng(4)
    tbl = pa.table(
        {
            "k": rng.permutation(800).astype(np.int64),
            "v": rng.integers(0, 10, size=800, dtype=np.int64),
        }
    )
    a = _run(tbl, 2)
    b = _run(tbl, 9)
    assert a.equals(b)


def test_grouped_prefix_scan_matches_pandas_window():
    """Per-group running sums must match SUM() OVER (PARTITION BY g ORDER BY k)
    at every block layout — groups straddling block boundaries is the case
    that matters."""
    import pandas as pd

    from mix_blink_ray.stages.scan import grouped_prefix_scan

    rng = np.random.default_rng(7)
    n = 3_000
    tbl = pa.table(
        {
            "g": pa.array([f"src{int(x)}" for x in rng.integers(0, 5, n)]),
            "k": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        }
    )
    df = tbl.to_pandas().sort_values(["g", "k"]).reset_index(drop=True)
    df["want_run"] = df.groupby("g")["v"].cumsum()
    df["want_rn"] = df.groupby("g").cumcount() + 1
    for n_blocks in (1, 7, 40):
        ds = ray.data.from_arrow(tbl).repartition(n_blocks)
        out = (
            grouped_prefix_scan(ds, "g", ["k"], "v", out_col="run", row_col="rn")
            .to_pandas()
            .sort_values(["g", "k"])
            .reset_index(drop=True)
        )
        assert (out["run"] == df["want_run"]).all(), n_blocks
        assert (out["rn"] == df["want_rn"]).all(), n_blocks


def test_budget_mix_keeps_exact_prefix_per_group():
    from mix_blink_ray.stages.scan import budget_mix

    tbl = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"] * 3),
            "k": pa.array(list(range(5)) + list(range(3)), pa.int64()),
            "v": pa.array([4, 4, 4, 4, 4, 10, 10, 10], pa.int64()),
        }
    )
    out = (
        budget_mix(ray.data.from_arrow(tbl).repartition(3), "g", ["k"], "v", budget=12, out_col="cum")
        .to_pandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    # a: 4,8,12 kept (inclusive budget), 16 dropped; b: 10 kept, 20 dropped
    assert list(zip(out.g, out.k, out.cum)) == [("a", 0, 4), ("a", 1, 8), ("a", 2, 12), ("b", 0, 10)]


def test_bigram_counts_respect_row_boundaries():
    """The last token of one doc must not pair with the first of the next."""
    from collections import Counter

    from mix_blink_ray.stages.vocab import bigram_counts

    texts = ["a b c", "c a", "x", "", "b c a b"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(texts)})
    out = bigram_counts(ray.data.from_arrow(tbl).repartition(2)).to_pandas()
    want = Counter()
    for t in texts:
        tk = t.split()
        want.update(" ".join(tk[i : i + 2]) for i in range(len(tk) - 1))
    assert dict(zip(out.bigram, out.n)) == dict(want)


def test_revenue_pareto_hand_computed(tmp_path):
    """Hand-computed 80% threshold: revenues 50,30,10,10 (cents 5000...) —
    top-1 cum=50 <80, top-2 cum=80 >=80 exactly at the boundary (cum*5 ==
    total*4), so top_n_80=2 and share 800 permille; per-customer sums
    contract multi-order customers first."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import orders_revenue_pareto

    # customer 1: 30+20=50; customer 2: 30; customer 3: 10; customer 4: 10
    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_custkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 5),
            "o_totalprice": pa.array([30.0, 20.0, 30.0, 10.0, 10.0]),
            "o_orderdate": pa.array([np.datetime64("1995-01-01", "us")] * 5),
            "o_orderpriority": pa.array(["1-URGENT"] * 5),
        }
    )
    pq.write_table(tbl, tmp_path / "orders.parquet")
    out = orders_revenue_pareto(str(tmp_path)).to_pandas()
    assert out.loc[0, "total_customers"] == 4
    assert out.loc[0, "top_n_80"] == 2
    assert out.loc[0, "top_share_pm"] == 800

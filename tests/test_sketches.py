"""HyperLogLog sketch: hash/clz unit tests, error bound vs exact distinct,
and partition invariance (register max-merge is order- and batching-free)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.stages.sketches import _clz64, _estimate, hll_distinct, splitmix64

SF_DIR = "/root/testdata/sf0.001"


def test_splitmix64_known_vector():
    # splitmix64(seed=0) first output — the published reference value
    out = splitmix64(np.array([0], dtype=np.uint64))
    assert out[0] == np.uint64(0xE220A8397B1DCDAF)


def test_clz64_matches_bit_length():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(1, 2**63, size=200, dtype=np.uint64),
            np.array([1, 2, 3, 2**32, 2**52, 2**63, 2**64 - 1], dtype=np.uint64),
        ]
    )
    got = _clz64(vals)
    want = np.array([64 - int(v).bit_length() for v in vals], dtype=np.int64)
    np.testing.assert_array_equal(got, want)
    assert _clz64(np.array([0], dtype=np.uint64))[0] == 63  # callers mask zero


def test_estimate_linear_counting_small_n():
    # tiny cardinality → linear-counting regime is near-exact
    p = 12
    m = 1 << p
    h = splitmix64(np.arange(100, dtype=np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rho = np.where(w == 0, np.int64(64 - p + 1), _clz64(w) + 1)
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, idx, rho)
    assert abs(_estimate(regs, p) - 100) <= 5  # linear-counting variance at n=100, m=4096


def test_hll_error_bound_vs_exact(ray_session):
    con = duckdb.connect()
    exact = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM '{SF_DIR}/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"])
    got = hll_distinct(ds, "event_type", "user_id", p=12)
    assert got.num_rows == len(exact)
    for et, approx in zip(got["event_type"].to_pylist(), got["approx_distinct"].to_pylist()):
        n = exact[et]
        assert abs(approx - n) <= max(1, 0.05 * n), (et, approx, n)


def test_hll_partition_invariant(ray_session):
    tbl = pa.table(
        {
            "g": pa.array(["a"] * 500 + ["b"] * 300),
            "v": pa.array(list(range(500)) + list(range(1000, 1300)), pa.int64()),
        }
    )
    a = hll_distinct(rd.from_arrow(tbl).repartition(2), "g", "v", p=10)
    b = hll_distinct(rd.from_arrow(tbl).repartition(7), "g", "v", p=10)
    assert a.to_pydict() == b.to_pydict()


def test_heavy_hitters_exact_under_compression():
    """Zipf stream with far more distinct values than k: the MG candidate
    pass must compress (decrements fire) yet the verified output equals the
    exact GROUP BY HAVING answer."""
    import numpy as np
    import pyarrow as pa
    import ray

    from mix_blink_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(5)
    vals = rng.zipf(1.5, size=20_000)
    vals = np.minimum(vals, 5_000)  # ~thousands of distinct items
    items = np.char.add("it", vals.astype(str))
    ds = ray.data.from_arrow(pa.table({"v": pa.array(items.tolist(), pa.string())})).repartition(6)
    min_frac = 0.02
    out = heavy_hitters(ds, "v", min_frac, k=64).to_pandas()

    import collections
    exact = collections.Counter(items.tolist())
    thr = min_frac * len(items)
    expect = sorted((t, c) for t, c in exact.items() if c >= thr)
    got = sorted(zip(out["v"], out["cnt"]))
    assert got == expect
    assert len(expect) > 0


def test_heavy_hitters_partition_invariant():
    import numpy as np
    import pyarrow as pa
    import ray

    from mix_blink_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(9)
    items = [f"w{int(v)}" for v in np.minimum(rng.zipf(1.3, size=5_000), 500)]
    tbl = pa.table({"v": pa.array(items, pa.string())})
    a = heavy_hitters(ray.data.from_arrow(tbl).repartition(2), "v", 0.03, k=40).to_pandas()
    b = heavy_hitters(ray.data.from_arrow(tbl).repartition(11), "v", 0.03, k=40).to_pandas()
    assert sorted(zip(a["v"], a["cnt"])) == sorted(zip(b["v"], b["cnt"]))


def test_heavy_hitters_k_too_small_raises():
    import pyarrow as pa
    import pytest
    import ray

    from mix_blink_ray.stages.sketches import heavy_hitters

    ds = ray.data.from_arrow(pa.table({"v": pa.array(["a", "b"] * 10, pa.string())}))
    with pytest.raises(ValueError, match="too small"):
        heavy_hitters(ds, "v", 0.05, k=4)


def test_heavy_hitters_empty_input():
    import pyarrow as pa
    import ray

    from mix_blink_ray.stages.sketches import heavy_hitters

    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    out = heavy_hitters(ds, "v", 0.01)
    assert out.num_rows == 0
    assert out.schema.names == ["v", "cnt"]


# ---------------------------------------------------------------- dd sketch

def _dd_ds(x, parallelism=4):
    import ray.data as rd

    return rd.from_arrow(pa.table({"v": pa.array(x, pa.float64())})).repartition(parallelism)


def test_dd_quantile_rank_error_bound(ray_session):
    """The bucket lower bound must be within relative 2^-sub_bits of the
    EXACT quantile_disc value at the same rank — the sketch's guarantee,
    over a heavy-tailed mix of magnitudes, signs and exact zeros."""
    from mix_blink_ray.stages.sketches import dd_estimate, dd_quantiles

    rng = np.random.default_rng(7)
    x = np.concatenate(
        [rng.lognormal(0, 4, 4000), -rng.lognormal(-2, 3, 2000), np.zeros(50)]
    )
    got = dd_quantiles(_dd_ds(x), "v", [1, 10, 50, 90, 99], sub_bits=7).to_pandas()
    xs = np.sort(x)
    n = len(x)
    for row in got.itertuples(index=False):
        rank = max((row.q_pct * n + 99) // 100, 1)
        true = xs[rank - 1]
        est = float(dd_estimate(np.array([row.sign]), np.array([row.e]), np.array([row.m]), 7)[0])
        if true == 0.0:
            assert est == 0.0
        else:
            assert abs(est - true) / abs(true) <= 2**-7 + 1e-15, (row.q_pct, est, true)


def test_dd_registers_partition_invariant(ray_session):
    """Register merge is count addition — the (cell, n) table must be
    bit-identical across partition layouts (the HLL/CMS convention)."""
    import pandas as pd

    from mix_blink_ray.stages.sketches import dd_registers

    rng = np.random.default_rng(11)
    x = rng.lognormal(1, 5, 3000)
    a = dd_registers(_dd_ds(x, 1), "v").to_pandas().sort_values("cell").reset_index(drop=True)
    b = dd_registers(_dd_ds(x, 13), "v").to_pandas().sort_values("cell").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["n"].sum() == len(x)
    # bounded state: register count is capped by octave span x 2^sub_bits,
    # independent of row count / distinct-value count
    _, ex = np.frexp(x)
    cap = (int(ex.max()) - int(ex.min()) + 1) * 128
    assert len(a) <= cap


def test_dd_nonfinite_raises(ray_session):
    import pytest

    from mix_blink_ray.stages.sketches import dd_quantiles

    with pytest.raises(Exception, match="NaN/inf"):
        dd_quantiles(_dd_ds([1.0, float("nan"), 2.0], 1), "v", [50]).to_pandas()


def test_dd_subnormal_and_extreme_cells():
    """The cell kernel is exact across the FULL double range — subnormals,
    the largest finite double, and sign mirroring."""
    from mix_blink_ray.stages.sketches import _dd_cells, _dd_decode, dd_estimate

    x = np.array([5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
                  -5e-324, -1.7976931348623157e308, 0.0, 1.0, -1.0])
    c = _dd_cells(x, 7)
    s, e, m = _dd_decode(c, 7)
    est = dd_estimate(s, e, m, 7)
    nz = x != 0
    rel = np.abs(est[nz] - x[nz]) / np.abs(x[nz])
    assert (rel <= 2**-7).all()
    assert c[np.argsort(x, kind="stable")].tolist() == sorted(c.tolist())
    assert c[5] == 0 and est[5] == 0.0


def _kmv_ds(groups, values, blocks=1):
    tbl = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "v": pa.array(values, pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_kmv_exact_mode_small_groups(ray_session):
    """Distinct count < k ⇒ theta = 2**64 and the estimator returns the
    EXACT distinct count (cnt·2**64 // 2**64 = cnt) — for every group and
    every pair set-operation."""
    from mix_blink_ray.stages.sketches import kmv_estimate, kmv_group_registers

    # a: {1..30}, b: {21..50} → |a|=30 |b|=30 |a∩b|=10 |a∪b|=50
    g = ["a"] * 30 + ["b"] * 30 + ["a"] * 5  # duplicates must not count twice
    v = list(range(1, 31)) + list(range(21, 51)) + list(range(1, 6))
    regs = kmv_group_registers(_kmv_ds(g, v, blocks=3), "g", "v", k=128)
    ta, ha = regs["a"]
    tb, hb = regs["b"]
    assert ta == 1 << 64 and tb == 1 << 64
    assert kmv_estimate(len(ha), ta) == 30
    assert kmv_estimate(len(hb), tb) == 30
    sa, sb = set(ha), set(hb)
    th = min(ta, tb)
    assert kmv_estimate(len(sa | sb), th) == 50
    assert kmv_estimate(len(sa & sb), th) == 10


def test_kmv_error_bound_vs_exact(ray_session):
    """Sketch mode (distinct ≫ k): single-set and union/intersection
    estimates within the KMV error envelope (≈1/sqrt(k−2), generous 5×)."""
    from mix_blink_ray.stages.sketches import kmv_estimate, kmv_group_registers

    k = 256
    na, nb, shared = 20_000, 15_000, 5_000
    a_vals = list(range(na))  # a: [0, 20000)
    b_vals = list(range(na - shared, na - shared + nb))  # overlap = 5000
    g = ["a"] * na + ["b"] * nb
    regs = kmv_group_registers(_kmv_ds(g, a_vals + b_vals, blocks=4), "g", "v", k=k)
    ta, ha = regs["a"]
    tb, hb = regs["b"]
    tol = 5.0 / np.sqrt(k - 2)
    assert abs(kmv_estimate(len(ha), ta) - na) <= tol * na
    assert abs(kmv_estimate(len(hb), tb) - nb) <= tol * nb
    th = min(ta, tb)
    sa = {h for h in ha if h < th}
    sb = {h for h in hb if h < th}
    union_true = na + nb - shared
    assert abs(kmv_estimate(len(sa | sb), th) - union_true) <= tol * union_true
    # intersection error scales with the UNION cardinality, not |a∩b|
    assert abs(kmv_estimate(len(sa & sb), th) - shared) <= tol * union_true


def test_kmv_partition_invariant(ray_session):
    """Registers and theta are bit-identical regardless of block layout
    (bottom-k merge is order-free)."""
    from mix_blink_ray.stages.sketches import kmv_group_registers

    rng = np.random.default_rng(11)
    v = rng.integers(0, 5_000, size=8_000).tolist()
    g = ["t%d" % (x % 3) for x in v]
    r1 = kmv_group_registers(_kmv_ds(g, v, blocks=1), "g", "v", k=64)
    r7 = kmv_group_registers(_kmv_ds(g, v, blocks=7), "g", "v", k=64)
    assert r1 == r7


def test_kmv_k_too_small_raises(ray_session):
    import pytest

    from mix_blink_ray.stages.sketches import kmv_group_registers

    with pytest.raises(ValueError, match="k must be"):
        kmv_group_registers(_kmv_ds(["a"], [1]), "g", "v", k=1)

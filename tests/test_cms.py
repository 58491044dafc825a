"""Count-Min sketch: overestimate-only guarantee, exactness at wide grids,
partition-layout invariance (sum-merge is order-free)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.sketches import cms_counts


def _ds(keys: np.ndarray, parallelism: int):
    return rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(parallelism)


def test_cms_exact_when_wide(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=5000, dtype=np.int64)
    true = np.bincount(keys, minlength=50).astype(np.int64)
    out = cms_counts(_ds(keys, 4), "k", probe_keys=list(range(50)), depth=4, width=4096)
    est = out["est_count"].to_numpy()
    # 50 keys into 4096 cells over 4 independent rows: min-over-rows is exact
    # unless all 4 rows collide — deterministic, and with these seeds it doesn't
    assert np.array_equal(est, true)


def test_cms_overestimates_only_under_forced_collisions(ray_session):
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 200, size=8000, dtype=np.int64)
    true = np.bincount(keys, minlength=200).astype(np.int64)
    # width 16 « 200 keys: every cell collides, estimates must still be ≥ true
    out = cms_counts(_ds(keys, 4), "k", probe_keys=list(range(200)), depth=4, width=16)
    est = out["est_count"].to_numpy()
    assert np.all(est >= true)
    assert est.sum() > true.sum(), "narrow grid must actually collide"
    # error bound: est - true ≤ sum of everything in the key's cells; the
    # expected CM bound e*N/width holds with prob 1-(1/e)^depth — check the
    # deterministic outcome stays within the hard worst case N
    assert np.all(est - true <= len(keys))


def test_cms_partition_invariance(ray_session):
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 64, size=3000, dtype=np.int64)
    a = cms_counts(_ds(keys, 1), "k", probe_keys=list(range(64)), depth=4, width=64)
    b = cms_counts(_ds(keys, 13), "k", probe_keys=list(range(64)), depth=4, width=64)
    assert a.equals(b)


def test_cms_absent_probe_is_zero_or_collision(ray_session):
    keys = np.arange(10, dtype=np.int64)
    out = cms_counts(_ds(keys, 2), "k", probe_keys=[999_999], depth=4, width=2048)
    assert int(out["est_count"][0].as_py()) in (0, 1)  # 0 unless a 4-way collision


def test_cms_negative_keys_match_duckdb_replay(ray_session):
    """Negative int64 keys: the engine wraps via two's complement
    (.view(uint64)); the SQL replay must normalize ((k % 2^64)+2^64)%2^64 the
    same way — this is the exact arithmetic the events oracle relies on."""
    import duckdb

    from mix_blink_ray.stages.sketches import CMS_SEEDS

    keys = np.array([-1, -7, -2**63, 5, 0, -12345], dtype=np.int64)
    reps = np.array([3, 1, 2, 4, 1, 5], dtype=np.int64)
    all_keys = np.repeat(keys, reps)
    got = cms_counts(_ds(all_keys, 3), "k", probe_keys=keys.tolist(), depth=4, width=64)

    m64 = "CAST(18446744073709551616 AS HUGEINT)"

    def mulmod(col, c):
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (f"(((({col} % 4294967296) * {hi}) % 4294967296) "
                f"* 4294967296 + {col} * {lo}) % {m64}")

    c1, c2, c3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    seeds = ", ".join(f"({r}, CAST({CMS_SEEDS[r]} AS HUGEINT))" for r in range(4))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(k),) for k in all_keys])
    sql = f"""
        WITH seeds(r, s) AS (VALUES {seeds}),
        kk AS (SELECT ((CAST(k AS HUGEINT) % {m64}) + {m64}) % {m64} AS uid,
                      count(*) AS n FROM t GROUP BY k),
        s1 AS (SELECT r, n, (xor(uid, s) + {c1}) % {m64} AS x FROM kk CROSS JOIN seeds),
        s2 AS (SELECT r, n, {mulmod("xor(x, x >> 30)", c2)} AS x FROM s1),
        s3 AS (SELECT r, n, {mulmod("xor(x, x >> 27)", c3)} AS x FROM s2),
        cells AS (SELECT r, xor(x, x >> 31) % 64 AS idx, sum(n) AS c
                  FROM s3 GROUP BY 1, 2),
        p AS (SELECT ((CAST(k AS HUGEINT) % {m64}) + {m64}) % {m64} AS uid,
                     k FROM (SELECT DISTINCT k FROM t)),
        p1 AS (SELECT r, k, (xor(uid, s) + {c1}) % {m64} AS x FROM p CROSS JOIN seeds),
        p2 AS (SELECT r, k, {mulmod("xor(x, x >> 30)", c2)} AS x FROM p1),
        p3 AS (SELECT r, k, {mulmod("xor(x, x >> 27)", c3)} AS x FROM p2),
        pidx AS (SELECT r, k, xor(x, x >> 31) % 64 AS idx FROM p3),
        est AS (SELECT k, min(coalesce(c, 0)) AS est
                FROM pidx LEFT JOIN cells ON cells.r = pidx.r AND cells.idx = pidx.idx
                GROUP BY k)
        SELECT k, CAST(est AS BIGINT) AS est_count FROM est ORDER BY k
    """
    want = con.execute(sql).df()
    got_df = got.to_pandas().rename(columns={"k": "k"}).sort_values("k").reset_index(drop=True)
    assert got_df["est_count"].tolist() == want.sort_values("k")["est_count"].tolist()

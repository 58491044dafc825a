"""2-D skyline (Pareto frontier): kernel parity vs brute-force dominance,
duplicate-point survival, layout invariance, guards."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.pipelines import queries as q
from mix_blink_ray.stages.topk import frontier_mask_2d, pareto_frontier_2d

SF_DIR = "/root/testdata/sf0.001"


def _brute(d1, d2):
    n = len(d1)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i != j and d1[j] >= d1[i] and d2[j] <= d2[i] and (d1[j] > d1[i] or d2[j] < d2[i]):
                keep[i] = False
                break
    return keep


def test_kernel_matches_brute_force(ray_session):
    rng = np.random.default_rng(3)
    for _ in range(150):
        n = int(rng.integers(1, 50))
        d1 = rng.integers(-5, 6, n).astype(np.int64)
        d2 = rng.integers(-5, 6, n).astype(np.int64)
        got = frontier_mask_2d(d1, d2)
        assert (got == _brute(d1, d2)).all(), (d1.tolist(), d2.tolist())


def test_duplicates_both_survive_and_strictness(ray_session):
    # identical points dominate nothing: both stay on the frontier
    d1 = np.array([5, 5, 5, 3], dtype=np.int64)
    d2 = np.array([2, 2, 7, 1], dtype=np.int64)
    m = frontier_mask_2d(d1, d2)
    # (5,2) twice survive; (5,7) dominated by (5,2) same-d1 strict d2;
    # (3,1) survives (nothing has d1>=3 AND d2<=1 strictly better)
    assert m.tolist() == [True, True, False, True]


def test_dataset_frontier_layout_invariant(ray_session):
    rng = np.random.default_rng(11)
    n = 500
    tbl = pa.table(
        {
            "k": pa.array(np.arange(n)),
            "a": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "b": pa.array(rng.integers(0, 10_000, n).astype(np.int64)),
        }
    )
    outs = []
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        f = pareto_frontier_2d(ds, "a", "b").to_pandas().sort_values("k").reset_index(drop=True)
        outs.append(f)
    assert outs[0].equals(outs[1])
    # and equals the single-pass kernel on the raw arrays
    m = frontier_mask_2d(tbl["a"].to_numpy(), tbl["b"].to_numpy())
    assert sorted(outs[0]["k"]) == sorted(np.flatnonzero(m).tolist())


def test_guards(ray_session):
    with pytest.raises(ValueError, match="INT64_MIN"):
        frontier_mask_2d(np.array([np.iinfo(np.int64).min]), np.array([0], dtype=np.int64))
    with pytest.raises(ValueError, match="empty"):
        pareto_frontier_2d(
            rd.from_arrow(pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})),
            "a",
            "b",
        )


def test_parts_skyline_is_minimal_and_complete(ray_session):
    out = q.parts_skyline(SF_DIR).to_pandas()
    full = q._t(SF_DIR, "part", ["p_partkey", "p_size", "p_retailprice"]).to_pandas()
    full["price_c"] = np.rint(full["p_retailprice"] * 100).astype(np.int64)
    m = _brute(full["p_size"].to_numpy().astype(np.int64), full["price_c"].to_numpy())
    assert sorted(out["p_partkey"]) == sorted(full["p_partkey"].to_numpy()[m].tolist())

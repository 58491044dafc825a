"""interval_join: brute-force parity (every in-range pair exactly once),
bucket-boundary edge cases, empty/degenerate intervals, layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.joins import interval_join

W = 3_600_000_000  # 1h in us


def _points(ts_us: np.ndarray):
    return pa.table(
        {
            "pid": pa.array(np.arange(len(ts_us), dtype=np.int64)),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )


def _intervals(ws: np.ndarray, we: np.ndarray):
    return pa.table(
        {
            "iid": pa.array(np.arange(len(ws), dtype=np.int64)),
            "ws": pa.array(ws, pa.int64()),
            "we": pa.array(we, pa.int64()),
        }
    )


def _brute(points: pa.Table, intervals: pa.Table) -> pd.DataFrame:
    p, i = points.to_pandas(), intervals.to_pandas()
    p["ts_us"] = p["ts"].astype("int64")
    out = p.merge(i, how="cross")
    out = out[(out["ts_us"] >= out["ws"]) & (out["ts_us"] < out["we"])]
    return out[["pid", "iid"]].sort_values(["pid", "iid"]).reset_index(drop=True)


@pytest.mark.parametrize("parallelism", [1, 7])
def test_interval_join_bruteforce_parity(ray_session, parallelism):
    rng = np.random.default_rng(13)
    ts = rng.integers(0, 50 * W, size=2000, dtype=np.int64)
    ws = rng.integers(0, 48 * W, size=60, dtype=np.int64)
    we = ws + rng.integers(1, 5 * W, size=60, dtype=np.int64)  # spans 1..5 buckets
    pts, ivs = _points(ts), _intervals(ws, we)
    got = (
        interval_join(
            rd.from_arrow(pts).repartition(parallelism),
            rd.from_arrow(ivs).repartition(max(1, parallelism // 2)),
            "ts", "ws", "we", bucket_us=W, num_partitions=4,
        )
        .to_pandas()[["pid", "iid"]]
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    want = _brute(pts, ivs)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_interval_join_exactly_once_multibucket(ray_session):
    # one interval covering 10 buckets, points inside it: each pair once
    ts = np.arange(10, dtype=np.int64) * W + W // 2
    pts = _points(ts)
    ivs = _intervals(np.array([0]), np.array([10 * W]))
    got = interval_join(
        rd.from_arrow(pts), rd.from_arrow(ivs), "ts", "ws", "we",
        bucket_us=W, num_partitions=4,
    ).to_pandas()
    assert len(got) == 10
    assert got["pid"].is_unique


def test_interval_join_boundaries(ray_session):
    # start inclusive, end exclusive, exactly at bucket edges
    ts = np.array([W, 2 * W - 1, 2 * W], dtype=np.int64)
    pts = _points(ts)
    ivs = _intervals(np.array([W]), np.array([2 * W]))
    got = interval_join(
        rd.from_arrow(pts), rd.from_arrow(ivs), "ts", "ws", "we",
        bucket_us=W, num_partitions=2,
    ).to_pandas()
    assert sorted(got["pid"]) == [0, 1]  # ts==2W excluded (end exclusive)


def test_interval_join_empty_interval_matches_nothing(ray_session):
    pts = _points(np.array([5], dtype=np.int64))
    ivs = _intervals(np.array([5]), np.array([5]))  # zero-length
    got = interval_join(
        rd.from_arrow(pts), rd.from_arrow(ivs), "ts", "ws", "we",
        bucket_us=W, num_partitions=2,
    ).to_pandas()
    assert len(got) == 0

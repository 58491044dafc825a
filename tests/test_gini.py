"""Load-skew Gini: hand-computed values, uniform→0, extreme-skew→(n−1)/n,
histogram-vs-sorted-definition parity."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mix_blink_ray.pipelines.queries import events_user_load_gini


def _write(tmp_path, user_counts):
    rows = []
    for u, c in enumerate(user_counts):
        rows += [u] * c
    n = len(rows)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                np.full(n, np.datetime64("2024-01-01T00:00:00", "us")).astype("datetime64[us]")
            ),
            "user_id": pa.array(rows, pa.int64()),
            "event_type": pa.array(["x"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def _gini_sorted_def(counts):
    """Textbook definition on the sorted vector — the parity reference."""
    x = np.sort(np.asarray(counts, dtype=object))
    n = len(x)
    s = int(x.sum())
    s1 = int(sum((i + 1) * int(v) for i, v in enumerate(x)))
    return 1000 * (2 * s1 - (n + 1) * s) // (n * s)


def test_uniform_load_is_zero(ray_session, tmp_path):
    out = events_user_load_gini(_write(tmp_path, [4, 4, 4, 4, 4])).to_pandas()
    assert out["gini_permille"].tolist() == [0]
    assert out["n_users"].tolist() == [5] and out["total_events"].tolist() == [20]


def test_extreme_skew(ray_session, tmp_path):
    # one user holds everything except n-1 single events: G → large
    counts = [1, 1, 1, 1, 96]
    out = events_user_load_gini(_write(tmp_path, counts)).to_pandas()
    assert out["gini_permille"].tolist() == [_gini_sorted_def(counts)]
    assert int(out["gini_permille"].iloc[0]) > 700


def test_histogram_formula_matches_sorted_definition(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    counts = rng.integers(1, 30, 40).tolist()
    out = events_user_load_gini(_write(tmp_path, counts)).to_pandas()
    assert out["gini_permille"].tolist() == [_gini_sorted_def(counts)]


def test_testdata_value(ray_session):
    out = events_user_load_gini("/root/testdata/sf0.001").to_pandas()
    assert 0 <= int(out["gini_permille"].iloc[0]) < 1000
    assert int(out["total_events"].iloc[0]) == 1000

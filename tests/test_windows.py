"""Behavior tests for the bucketed ordered-run exchange
(``stages.windows.grouped_ordered_runs``): layout invariance (bucket count
and input block layout never change results), parity against a per-key
reference, and the segmented-searchsorted helper's guarantees."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.windows import (
    grouped_ordered_runs,
    run_index,
    segment_offset_ts,
)


def _make_events(n_rows=2000, n_users=150, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "user_id": pa.array(rng.integers(0, n_users, n_rows), pa.int64()),
            "event_id": pa.array(np.arange(n_rows), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 10_000_000, n_rows), pa.int64()),
        }
    )


def _make_lag_kernel():
    # returned as a NESTED function so cloudpickle ships it by value (a
    # module-level function would pickle by reference to the test module,
    # which Ray workers can't import)
    def lag_kernel(g: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = g.num_rows
        ids = np.asarray(g["event_id"], dtype=np.int64) if n else np.empty(0, np.int64)
        prev = np.empty(n, np.int64)
        if n:
            prev[0] = -1
            prev[1:] = ids[:-1]
            prev[starts] = -1
        return pa.table({"event_id": g["event_id"], "prev_event_id": pa.array(prev)})

    return lag_kernel


def _lag_reference(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas().sort_values(["user_id", "ts_us", "event_id"])
    df["prev_event_id"] = (
        df.groupby("user_id")["event_id"].shift(1).fillna(-1).astype(np.int64)
    )
    return df[["event_id", "prev_event_id"]].sort_values("event_id").reset_index(drop=True)


def _run(tbl: pa.Table, n_buckets, n_blocks) -> pd.DataFrame:
    ds = rd.from_arrow(tbl).repartition(n_blocks)
    out = grouped_ordered_runs(
        ds, "user_id", ("ts_us", "event_id"), _make_lag_kernel(), n_buckets=n_buckets
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def test_matches_per_key_reference():
    tbl = _make_events()
    ref = _lag_reference(tbl)
    got = _run(tbl, n_buckets=16, n_blocks=4)
    pd.testing.assert_frame_equal(got, ref)


@pytest.mark.parametrize("n_buckets", [1, 7, 64, 1024])
def test_bucket_count_invariance(n_buckets):
    tbl = _make_events(seed=11)
    base = _run(tbl, n_buckets=3, n_blocks=3)
    got = _run(tbl, n_buckets=n_buckets, n_blocks=3)
    pd.testing.assert_frame_equal(got, base)


@pytest.mark.parametrize("n_blocks", [1, 2, 9])
def test_block_layout_invariance(n_blocks):
    tbl = _make_events(seed=13)
    base = _run(tbl, n_buckets=8, n_blocks=5)
    got = _run(tbl, n_buckets=8, n_blocks=n_blocks)
    pd.testing.assert_frame_equal(got, base)


def test_string_keys_and_single_user():
    """String key columns hash-bucket too; a single-key dataset is one run."""
    tbl = pa.table(
        {
            "user_id": pa.array(["only"] * 6, pa.string()),
            "event_id": pa.array([5, 3, 1, 4, 2, 0], pa.int64()),
            "ts_us": pa.array([10, 8, 2, 9, 4, 0], pa.int64()),
        }
    )
    out = (
        grouped_ordered_runs(
            rd.from_arrow(tbl), "user_id", ("ts_us", "event_id"), _make_lag_kernel(), n_buckets=4
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # ts order is 0,2,4,8,9,10 → event order 0,1,2,3,4,5 → prev = id-1
    assert out["prev_event_id"].tolist() == [-1, 0, 1, 2, 3, 4]


def test_run_index_and_segment_offsets():
    starts = np.array([0, 3, 4], dtype=np.int64)
    ends = np.array([3, 4, 7], dtype=np.int64)
    assert run_index(starts, ends).tolist() == [0, 0, 0, 1, 2, 2, 2]
    ts = np.array([5, 7, 9, 1, 2, 2, 8], dtype=np.int64)  # sorted per run
    adj, rid = segment_offset_ts(ts, starts, ends, pad=3)
    assert rid.tolist() == [0, 0, 0, 1, 2, 2, 2]
    # globally sorted, and a window of width ≤ pad never crosses runs
    assert np.all(np.diff(adj) >= 0) or np.all(adj[:-1] <= adj[1:])
    assert np.all(np.sort(adj) == adj)
    lo = np.searchsorted(adj, adj - 3, side="left")
    base = np.repeat(starts, ends - starts)
    assert np.all(lo >= base)


def test_segment_offset_overflow_raises():
    starts = np.arange(4, dtype=np.int64)
    ends = starts + 1
    ts = np.array([0, 2**61, 0, 0], dtype=np.int64)
    # span ~2^61 × 4 runs exceeds int64 → loud failure, never silent wrap
    ts_sorted = np.array([0, 0, 0, 2**61], dtype=np.int64)
    with pytest.raises(ValueError, match="int64"):
        segment_offset_ts(ts_sorted, starts, ends, pad=0)


def test_context_window_boundaries_and_reference(tmp_path):
    """events_context_window: ctx never crosses a user boundary (each user's
    i-th event has exactly min(i+1, 3) '>'-joined parts) and matches a
    pandas per-key reference on a skewed multi-block layout."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import events_context_window

    rng = np.random.default_rng(11)
    n = 1500
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            # heavy skew: one hot user plus a long tail
            "user_id": pa.array(
                np.where(rng.random(n) < 0.4, 3, rng.integers(0, 80, n)), pa.int64()
            ),
            "ts": pa.array(
                rng.integers(0, 10_000_000, n), pa.timestamp("us")
            ),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase", "error"], n)
            ),
            "value": pa.array(rng.random(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        events_context_window(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["rank"] = df.groupby("user_id").cumcount()
    parts = out["ctx"].str.split(">")
    ranks = df.sort_values("event_id")["rank"].to_numpy()
    assert (parts.str.len().to_numpy() == np.minimum(ranks + 1, 3)).all()

    def ref_ctx(g):
        t = g["event_type"].tolist()
        return pd.Series(
            [">".join(t[max(0, i - 2) : i + 1]) for i in range(len(t))],
            index=g.index,
        )

    df["ctx"] = df.groupby("user_id", group_keys=False).apply(ref_ctx)
    ref = df.sort_values("event_id")["ctx"].reset_index(drop=True)
    assert out["ctx"].equals(ref)


def test_distinct_types_running_matches_reference(tmp_path):
    """events_distinct_types_running: inclusive per-key running distinct
    count matches a pandas expanding-nunique reference on a skewed layout;
    every run restarts at 1."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import events_distinct_types_running

    rng = np.random.default_rng(23)
    n = 1500
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(
                np.where(rng.random(n) < 0.4, 5, rng.integers(0, 70, n)), pa.int64()
            ),
            "ts": pa.array(rng.integers(0, 10_000_000, n), pa.timestamp("us")),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase", "error", "signup"], n)
            ),
            "value": pa.array(rng.random(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        events_distinct_types_running(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    ref = (
        df.groupby("user_id")["event_type"]
        .transform(lambda s: (~s.duplicated()).cumsum())
        .astype(np.int64)
    )
    df["distinct_types"] = ref
    expect = df.sort_values("event_id")["distinct_types"].reset_index(drop=True)
    assert (out["distinct_types"].to_numpy() == expect.to_numpy()).all()
    firsts = df.groupby("user_id").head(1)["distinct_types"]
    assert (firsts == 1).all()


def test_dau_wau_interval_merge_boundaries(tmp_path):
    """Gap of exactly 6 days fuses one WAU coverage interval; 7 splits it.
    Brute-force reference over a constructed + fuzzed (user, day) set."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import events_dau_wau_stickiness

    day_us = 86_400_000_000
    rng = np.random.default_rng(11)
    # constructed edges: u1 gap 6 (fuse) then gap 14 (split); u2 gap 7
    # (split); u3 singleton; duplicates within (user, day) must dedup.
    pairs = [(1, 0), (1, 6), (1, 20), (2, 0), (2, 7), (3, 3), (3, 3)]
    # fuzz: 40 users × random day subsets of 0..29
    for u in range(10, 50):
        for d in np.unique(rng.integers(0, 30, rng.integers(1, 9))):
            pairs.append((u, int(d)))
    users = np.array([p[0] for p in pairs], np.int64)
    days = np.array([p[1] for p in pairs], np.int64)
    n = len(pairs)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(days * day_us + rng.integers(0, day_us, n), pa.timestamp("us")),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(rng.random(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = events_dau_wau_stickiness(str(tmp_path)).to_pandas().set_index("day_idx")

    uniq = sorted(set(pairs))
    active_days = sorted({d for _, d in uniq})
    for d in active_days:
        dau = sum(1 for (_, dd) in uniq if dd == d)
        wau_users = {u for (u, dd) in uniq if d - 6 <= dd <= d}
        row = out.loc[d]
        assert row["dau"] == dau, d
        assert row["wau"] == len(wau_users), d
        assert row["stickiness_pm"] == dau * 1000 // len(wau_users), d
    assert set(out.index) == set(active_days)


def test_weekly_churn_gap_boundaries(tmp_path):
    """A 1-week gap churns the user then re-counts them as NEW; consecutive
    weeks retain; duplicates within (user, week) dedup.  Brute-force LAG/LEAD
    reference over a constructed + fuzzed (user, week) set."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import events_weekly_churn

    week_us = 604_800_000_000
    rng = np.random.default_rng(23)
    # constructed edges: u1 consecutive (retained) then gap 2 (churn + new
    # again); u2 singleton; u3 duplicate rows in one week must dedup.
    pairs = [(1, 0), (1, 1), (1, 3), (2, 2), (3, 1), (3, 1)]
    for u in range(10, 40):
        for w in np.unique(rng.integers(0, 8, rng.integers(1, 6))):
            pairs.append((u, int(w)))
    users = np.array([p[0] for p in pairs], np.int64)
    weeks = np.array([p[1] for p in pairs], np.int64)
    n = len(pairs)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(weeks * week_us + rng.integers(0, week_us, n), pa.timestamp("us")),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(rng.random(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = events_weekly_churn(str(tmp_path)).to_pandas().set_index("week_idx")

    uniq = sorted(set(pairs))
    uniq_set = set(uniq)
    active_weeks = sorted({w for _, w in uniq})
    for w in active_weeks:
        active = sum(1 for (_, ww) in uniq if ww == w)
        new = sum(1 for (u, ww) in uniq if ww == w and (u, w - 1) not in uniq_set)
        ret = sum(1 for (u, ww) in uniq if ww == w and (u, w + 1) in uniq_set)
        row = out.loc[w]
        assert row["active"] == active, w
        assert row["new_users"] == new, w
        assert row["retained_next"] == ret, w
        assert row["churned_next"] == active - ret, w
        assert row["churn_pm"] == (active - ret) * 1000 // active, w
    assert set(out.index) == set(active_weeks)


def test_user_twap_hand_computed(tmp_path):
    """events_user_twap: LOCF integration matches hand arithmetic; single-event
    and zero-span users excluded; negative values raise (DuckDB `//`
    truncation vs numpy floor divergence guard)."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from mix_blink_ray.pipelines.queries import events_user_twap

    def write(rows):
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], np.int64), pa.timestamp("us")
                ),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        return str(tmp_path)

    s = 1_000_000  # one second in µs
    rows = [
        # user 1: value 1.00 for 10s, 4.00 for 20s → (100·10 + 400·20)/30 = 300
        (1, 0 * s, 1.00),
        (1, 10 * s, 4.00),
        (1, 30 * s, 9.99),
        (2, 5 * s, 7.00),          # single event: excluded
        (3, 8 * s, 2.00),          # zero span: excluded
        (3, 8 * s, 3.00),
    ]
    out = events_user_twap(write(rows)).to_pandas().set_index("user_id")
    assert set(out.index) == {1}
    assert out.loc[1, "twap_cents"] == 300
    assert out.loc[1, "dur_us"] == 30 * s
    assert out.loc[1, "n_events"] == 3

    with _pytest.raises(Exception, match="negative"):
        events_user_twap(write([(1, 0, -1.0), (1, s, 2.0)])).to_pandas()

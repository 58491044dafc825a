"""Hand-computed chi-square check for events_type_hour_chi2: a constructed
2x2 contingency with every expected count = 2 gives chi2 = 2.0 exactly
(per-cell (nO-RC)^2*1000 // (nRC) = 500, four cells), and zero cells on the
full grid must contribute E = R*C/n (checked via a 2x2 with one empty cell)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from mix_blink_ray.pipelines.queries import events_type_hour_chi2


def _events(tmp_path, rows):
    """rows: list of (event_type, hour)."""
    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(hours=h) for _, h in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([0] * len(rows), pa.int64()),
            "event_type": pa.array([t for t, _ in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_hand_computed_2x2(tmp_path):
    rows = [("A", 0)] * 3 + [("A", 1)] * 1 + [("B", 0)] * 1 + [("B", 1)] * 3
    out = events_type_hour_chi2(_events(tmp_path, rows)).to_pandas().iloc[0]
    assert int(out["n_events"]) == 8
    assert int(out["n_types"]) == 2 and int(out["n_hours"]) == 2
    assert int(out["df"]) == 1
    # n=8, R=C=4, nRC=128; each cell d=|8*O-16|=8 -> 64*1000//128=500; x4.
    assert int(out["chi2_milli"]) == 2000


def test_zero_cell_contributes_expected(tmp_path):
    # A: 2@h0; B: 1@h0 + 1@h1 -> grid cell (A, h1) is EMPTY but must add
    # (0-E)^2/E = E = R*C/n = 2*1/4 = 0.5.
    rows = [("A", 0)] * 2 + [("B", 0), ("B", 1)]
    out = events_type_hour_chi2(_events(tmp_path, rows)).to_pandas().iloc[0]
    n = 4
    obs = {("A", 0): 2, ("A", 1): 0, ("B", 0): 1, ("B", 1): 1}
    r = {"A": 2, "B": 2}
    c = {0: 3, 1: 1}
    expect = sum(
        (1000 * (n * obs[(t, h)] - r[t] * c[h]) ** 2) // (n * r[t] * c[h])
        for t in r
        for h in c
    )
    assert int(out["chi2_milli"]) == expect
    assert expect > 0  # the zero cell's E-share is included


def test_active_coverage_hand_computed(tmp_path):
    """events_user_active_coverage: user 1 windows [0,300s),[100s,400s),
    [400s,700s) -> union 700s and TWO islands (gap == W is a break: the
    windows are disjoint even though the measure is contiguous); user 2
    single event -> W, one island."""
    import datetime as dt

    from mix_blink_ray.pipelines.queries import events_user_active_coverage

    base = dt.datetime(2024, 1, 1)
    rows = [(1, 0), (1, 100), (1, 400), (2, 50)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(seconds=s) for _, s in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        events_user_active_coverage(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "covered_us"] == 700 * 1_000_000
    assert out.loc[1, "n_events"] == 3 and out.loc[1, "n_islands"] == 2
    assert out.loc[2, "covered_us"] == 300 * 1_000_000
    assert out.loc[2, "n_events"] == 1 and out.loc[2, "n_islands"] == 1


def _cks_events(tmp_path, rows, name="events.parquet"):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([base + dt.timedelta(seconds=r[1]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, tmp_path / name)
    return str(tmp_path)


def test_checksum_order_invariant_and_sensitive(tmp_path):
    """events_table_checksum: permuting rows leaves the checksum identical
    (mod-2^64 addition is commutative); flipping one value changes it."""
    from mix_blink_ray.pipelines.queries import events_table_checksum

    rows = [(i, i * 10, i % 3, "click", float(i)) for i in range(50)]
    a = events_table_checksum(_cks_events(tmp_path / "a", rows)).to_pandas()
    b = events_table_checksum(_cks_events(tmp_path / "b", rows[::-1])).to_pandas()
    assert a.equals(b)
    mutated = rows.copy()
    mutated[7] = (7, 70, 1, "click", 99.25)
    c = events_table_checksum(_cks_events(tmp_path / "c", mutated)).to_pandas()
    assert int(c["checksum"][0]) != int(a["checksum"][0])
    assert int(c["n_rows"][0]) == int(a["n_rows"][0])  # counts alone can't see it


def test_checksum_partition_invariant(tmp_path):
    """Checksums of two disjoint halves combine (mod-2^64 per type) to the
    whole table's checksum — the property that lets a copy verify shard by
    shard without ever co-locating the data."""
    from mix_blink_ray.pipelines.queries import events_table_checksum

    rows = [(i, i * 7, i % 5, "view" if i % 2 else "click", float(i) / 4) for i in range(60)]
    single = events_table_checksum(_cks_events(tmp_path / "s", rows)).to_pandas()
    first = events_table_checksum(_cks_events(tmp_path / "p1", rows[:17])).to_pandas()
    second = events_table_checksum(_cks_events(tmp_path / "p2", rows[17:])).to_pandas()
    merged = {}
    for df in (first, second):
        for _, r in df.iterrows():
            cur = merged.setdefault(r["event_type"], [0, 0])
            cur[0] = (cur[0] + (int(r["checksum"]) & 0xFFFFFFFFFFFFFFFF)) & 0xFFFFFFFFFFFFFFFF
            cur[1] += int(r["n_rows"])
    for _, r in single.iterrows():
        m = merged[r["event_type"]]
        assert m[1] == int(r["n_rows"])
        assert m[0] == int(r["checksum"]) & 0xFFFFFFFFFFFFFFFF


def test_benford_hand_computed(tmp_path):
    """events_benford_digits: values 1.00, 0.19, 2.50, 95.00, 0.002, -3.00
    -> cents 100, 19, 250, 9500, 0 (excluded), -300 (abs -> 3) -> first
    digits {1: 2, 2: 1, 3: 1, 9: 1}."""
    from mix_blink_ray.pipelines.queries import events_benford_digits

    rows = [(i, i, 0, "click", v) for i, v in enumerate([1.00, 0.19, 2.50, 95.00, 0.002, -3.00])]
    out = (
        events_benford_digits(_cks_events(tmp_path, rows))
        .to_pandas()
        .set_index("digit")
        .sort_index()
    )
    assert out["n"].to_dict() == {1: 2, 2: 1, 3: 1, 9: 1}
    assert out["share_permille"].to_dict() == {1: 400, 2: 200, 3: 200, 9: 200}

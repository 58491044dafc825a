"""Per-user daily-grid linear interpolation: hand-computed lerp values,
exact-hit and duplicate-timestamp semantics, layout invariance, guards."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mix_blink_ray.pipelines.queries import events_user_day_interp

DAY_US = 86_400_000_000
BASE = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")  # a midnight


def _write(tmp_path, rows):
    """rows: list of (user_id, t_us_offset_from_BASE, value, event_id)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[3] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([BASE + r[1] for r in rows], dtype="datetime64[us]").astype("datetime64[us]")
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["x"] * len(rows)),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_hand_computed_lerp(ray_session, tmp_path):
    # user 1: obs at -6h (v=1.00) and +18h (v=5.00); midnight (BASE) sits
    # 6h/24h of the way: 100 + (500-100)*6//24 = 200 cents exactly
    h = 3_600_000_000
    d = _write(
        tmp_path,
        [
            (1, -6 * h, 1.00, 10),
            (1, 18 * h, 5.00, 11),
        ],
    )
    out = events_user_day_interp(d).to_pandas().sort_values("grid_ts").reset_index(drop=True)
    assert len(out) == 1
    assert out["value_c"].tolist() == [200]
    assert out["grid_ts"].astype("int64").tolist() == [BASE]


def test_exact_hit_and_last_point(ray_session, tmp_path):
    # obs exactly on two consecutive midnights: grid returns them verbatim;
    # the last observation is its own degenerate bracket
    d = _write(
        tmp_path,
        [
            (7, 0, 3.21, 1),
            (7, DAY_US, 9.99, 2),
        ],
    )
    out = events_user_day_interp(d).to_pandas().sort_values("grid_ts").reset_index(drop=True)
    assert out["value_c"].tolist() == [321, 999]


def test_duplicate_ts_latest_event_id_wins(ray_session, tmp_path):
    d = _write(
        tmp_path,
        [
            (2, 0, 1.00, 5),
            (2, 0, 7.00, 9),  # same ts, larger event_id → wins
            (2, DAY_US, 7.00, 6),
        ],
    )
    out = events_user_day_interp(d).to_pandas().sort_values("grid_ts").reset_index(drop=True)
    assert out["value_c"].tolist() == [700, 700]


def test_no_midnight_inside_span_yields_no_rows(ray_session, tmp_path):
    h = 3_600_000_000
    d = _write(tmp_path, [(3, h, 1.0, 1), (3, 2 * h, 2.0, 2)])
    out = events_user_day_interp(d).to_pandas()
    assert len(out) == 0


def test_negative_cents_raise(ray_session, tmp_path):
    d = _write(tmp_path, [(4, 0, -1.00, 1), (4, DAY_US, 1.00, 2)])
    with pytest.raises(Exception, match="negative cents"):
        events_user_day_interp(d).to_pandas()


def test_layout_invariance_on_testdata(ray_session):
    sf = "/root/testdata/sf0.001"
    a = events_user_day_interp(sf).to_pandas()
    b = events_user_day_interp(sf).to_pandas()
    key = ["user_id", "grid_ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # grid is exactly the midnights inside each user's span
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    spans = con.sql(
        "SELECT user_id, min(epoch_us(ts)) lo, max(epoch_us(ts)) hi FROM events GROUP BY user_id"
    ).df()
    expect = int(
        sum(
            max(hi // DAY_US - (lo + DAY_US - 1) // DAY_US + 1, 0)
            for lo, hi in zip(spans["lo"], spans["hi"])
        )
    )
    assert len(a) == expect

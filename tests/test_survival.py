"""Kaplan–Meier survival curve: hand-computed product, invariants."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mix_blink_ray.pipelines.queries import events_survival_curve

DAY_US = 86_400_000_000
BASE = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")


def _write(tmp_path, user_last_days):
    rows = [(u, d) for u, d in enumerate(user_last_days)]
    # two events per user: day 0 and their last day (so max() does real work)
    uid, ts = [], []
    for u, d in rows:
        uid += [u, u]
        ts += [BASE, BASE + d * DAY_US]
    n = len(uid)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["x"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_hand_computed_km(ray_session, tmp_path):
    # last days: 0,0,1,2,2,2 → day0: n=6,d=2 → S=1e6*4//6=666666
    # day1: n=4,d=1 → S=666666*3//4=499999 ; day2: n=3,d=3 → S=0
    out = events_survival_curve(_write(tmp_path, [0, 0, 1, 2, 2, 2])).to_pandas()
    base_day = BASE // DAY_US
    assert out["day"].tolist() == [base_day, base_day + 1, base_day + 2]
    assert out["at_risk"].tolist() == [6, 4, 3]
    assert out["churned"].tolist() == [2, 1, 3]
    assert out["survival_ppm"].tolist() == [666666, 499999, 0]


def test_invariants_on_testdata(ray_session):
    out = events_survival_curve("/root/testdata/sf0.001").to_pandas()
    s = out.sort_values("day")["survival_ppm"].to_numpy()
    assert (np.diff(s) <= 0).all()  # survival never increases
    assert s[-1] == 0  # every observed user churns within the data window
    # at_risk is the suffix sum of churned
    o = out.sort_values("day")
    assert (o["at_risk"].to_numpy() == o["churned"][::-1].cumsum()[::-1].to_numpy()).all()

"""Snapshot diff: constructed-status coverage (each of the four statuses hit
by a chosen key) and the primary-key guard."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ids, types=None, values=None):
    n = len(ids)
    ts0 = datetime.datetime(2026, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([ts0] * n, pa.timestamp("us")),
            "user_id": pa.array(list(range(n)), pa.int64()),
            "event_type": pa.array(types or ["t"] * n, pa.string()),
            "value": pa.array(values or [1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_snapshot_diff_all_four_statuses(tmp_path, ray_session):
    """id 97 → old-dropped (added), id 89 → new-dropped (removed), ids 11
    and 22 → value mutated (changed), id 1 → identical (unchanged)."""
    from mix_blink_ray.pipelines.queries import events_snapshot_diff

    out = (
        events_snapshot_diff(_write_events(tmp_path, [97, 89, 11, 22, 1]))
        .to_pandas()
        .sort_values("status")
        .reset_index(drop=True)
    )
    got = {r.status: r.n for r in out.itertuples()}
    assert got == {"added": 1, "removed": 1, "changed": 2, "unchanged": 1}
    assert set(out["event_type"]) == {"t"}


def test_snapshot_diff_duplicate_key_raises(tmp_path, ray_session):
    from mix_blink_ray.pipelines.queries import events_snapshot_diff

    with pytest.raises(Exception, match="key repeats"):
        events_snapshot_diff(_write_events(tmp_path, [5, 5])).to_pandas()

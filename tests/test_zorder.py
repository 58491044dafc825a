"""Z-order cells: the locality property the layout key exists for — every
8×8 z-cell has bounded extent in BOTH dimensions (≤ 8 user buckets AND ≤ 8
hours), which no single-column sort provides."""

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_cells_bounded_in_both_dims(ray_session):
    out = q.events_zorder_cells(SF_DIR).to_pandas()
    assert len(out) > 1
    u_extent = out["u_max"] - out["u_min"]
    h_extent = out["h_max"] - out["h_min"]
    # z >> 6 drops 3 bits per dim: each cell spans < 8 in u AND < 8 in h
    assert (u_extent < 8).all()
    assert (h_extent < 8).all()
    assert int(out["n"].sum()) == q._t(SF_DIR, "events", ["event_id"]).count()

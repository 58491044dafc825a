"""Market-basket co-purchase lift: the vectorized triangular pair expansion
(`all_pairs_within_runs`), hand-computed lift/tie-break/dedup semantics on a
constructed basket table, and the loud guards (basket cap, packing domain)."""

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mix_blink_ray.stages.windows import all_pairs_within_runs


def test_all_pairs_within_runs_fuzz():
    rng = np.random.default_rng(3)
    for _ in range(300):
        lens = rng.integers(1, 7, size=int(rng.integers(0, 9)))
        ends = np.cumsum(lens).astype(np.int64)
        starts = (ends - lens).astype(np.int64)
        left, right = all_pairs_within_runs(starts, ends)
        want = []
        for s, e in zip(starts, ends):
            want += list(itertools.combinations(range(s, e), 2))
        assert list(zip(left.tolist(), right.tolist())) == want


def _write_baskets(tmp_path, rows):
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    return str(tmp_path)


_BASKETS = [
    (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2),
    (3, 2), (3, 3), (3, 3),  # duplicate (order, part) must count ONCE
    (4, 1), (4, 2),
    (5, 4),                  # singleton basket: contributes to N only
]


def test_co_purchase_lift_hand_computed(tmp_path, ray_session):
    """N=5 baskets; pairs ≥ support 2: (1,2) n=3 and (2,3) n=2, both lift
    1250 permille exactly — the tie breaks by (part_a, part_b)."""
    from mix_blink_ray.pipelines.queries import parts_co_purchase_lift

    out = parts_co_purchase_lift(_write_baskets(tmp_path, _BASKETS)).to_pandas()
    assert out.values.tolist() == [[1, 2, 3, 1250], [2, 3, 2, 1250]]


def test_co_purchase_basket_cap_raises(tmp_path, ray_session):
    from mix_blink_ray.pipelines.queries import parts_co_purchase_lift

    with pytest.raises(Exception, match="basket over"):
        parts_co_purchase_lift(
            _write_baskets(tmp_path, _BASKETS), max_basket=2
        ).to_pandas()


def test_co_purchase_packing_domain_raises(tmp_path, ray_session):
    from mix_blink_ray.pipelines.queries import parts_co_purchase_lift

    rows = [(1, 1), (1, 1 << 31)]
    with pytest.raises(Exception, match="partkey outside"):
        parts_co_purchase_lift(_write_baskets(tmp_path, rows)).to_pandas()


def test_co_purchase_broadcast_join_duality(tmp_path, ray_session):
    """Forced-fallback parity: the partitioned-join path (broadcast_limit=0)
    returns exactly what the broadcast-lut path returns."""
    from mix_blink_ray.pipelines.queries import parts_co_purchase_lift

    d = _write_baskets(tmp_path, _BASKETS)
    fast = parts_co_purchase_lift(d).to_pandas()
    slow = parts_co_purchase_lift(d, broadcast_limit=0).to_pandas()
    assert fast.values.tolist() == slow.values.tolist()

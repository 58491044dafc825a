"""Weisfeiler–Lehman fingerprint: sequential single-process reference parity,
refinement monotonicity, determinism, domain guard."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mix_blink_ray.pipelines.queries import WL_OUT_DEG, WL_ROUNDS, customers_wl_fingerprint
from mix_blink_ray.stages.sketches import splitmix64

SF_DIR = "/root/testdata/sf0.001"


def _reference_colors(n: int, rounds: int) -> np.ndarray:
    """Dense sequential WL replay: init = indeg, multiset = wrapping uint64
    sum of neighbor hashes, col' = sm(sm(col) ^ S)."""
    v = np.arange(n, dtype=np.uint64)
    dsts = [splitmix64(v * np.uint64(8) + np.uint64(k)) % np.uint64(n) for k in range(WL_OUT_DEG)]
    indeg = np.zeros(n, dtype=np.int64)
    for d in dsts:
        np.add.at(indeg, d.astype(np.int64), 1)
    col = indeg.astype(np.uint64)
    for _ in range(rounds):
        h = splitmix64(col)
        s = np.zeros(n, dtype=np.uint64)
        for d in dsts:
            np.add.at(s, d.astype(np.int64), h)  # uint64 add wraps mod 2^64
        col = splitmix64(splitmix64(col) ^ s)
    return col.view(np.int64)


def test_matches_sequential_reference(ray_session):
    got = (
        customers_wl_fingerprint(SF_DIR)
        .to_pandas()
        .sort_values("wl_color")
        .reset_index(drop=True)
    )
    n = int(got["n_nodes"].sum())
    ref = _reference_colors(n, WL_ROUNDS)
    u, cnt = np.unique(ref, return_counts=True)
    assert got["wl_color"].tolist() == u.tolist()
    assert got["n_nodes"].tolist() == cnt.tolist()


def test_refinement_never_merges_classes(ray_session):
    # WL refinement is a partition refinement: class count is monotone
    # nondecreasing across rounds (hash collisions aside, 2^-64 likely)
    n = 150
    counts = [len(np.unique(_reference_colors(n, r))) for r in range(WL_ROUNDS + 1)]
    assert counts == sorted(counts)
    # and round 0 classes == distinct in-degrees
    assert counts[0] == len(np.unique(_reference_colors(n, 0)))


def test_determinism(ray_session):
    a = customers_wl_fingerprint(SF_DIR).to_pandas().sort_values("wl_color").reset_index(drop=True)
    b = customers_wl_fingerprint(SF_DIR).to_pandas().sort_values("wl_color").reset_index(drop=True)
    assert a.equals(b)


def test_non_contiguous_domain_raises(ray_session, tmp_path):
    pq.write_table(
        pa.table({"c_custkey": pa.array([0, 2, 3], pa.int64()), "c_name": pa.array(["a", "b", "c"])}),
        tmp_path / "customer.parquet",
    )
    with pytest.raises(Exception, match="contiguous"):
        customers_wl_fingerprint(str(tmp_path))

"""Behavior tests for customers_pagerank: the distributed fixed-point must
equal an independent single-process integer reference (same splitmix64
functional graph, same floor arithmetic), every rank must carry at least the
teleport base, and a non-contiguous key domain must fail loudly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mix_blink_ray.pipelines.queries import (
    PAGERANK_BASE,
    PAGERANK_ITERS,
    PAGERANK_OUT_DEG,
    PAGERANK_SCALE,
    customers_pagerank,
)
from mix_blink_ray.stages.sketches import splitmix64


def _reference(n: int) -> dict[int, int]:
    """Sequential integer PageRank with identical arithmetic."""
    r = {v: PAGERANK_SCALE for v in range(n)}
    # int() BEFORE the modulo: numpy uint64 % python-int promotes to float64
    # and silently corrupts the residue.
    outs = {
        v: [
            int(splitmix64(np.array([8 * v + k], dtype=np.uint64))[0]) % n
            for k in range(PAGERANK_OUT_DEG)
        ]
        for v in range(n)
    }
    for _ in range(PAGERANK_ITERS):
        sums = {v: 0 for v in range(n)}
        for v in range(n):
            c = r[v] // PAGERANK_OUT_DEG
            for d in outs[v]:
                sums[d] += c
        r = {v: PAGERANK_BASE + (85 * sums[v]) // 100 for v in range(n)}
    return r


def test_matches_sequential_reference():
    out = customers_pagerank("/root/testdata/sf0.001").to_pandas()
    ref = _reference(len(out))
    got = dict(zip(out["c_custkey"].astype(int), out["rank_scaled"].astype(int)))
    assert got == ref
    assert min(got.values()) >= PAGERANK_BASE  # teleport floor for sinks


def test_non_contiguous_domain_raises(tmp_path):
    pq.write_table(
        pa.table({"c_custkey": pa.array([0, 2, 5], pa.int64())}),
        tmp_path / "customer.parquet",
    )
    with pytest.raises(ValueError, match="contiguous"):
        customers_pagerank(str(tmp_path))

"""Distributed prefix scan: bit-identical to a sequential scan at any layout."""

import numpy as np
import pyarrow as pa
import ray

from mix_blink_ray.stages.scan import prefix_scan


def _run(tbl: pa.Table, n_blocks: int):
    ds = ray.data.from_arrow(tbl).repartition(n_blocks)
    out = prefix_scan(ds, ["k"], "v", out_col="run", row_col="rn").to_pandas()
    return out.sort_values("rn").reset_index(drop=True)


def test_prefix_scan_matches_sequential():
    rng = np.random.default_rng(2)
    n = 5_000
    keys = rng.permutation(n).astype(np.int64)
    vals = rng.integers(-1000, 1000, size=n, dtype=np.int64)
    tbl = pa.table({"k": keys, "v": vals})
    order = np.argsort(keys, kind="stable")
    expect_run = np.cumsum(vals[order])
    for blocks in (1, 4, 13):
        out = _run(tbl, blocks)
        assert (out["run"].to_numpy() == expect_run).all()
        assert (out["rn"].to_numpy() == np.arange(1, n + 1)).all()
        assert (out["k"].to_numpy() == keys[order]).all()


def test_prefix_scan_layout_invariant():
    rng = np.random.default_rng(4)
    tbl = pa.table(
        {
            "k": rng.permutation(800).astype(np.int64),
            "v": rng.integers(0, 10, size=800, dtype=np.int64),
        }
    )
    a = _run(tbl, 2)
    b = _run(tbl, 9)
    assert a.equals(b)

"""Bloom semi-join: exact EXISTS semantics even under forced false positives."""

import numpy as np
import pyarrow as pa
import ray

from mix_blink_ray.stages.bloom import _bit_positions, bloom_semi_join, build_bloom


def _ds(tbl: pa.Table, n_blocks: int = 3):
    return ray.data.from_arrow(tbl).repartition(n_blocks)


def test_build_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**40), 2**40, size=2000, dtype=np.int64)
    m_bits, k = 1 << 16, 3
    words = build_bloom(_ds(pa.table({"k": keys})), "k", m_bits=m_bits, k=k)
    pos = _bit_positions(keys, m_bits, k)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k):
        p = pos[i]
        hit &= (words[(p >> np.uint64(6)).astype(np.int64)] >> (p & np.uint64(63))) & np.uint64(1) != 0
    assert hit.all()


def test_bloom_semi_join_exact_despite_false_positives():
    # m_bits=64 with 40 build keys saturates the filter — nearly every probe
    # row passes the prefilter; the verify join must still return exactly the
    # EXISTS set.
    rng = np.random.default_rng(11)
    build_keys = np.unique(rng.integers(0, 10_000, size=40, dtype=np.int64))
    probe_keys = rng.integers(0, 10_000, size=500, dtype=np.int64)
    probe = pa.table({"k": probe_keys, "v": np.arange(500, dtype=np.int64)})
    out = bloom_semi_join(
        _ds(probe), _ds(pa.table({"bk": build_keys}), 2), "k", "bk", m_bits=64, k=2
    ).to_pandas()
    expect = probe.to_pandas()[np.isin(probe_keys, build_keys)]
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    exp = expect.sort_values(["k", "v"]).reset_index(drop=True)
    assert got.equals(exp)
    assert sorted(out.columns) == ["k", "v"]


def test_bloom_semi_join_prunes_and_counts():
    from mix_blink_ray.state.counters import read_counters, reset_counters

    reset_counters()
    build_keys = np.arange(100, dtype=np.int64)
    probe_keys = np.arange(5000, dtype=np.int64)  # 98% misses
    probe = pa.table({"k": probe_keys})
    out = bloom_semi_join(
        _ds(probe), _ds(pa.table({"bk": build_keys}), 2), "k", "bk", m_bits=1 << 20, k=3
    ).to_pandas()
    assert sorted(out["k"]) == list(range(100))
    snap = read_counters()
    # with m=1M bits for 100 keys the FP rate is ~0 — pruning is ~4900 rows
    assert snap.get("bloom_pruned_rows", 0) >= 4800


def test_bloom_semi_join_empty_survivors():
    build_keys = np.array([1, 2, 3], dtype=np.int64)
    probe = pa.table({"k": np.arange(1000, 2000, dtype=np.int64)})
    out = bloom_semi_join(
        _ds(probe), _ds(pa.table({"bk": build_keys})), "k", "bk", m_bits=1 << 20
    )
    assert out.count() == 0

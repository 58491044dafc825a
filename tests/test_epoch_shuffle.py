"""Behavior tests for the deterministic epoch shuffle
(``stages.sampling.epoch_shuffle``): the position column is an exact
permutation, the order is a pure function of (key, seed) — invariant to
input block layout — and changing the seed actually reorders.  Oracle
parity (the splitmix64 HUGEINT replay + ROW_NUMBER) runs in the
parameterized DuckDB sweep in ``test_queries.py``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.stages.sampling import epoch_shuffle


def _ids_table(n=700, seed=3):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n * 13)[:n].astype(np.int64)  # sparse, shuffled ids
    return pa.table({"doc_id": pa.array(ids), "val": pa.array(ids * 2)})


def _mapping(out) -> dict[int, int]:
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    return dict(
        zip(
            np.asarray(t["doc_id"], dtype=np.int64).tolist(),
            np.asarray(t["epoch_pos"], dtype=np.int64).tolist(),
        )
    )


def test_positions_are_exact_permutation():
    tbl = _ids_table()
    out = epoch_shuffle(rd.from_arrow(tbl), "doc_id", seed=11)
    got = _mapping(out)
    assert len(got) == tbl.num_rows
    assert sorted(got.values()) == list(range(1, tbl.num_rows + 1))


def test_layout_invariance_and_determinism():
    tbl = _ids_table()
    a = _mapping(epoch_shuffle(rd.from_arrow(tbl).repartition(3), "doc_id", seed=11))
    b = _mapping(epoch_shuffle(rd.from_arrow(tbl).repartition(7), "doc_id", seed=11))
    assert a == b


def test_seed_changes_order_and_carries_payload():
    tbl = _ids_table(n=300)
    a = _mapping(epoch_shuffle(rd.from_arrow(tbl), "doc_id", seed=1))
    b = _mapping(epoch_shuffle(rd.from_arrow(tbl), "doc_id", seed=2))
    assert a != b  # 300 rows: identical permutations are impossible in practice
    # payload columns ride along untouched
    out = epoch_shuffle(rd.from_arrow(tbl), "doc_id", seed=1)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    v = np.asarray(t["val"], dtype=np.int64)
    d = np.asarray(t["doc_id"], dtype=np.int64)
    assert np.array_equal(v, d * 2)

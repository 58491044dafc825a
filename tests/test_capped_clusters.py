"""Behavior tests for docs_er_clusters_capped: every capped sub-cluster has
at most K=3 members, sub-labels are the min member of each doc_id-ordered
chunk, and a constructed 7-member cluster splits 3/3/1 exactly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mix_blink_ray.pipelines.queries import docs_er_clusters_capped


def test_constructed_split(tmp_path):
    # 7 copies of one text (ids 0..6, all within the ±5 pair window of a
    # neighbor -> one transitive cluster) + 1 unrelated doc (id 7).
    t = "alpha beta gamma delta epsilon"
    u = "zzz yyy xxx www vvv"
    texts = [t] * 7 + [u]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(8), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 8),
            "source": pa.array(["s"] * 8),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = docs_er_clusters_capped(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].tolist() == [0] * 7 + [7]
    # chunks of 3 by doc_id order, each labeled by its smallest member
    assert out["capped_id"].tolist() == [0, 0, 0, 3, 3, 3, 6, 7]


def test_cap_property_on_testdata():
    out = docs_er_clusters_capped("/root/testdata/sf0.001").to_pandas()
    sizes = out.groupby("capped_id").size()
    assert (sizes <= 3).all()
    # sub-label is always a member of its own sub-cluster and its minimum
    mins = out.groupby("capped_id")["doc_id"].min()
    assert (mins.index == mins.values).all()
    # lineage: capped id never crosses original cluster boundaries
    assert (out.groupby("capped_id")["cluster_id"].nunique() == 1).all()


def test_stratified_folds_balance():
    """Within every source stratum, fold sizes differ by at most 1 and the
    assignment is deterministic across reruns."""
    from mix_blink_ray.pipelines.queries import docs_stratified_folds

    out = docs_stratified_folds("/root/testdata/sf0.001").to_pandas()
    assert set(out["fold"].unique()) <= {0, 1, 2, 3, 4}
    sizes = out.groupby(["source", "fold"]).size().unstack(fill_value=0)
    assert ((sizes.max(axis=1) - sizes.min(axis=1)) <= 1).all()
    out2 = docs_stratified_folds("/root/testdata/sf0.001").to_pandas()
    key = ["doc_id"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True)
    )


def test_rrf_fusion_consistency():
    """docs_search_rrf: the fused score must equal the RRF formula applied
    to its own reported ranks (rank 0 = absent contributes nothing), ranks
    stay in [0, 10], and the output is the top-10 by (score desc, doc_id)."""
    from mix_blink_ray.pipelines.queries import docs_search_rrf

    out = docs_search_rrf("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 10
    for _, row in out.iterrows():
        exp = 0
        if row["rank_tfidf"] > 0:
            exp += 10**9 // (60 + int(row["rank_tfidf"]))
        if row["rank_bm25"] > 0:
            exp += 10**9 // (60 + int(row["rank_bm25"]))
        assert int(row["rrf_scaled"]) == exp
    assert out["rank_tfidf"].between(0, 10).all()
    assert out["rank_bm25"].between(0, 10).all()
    # sorted by fused score desc, doc_id asc
    key = list(zip(-out["rrf_scaled"], out["doc_id"]))
    assert key == sorted(key)


def test_blocking_skew_hand_computed(tmp_path):
    """docs_blocking_skew on a constructed corpus: 'a b c d' x2 and a
    disjoint 'p q r s' -> grams {'a b c': 2, 'b c d': 2, 'p q r': 1,
    'q r s': 1} -> histogram {1: (2 blocks, 0 pairs), 2: (2 blocks, 2
    pairs)}; a 2-token doc contributes no grams."""
    import pyarrow.parquet as pq2

    from mix_blink_ray.pipelines.queries import docs_blocking_skew

    texts = ["a b c d", "a b c d", "p q r s", "x y"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq2.write_table(tbl, tmp_path / "documents.parquet")
    out = docs_blocking_skew(str(tmp_path)).to_pandas().set_index("block_size").sort_index()
    assert out.loc[1, "n_blocks"] == 2 and out.loc[1, "pair_work"] == 0
    assert out.loc[2, "n_blocks"] == 2 and out.loc[2, "pair_work"] == 2
    assert len(out) == 2


def test_rendezvous_minimal_disruption():
    """The HRW theorem: growing 8 -> 9 shards, a doc either keeps its shard
    or moves to the NEW shard 8 — never between old shards; moved fraction
    is ~1/9 (loose bounds)."""
    from mix_blink_ray.pipelines.queries import docs_rendezvous_resharding

    out = docs_rendezvous_resharding("/root/testdata/sf0.001").to_pandas()
    moved = out[out["old_shard"] != out["new_shard"]]
    assert (moved["new_shard"] == 8).all()
    total = out["n_docs"].sum()
    frac = moved["n_docs"].sum() / total
    assert 0.02 < frac < 0.30  # E = 1/9 ≈ 0.111 at n=500
    assert set(out["old_shard"]) <= set(range(8))
    assert set(out["new_shard"]) <= set(range(9))


def test_weighted_sample_determinism_and_bias(tmp_path):
    """docs_weighted_sample: deterministic across reruns; a 100x-weight doc
    set dominates the bottom-k over 1-weight... (weights >= 2 enforced) —
    heavy docs (w=500) must out-sample light docs (w=2) in expectation, and
    w < 2 raises."""
    import pyarrow.parquet as pq2
    import pytest as _pt

    from mix_blink_ray.pipelines.queries import docs_weighted_sample

    n = 200
    weights = [500 if i < 100 else 2 for i in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x y z"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(weights, pa.int64()),
        }
    )
    pq2.write_table(tbl, tmp_path / "documents.parquet")
    a = docs_weighted_sample(str(tmp_path)).to_pandas()
    b = docs_weighted_sample(str(tmp_path)).to_pandas()
    assert a.equals(b)
    assert len(a) == 20
    # 250x weight ratio: heavy docs should take the overwhelming majority
    heavy = (a["weight"] == 500).sum()
    assert heavy >= 15
    # guard: weight < 2 raises
    bad = tbl.set_column(4, "n_chars", pa.array([1] * n, pa.int64()))
    pq2.write_table(bad, tmp_path / "documents.parquet")
    with _pt.raises(Exception, match="weight < 2"):
        docs_weighted_sample(str(tmp_path))

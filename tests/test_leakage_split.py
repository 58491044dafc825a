"""Leakage-safe split: the property the query exists for — no verified
near-dup pair may straddle train/val/test — checked directly (not via the
aggregate the oracle compares)."""

import numpy as np

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def _lehmer_split(lab: np.ndarray) -> np.ndarray:
    r = (lab % 2147483647) * 48271 % 2147483647 % 10
    return np.where(r < 8, "train", np.where(r == 8, "val", "test"))


def test_no_verified_pair_crosses_splits(ray_session):
    from mix_blink_ray.stages.dedup import ngram_jaccard_verify

    ds = q._t(SF_DIR, "documents", ["doc_id", "text"])
    verified = ngram_jaccard_verify(q._window_pair_table(ds, 5), ds, threshold=0.5)
    pairs = verified.to_pandas()
    assert len(pairs) > 0, "testdata must yield verified near-dup pairs"

    lab = q._verified_cluster_labels(ds, verified).to_pandas()
    doc = lab["doc_id"].to_numpy()
    cluster = lab["cluster_id"].to_numpy()
    split_of = dict(zip(doc, _lehmer_split(cluster)))

    for a, b in pairs[["a_id", "b_id"]].itertuples(index=False):
        assert split_of[a] == split_of[b], f"pair ({a},{b}) straddles splits"


def test_split_totals_cover_corpus(ray_session):
    out = q.docs_split_leakage_safe(SF_DIR).to_pandas()
    n_docs_total = int(out["n_docs"].sum())
    ds = q._t(SF_DIR, "documents", ["doc_id"])
    assert n_docs_total == ds.count()
    # clusters partition docs: every cluster sits in exactly one split
    assert int(out["n_clusters"].sum()) <= n_docs_total
    assert set(out["split"]) <= {"train", "val", "test"}

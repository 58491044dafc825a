"""LSH recall audit: self-consistency with the two underlying rankings and
output invariants."""

import numpy as np

from mix_blink_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_recall_recomputed_from_underlying_queries(ray_session):
    out = q.emb_knn_lsh_recall(SF_DIR).to_pandas().set_index("query_id").sort_index()
    bf = q.emb_knn_top5(SF_DIR).to_pandas()
    lsh = q.emb_knn_lsh_top5(SF_DIR).to_pandas()
    lset = set(map(tuple, np.asarray(lsh[["query_id", "vec_id"]], dtype=np.int64)))
    for qid, grp in bf.groupby("query_id"):
        hits = sum((int(qid), int(v)) in lset for v in grp["vec_id"])
        assert out.loc[int(qid), "n_hits"] == hits
        assert out.loc[int(qid), "recall_permille"] == 1000 * hits // 5


def test_invariants(ray_session):
    out = q.emb_knn_lsh_recall(SF_DIR).to_pandas()
    assert len(out) == 5  # one row per query point
    assert out["n_hits"].between(0, 5).all()
    assert (out["recall_permille"] == 1000 * out["n_hits"] // 5).all()

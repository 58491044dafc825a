"""DBSCAN-style density clustering: constructed core/noise scenario,
output invariants on testdata (min-label convention, role partition,
noise = -1, border labels point at real core clusters)."""

import pyarrow as pa
import pyarrow.parquet as pq

from mix_blink_ray.pipelines.queries import DBSCAN_MIN_PTS, docs_dbscan_clusters

SF_DIR = "/root/testdata/sf0.001"


def test_constructed_core_cluster_and_noise(ray_session, tmp_path):
    # 5 identical docs: complete graph, degree 4 = MIN_PTS-1 → all core, one
    # cluster labeled by the smallest member; 2 unrelated docs → noise
    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [base] * 5 + ["totally different words here entirely", "another unrelated document text"]
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13, 14, 20, 21], pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 7),
            "source": pa.array(["s"] * 7),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = docs_dbscan_clusters(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert (out.loc[[10, 11, 12, 13, 14], "role"] == "core").all()
    assert (out.loc[[10, 11, 12, 13, 14], "cluster_id"] == 10).all()  # min member
    assert (out.loc[[20, 21], "role"] == "noise").all()
    assert (out.loc[[20, 21], "cluster_id"] == -1).all()
    assert DBSCAN_MIN_PTS == 5  # the scenario above pins degree 4 as the core bar


def test_testdata_invariants(ray_session):
    out = docs_dbscan_clusters(SF_DIR).to_pandas()
    assert set(out["role"]) == {"core", "border", "noise"}  # all three occur
    # noise ⟺ unlabeled
    assert ((out["role"] == "noise") == (out["cluster_id"] == -1)).all()
    cores = out[out["role"] == "core"]
    borders = out[out["role"] == "border"]
    # cluster label = MIN core member id of the cluster (closure convention)
    mins = cores.groupby("cluster_id")["doc_id"].min()
    assert (mins.index.to_numpy() == mins.to_numpy()).all()
    # every core's label is ≤ its own id and names a core doc
    assert (cores["cluster_id"] <= cores["doc_id"]).all()
    assert set(cores["cluster_id"]) <= set(cores["doc_id"])
    # border labels always point at an existing core cluster, and borders
    # never mint labels (no border-only cluster exists)
    assert set(borders["cluster_id"]) <= set(cores["cluster_id"])


def test_determinism(ray_session):
    a = docs_dbscan_clusters(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = docs_dbscan_clusters(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

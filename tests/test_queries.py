"""Mirror of the driver's correctness gate: every queries() entry runs at
sf0.001; SQL-oracled ones must match DuckDB exactly (rows, schema names,
order-insensitive values)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

# GRAFT_ORACLE_SF selects the sweep scale (default 0.001; the driver gate
# runs at 0.01 — `GRAFT_ORACLE_SF=0.01 pytest -m oracle_sweep` reproduces it
# locally before a round close).
SF_DIR = f"/root/testdata/sf{os.environ.get('GRAFT_ORACLE_SF', '0.001')}"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def normalize_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


SQL_ORACLED = sorted(entrymod.oracle_sql())
ALL_QUERIES = sorted(entrymod.queries())


@pytest.mark.oracle_sweep
@pytest.mark.parametrize("name", SQL_ORACLED)
def test_query_matches_duckdb(name, con):
    fns = entrymod.queries()
    got = normalize_df(to_pandas(fns[name](SF_DIR)))
    want = normalize_df(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (list(got.columns), list(want.columns))
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)


@pytest.mark.parametrize("name", [q for q in ALL_QUERIES if q not in SQL_ORACLED and not q.startswith("linkage")])
def test_rows_only_queries_run(name):
    fns = entrymod.queries()
    df = to_pandas(fns[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", SQL_ORACLED)
def test_oracle_output_types_not_hugeint(name, con):
    """Driver value-hash compares dtypes: DuckDB silently widens bare integer
    sum() to HUGEINT (int128), which pandas renders as object/float and the
    hash diverges even when values are identical (round-2 VERDICT items 1-2).
    Every oracle must emit only hashable-width types."""
    rel = con.sql(entrymod.oracle_sql()[name])
    bad = [
        (c, str(t)) for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in ("HUGEINT", "UHUGEINT")
    ]
    assert not bad, f"oracle {name} emits int128 columns {bad}: wrap in CAST(... AS BIGINT)"


def test_every_oracle_has_query():
    qs, sqls = set(entrymod.queries()), set(entrymod.oracle_sql())
    assert sqls <= qs


def test_ann_lsh_recall_vs_bruteforce():
    fns = entrymod.queries()
    exact = to_pandas(fns["emb_knn_top5"](SF_DIR))
    approx = to_pandas(fns["emb_knn_lsh_top5"](SF_DIR))
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    a = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # approximate by design; multi-probe keeps it useful


def test_entry_smoke():
    res = entrymod.entry()
    df = to_pandas(res)
    assert len(df) > 0
    assert "cluster_id" in df.columns


def test_linkage_candidates_query():
    df = to_pandas(entrymod.queries()["linkage_candidates"](SF_DIR))
    assert len(df) > 0
    assert set(df.columns) == {"mention_uid", "candidates", "hard_negatives"}
    assert df["candidates"].map(len).max() <= 10
    assert df["hard_negatives"].map(len).max() <= 10


def test_linkage_eval_query():
    df = to_pandas(entrymod.queries()["linkage_eval"](SF_DIR)).set_index("metric")["value"]
    assert df["pairwise_f1"] >= 0.99
    assert df["recall@10"] >= 0.95
    assert 0 < df["mrr"] <= 1


def test_linkage_predictions_query():
    """Reference predict-report parity: top-5 ranked, similarity rounded to 4,
    description <= 300 chars (predict.py:23,46,47)."""
    df = to_pandas(entrymod.queries()["linkage_predictions"](SF_DIR))
    assert len(df) > 0
    assert set(df.columns) == {"norm_text", "rank", "entity_id", "entity_name", "similarity", "description"}
    assert df["rank"].max() <= 5
    assert df["description"].map(len).max() <= 300
    # similarity carries at most 4 decimals
    assert (df["similarity"].round(4) == df["similarity"]).all()
    # ranks are dense 1..k per surface and scores non-increasing
    for _, g in df.groupby("norm_text"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["similarity"].diff().dropna() <= 1e-9).all()


def test_linkage_eval_has_reference_ks():
    df = to_pandas(entrymod.queries()["linkage_eval"](SF_DIR)).set_index("metric")["value"]
    for k in ("recall@1", "recall@10", "recall@50", "recall@100"):
        assert 0 <= df[k] <= 1
    assert df["recall@100"] >= df["recall@50"] >= df["recall@10"] >= df["recall@1"]


def test_ann_ivf_recall_on_clustered_corpus():
    """IVF must be both SELECTIVE and accurate where partitioning helps: a
    corpus of tight clusters. Recall@5 vs brute force >= 0.9."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mix_blink_ray.stages.ann import AnnConfig, knn_bruteforce, knn_ivf

    rng = np.random.RandomState(7)
    centers = rng.randn(10, 16) * 5
    vecs = np.vstack([c + 0.05 * rng.randn(50, 16) for c in centers])  # 500 rows
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    cfg = AnnConfig(k=5, n_clusters=16, n_probes=4, kmeans_iters=4)
    exact = knn_bruteforce(ds, query_ids=[0, 60, 120, 260, 430], cfg=cfg).to_pandas()
    approx = knn_ivf(ds, query_ids=[0, 60, 120, 260, 430], cfg=cfg).to_pandas()
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    a = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(e & a) / len(e) >= 0.9, len(e & a) / len(e)


def test_kmeans_centroids_deterministic():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mix_blink_ray.stages.ann import AnnConfig, kmeans_centroids

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 8)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    cfg = AnnConfig(n_clusters=8, kmeans_iters=3)
    c1 = kmeans_centroids(rd.from_arrow(tbl), cfg)
    c2 = kmeans_centroids(rd.from_arrow(tbl), cfg)
    np.testing.assert_array_equal(c1, c2)  # retries/reruns must be idempotent
    assert c1.shape == (8, 8)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-9)


def _clustered_embeddings(n_per=50, n_centers=10, dim=16, seed=7):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, dim) * 5
    vecs = np.vstack([c + 0.05 * rng.randn(n_per, dim) for c in centers])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(tbl)


def test_ann_scan_emits_only_topk_partials():
    """Round-2 VERDICT item 2: the IVF/LSH driver merge must see at most
    Q x k x n_batches rows — per-batch per-query top-k inside scan, never the
    untruncated candidate set."""
    from mix_blink_ray.stages.ann import AnnConfig, knn_ivf, knn_lsh

    ds = _clustered_embeddings().repartition(4)
    qids = [0, 60, 120, 260, 430]
    cfg = AnnConfig(k=5, n_clusters=16, n_probes=4, kmeans_iters=4)
    stats_ivf, stats_lsh = {}, {}
    ivf = knn_ivf(ds, qids, cfg, _stats=stats_ivf).to_pandas()
    lsh = knn_lsh(ds, qids, cfg, _stats=stats_lsh).to_pandas()
    bound = len(qids) * cfg.k * 4  # Q * k * n_blocks (batches never split blocks)
    assert 0 < stats_ivf["partial_rows"] <= bound, stats_ivf
    assert 0 < stats_lsh["partial_rows"] <= bound, stats_lsh
    for df in (ivf, lsh):
        assert df.groupby("query_id")["rank"].max().max() <= cfg.k


def test_emit_query_topk_unit():
    import numpy as np

    from mix_blink_ray.stages.ann import _emit_query_topk

    q_ids = np.array([10, 20], dtype=np.int64)
    cand = np.array([1, 2, 3, 4], dtype=np.int64)
    sims = np.array(
        [[0.9, 0.8, -np.inf, 0.7],       # 3 candidates, k=2 -> top 2
         [-np.inf, -np.inf, -np.inf, -np.inf]]  # no candidates -> no rows
    )
    t = _emit_query_topk(q_ids, cand, sims, k=2).to_pandas()
    assert len(t) == 2
    assert set(t["query_id"]) == {10}
    assert set(t["vec_id"]) == {1, 2}
    # k >= C path keeps all finite entries
    t2 = _emit_query_topk(q_ids, cand, sims, k=10).to_pandas()
    assert len(t2) == 3


def test_knn_ivf_exact_mode_equals_bruteforce():
    """n_probes == n_clusters probes everything -> IVF must equal brute force
    exactly (this is the oracled configuration of emb_knn_ivf_top5)."""
    from mix_blink_ray.stages.ann import AnnConfig, knn_bruteforce, knn_ivf

    ds = _clustered_embeddings()
    qids = [0, 60, 120, 260, 430]
    cfg = AnnConfig(k=5, n_clusters=8, n_probes=8, kmeans_iters=3)
    exact = knn_bruteforce(ds, qids, cfg).to_pandas()
    ivf = knn_ivf(ds, qids, cfg).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(exact, ivf)


def test_ann_index_roundtrip_skips_kmeans(tmp_path, monkeypatch):
    """save_ann_index/load_ann_index: rebuild-free second query — knn_ivf with
    loaded centroids must not call kmeans_centroids and must match the fresh
    run exactly (reference dense.py:124-151 serialize/deserialize parity)."""
    import numpy as np

    from mix_blink_ray.stages import ann as annmod

    ds = _clustered_embeddings()
    qids = [0, 60, 120, 260, 430]
    cfg = annmod.AnnConfig(k=5, n_clusters=16, n_probes=4, kmeans_iters=4)

    cents = annmod.kmeans_centroids(ds, cfg)
    fresh = annmod.knn_ivf(ds, qids, cfg).to_pandas()

    idx_dir = str(tmp_path / "ivf")
    annmod.save_ann_index(idx_dir, cents, embeddings=ds, cfg=cfg)
    loaded = annmod.load_ann_index(idx_dir)
    np.testing.assert_array_equal(loaded.centroids, cents)
    assert loaded.assignments_path is not None
    import ray.data as rd

    adf = rd.read_parquet(loaded.assignments_path).to_pandas()
    assert len(adf) == 500 and set(adf.columns) == {"vec_id", "cluster"}

    calls = {"n": 0}
    real = annmod.kmeans_centroids

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(annmod, "kmeans_centroids", counting)
    cached = annmod.knn_ivf(ds, qids, cfg, centroids=loaded.centroids).to_pandas()
    assert calls["n"] == 0  # no k-means recomputation
    pd.testing.assert_frame_equal(fresh, cached)


def test_load_ann_index_rejects_torn_artifact(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mix_blink_ray.stages.ann import load_ann_index

    d = tmp_path / "bad"
    d.mkdir()
    pq.write_table(pa.table({"x": [1]}), d / "centroids.parquet")
    with pytest.raises((ValueError, KeyError)):
        load_ann_index(str(d))


def test_topk_rows_equals_sort_limit():
    """Partial top-k + driver merge must equal sort().limit() exactly,
    including deterministic tie-breaks, across block boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mix_blink_ray.stages.topk import topk_rows

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 50, size=1000)  # many ties
    tbl = pa.table({"v": pa.array(vals, pa.int64()), "id": pa.array(range(1000), pa.int64())})
    ds = rd.from_arrow(tbl).repartition(7)
    got = topk_rows(ds, ["v", "id"], [True, False], 10).to_pandas()
    want = (
        rd.from_arrow(tbl).sort(["v", "id"], descending=[True, False]).limit(10).to_pandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
    # k larger than the dataset degrades to a plain sorted table
    small = topk_rows(rd.from_arrow(tbl).limit(3), ["v", "id"], [True, False], 10)
    assert small.num_rows == 3


def test_emb_near_dup_oracle_nontrivial_at_low_threshold(con):
    """The driver's emb_near_dup oracle matches on an empty result (no synth
    pair reaches cosine 0.95).  Exercise the SAME SQL replay at threshold 0.3,
    where real pairs flow, so the bucket-key replay and in-bucket cosine join
    are pinned non-trivially.  Pair sets must match exactly; cosines to 1e-5
    (engine scores in float32, the oracle in float64)."""
    from mix_blink_ray.pipelines.queries import _emb_near_dup_sql, _t
    from mix_blink_ray.stages.dedup import DedupConfig, embedding_near_dup_pairs

    ds = _t(SF_DIR, "embeddings", ["vec_id", "embedding"])
    got = embedding_near_dup_pairs(ds, DedupConfig(cosine_threshold=0.3)).to_pandas()
    want = con.sql(_emb_near_dup_sql(threshold=0.3)).df()
    assert len(got) > 0, "threshold 0.3 must produce pairs for this test to bite"
    g = got.sort_values(["a_id", "b_id"]).reset_index(drop=True)
    w = want.sort_values(["a_id", "b_id"]).reset_index(drop=True)
    assert list(zip(g["a_id"], g["b_id"])) == list(zip(w["a_id"], w["b_id"]))
    assert np.allclose(g["cosine"], w["cosine"], atol=1e-5, rtol=0)


def test_events_value_locf_semantics(con):
    """LOCF invariants the hash can't explain on its own: error rows carry
    the previous non-error value, leading errors get -1, users are isolated."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import events_value_locf

    out = events_value_locf(SF_DIR).to_pandas()
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    got = out.set_index("event_id")["filled_cents"]
    for uid, g in ev.groupby("user_id"):
        last = -1
        for r in g.itertuples():
            if r.event_type != "error":
                last = int(round(r.value * 100))
            assert got[r.event_id] == last, (uid, r.event_id)


def test_mode_median_interpolation_edges():
    """Even counts average the two middles; odd counts hit the middle cell;
    mode ties break toward the smallest value — DuckDB semantics, replayed
    on a hand-checked micro table."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mix_blink_ray.stages.quantiles import grouped_cell_histogram

    # group 'a': values 1.00, 2.00, 4.00, 100.00 -> median_cont 3.00
    # group 'b': values 1.00, 1.00, 2.00, 2.00, 9.00 -> median 2.00, mode tie -> 1.00
    vals = [1.0, 2.0, 4.0, 100.0, 1.0, 1.0, 2.0, 2.0, 9.0]
    grps = ["a"] * 4 + ["b"] * 5
    for n_blocks in (1, 3):
        ds = rd.from_arrow(
            pa.table({"event_type": pa.array(grps), "value": pa.array(vals)})
        ).repartition(n_blocks)
        hist = grouped_cell_histogram(ds, "event_type", "value", scale=100.0)
        g = hist["event_type"].to_numpy(zero_copy_only=False)
        cells = np.asarray(hist["cell"], dtype=np.int64)
        ns = np.asarray(hist["n"], dtype=np.int64)
        got = {}
        for grp in ("a", "b"):
            m = g == grp
            order = np.argsort(cells[m])
            gc, gn = cells[m][order], ns[m][order]
            cum = np.cumsum(gn)
            total = int(cum[-1])
            h = (total - 1) * 0.5
            lo = gc[int(np.searchsorted(cum, int(np.floor(h)) + 1))]
            hi = gc[int(np.searchsorted(cum, int(np.ceil(h)) + 1))]
            got[grp] = ((lo + (hi - lo) * 0.5) / 100.0, gc[int(np.argmax(gn))] / 100.0)
        assert got["a"] == (3.0, 1.0), (n_blocks, got)
        assert got["b"] == (2.0, 1.0), (n_blocks, got)

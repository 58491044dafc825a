"""Behavioral dedup tests on a constructed near-duplicate corpus (the
testdata documents are all-distinct, so these exercise actual collisions)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.stages.dedup import (
    DedupConfig,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_verify,
    simhash_near_dup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls softly "
    "on the quiet village roofs and the river keeps moving toward the sea"
)


def corpus():
    texts = [
        BASE,                                             # 0
        BASE,                                             # 1 exact dup of 0
        BASE.replace("quick", "swift"),                   # 2 near dup of 0
        BASE.replace("lazy dog", "sleepy cat"),           # 3 near dup of 0
        "completely different content about databases and distributed query engines running on clusters",  # 4
        "yet another unrelated document mentioning tensors gradients and optimizers in training loops",     # 5
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})


def word_jaccard(a: str, b: str, w: int = 3) -> float:
    sa = {tuple(a.lower().split()[i : i + w]) for i in range(len(a.split()) - w + 1)}
    sb = {tuple(b.lower().split()[i : i + w]) for i in range(len(b.split()) - w + 1)}
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup_collapses_identical():
    out = exact_dedup(rd.from_arrow(corpus())).to_pandas()
    assert len(out) == 5  # 6 docs, one exact-dup pair
    row = out[out.n_copies == 2]
    assert len(row) == 1
    assert row.doc_id.iloc[0] == 0  # representative = min id


def test_exact_dedup_no_false_merge_on_shared_prefix():
    """Regression (round-1 VERDICT §wrong #1): same-length docs sharing a long
    prefix hashed identically under the 64-byte-truncated key and were
    silently merged.  The full-length 128-bit hash must keep them apart."""
    texts = [
        "x" * 64 + "TAIL-AAAA",
        "x" * 64 + "TAIL-BBBB",   # same length, same 64-byte prefix, different tail
        "x" * 64 + "TAIL-AAAA",   # true duplicate of doc 0
        "y" * 200 + "end-one",
        "y" * 200 + "end-two",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    out = exact_dedup(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 4  # only the one true duplicate pair merges
    merged = out[out.n_copies == 2]
    assert len(merged) == 1 and merged.doc_id.iloc[0] == 0


def test_minhash_near_dup_finds_near_and_skips_far():
    cfg = DedupConfig(jaccard_threshold=0.5, num_perms=128)
    pairs = minhash_near_dup_pairs(rd.from_arrow(corpus()), cfg).to_pandas()
    found = set(map(tuple, pairs[["a_id", "b_id"]].itertuples(index=False)))
    assert (0, 1) in found            # exact dup
    assert (0, 2) in found            # near dup
    assert not any(4 in p or 5 in p for p in found)  # unrelated never pair
    # estimates approximate true word-shingle jaccard
    texts = corpus()["text"].to_pylist()
    for _, r in pairs.iterrows():
        true_j = word_jaccard(texts[int(r.a_id)], texts[int(r.b_id)])
        assert abs(r.est_jaccard - true_j) < 0.2, (r.a_id, r.b_id, r.est_jaccard, true_j)


def test_ngram_jaccard_verify_exact():
    cfg = DedupConfig(jaccard_threshold=0.3)
    docs = rd.from_arrow(corpus())
    cand = minhash_near_dup_pairs(docs, cfg)
    verified = ngram_jaccard_verify(cand, rd.from_arrow(corpus()), threshold=0.5).to_pandas()
    assert {(0, 1)} <= set(map(tuple, verified[["a_id", "b_id"]].itertuples(index=False)))
    assert verified.set_index(["a_id", "b_id"]).loc[(0, 1), "jaccard"] == 1.0


def test_simhash_near_dup():
    pairs = simhash_near_dup_pairs(rd.from_arrow(corpus()), DedupConfig(simhash_max_hamming=6)).to_pandas()
    found = set(map(tuple, pairs[["a_id", "b_id"]].itertuples(index=False)))
    assert (0, 1) in found
    assert pairs.set_index(["a_id", "b_id"]).loc[(0, 1), "hamming"] == 0
    assert not any((4, 5) == p for p in found)


def test_embedding_near_dup_constructed():
    rng = np.random.RandomState(0)
    base = rng.randn(4, 16)
    vecs = np.vstack([base, base[0] + 0.01 * rng.randn(16)])  # 4 distinct + 1 near-dup of 0
    tbl = pa.table(
        {
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    pairs = embedding_near_dup_pairs(rd.from_arrow(tbl), DedupConfig(cosine_threshold=0.99)).to_pandas()
    assert set(map(tuple, pairs[["a_id", "b_id"]].itertuples(index=False))) == {(0, 4)}


def test_truncation_counters_fire_on_hot_groups():
    """Caps are never silent: hot-band and hot-bucket truncation must show up
    in the stage counters with the exact dropped-pair count."""
    from mix_blink_ray.state.counters import read_counters, reset_counters

    reset_counters()
    # 12 identical docs with hot_band_cap=8: every band holds all 12 ids.
    texts = ["identical hot text for every single row here"] * 12
    tbl = pa.table({"doc_id": pa.array(range(12), pa.int64()), "text": pa.array(texts)})
    cfg = DedupConfig(hot_band_cap=8, jaccard_threshold=0.5)
    pairs = minhash_near_dup_pairs(rd.from_arrow(tbl), cfg).to_pandas()
    counts = read_counters()
    # per band: C(12,2)-C(8,2) = 66-28 = 38 dropped; ≥ 1 band fired
    assert counts.get("minhash_hot_band_truncated_pairs", 0) >= 38
    assert counts["minhash_hot_band_truncated_pairs"] % 38 == 0
    assert len(pairs) <= 8 * 7 // 2

    reset_counters()
    # 20 identical unit vectors, bucket_cap=6 → salted sub-buckets, cross-salt
    # pairs dropped and counted.
    vec = [1.0] + [0.0] * 15
    tbl = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array([vec] * 20, pa.list_(pa.float32())),
        }
    )
    out = embedding_near_dup_pairs(
        rd.from_arrow(tbl), DedupConfig(bucket_cap=6, cosine_threshold=0.9)
    ).to_pandas()
    counts = read_counters()
    dropped = counts.get("embedding_hot_bucket_truncated_pairs", 0)
    assert dropped > 0
    # kept + dropped = all pairs of the bucket (identical vectors ⇒ every
    # within-salt pair passes the threshold)
    assert len(out) + dropped == 20 * 19 // 2


def test_dedup_corpus_end_to_end():
    """dedup_corpus: exact dups drop with exact_dup_of, verified near-dups
    drop with near_dup_of (transitively, min-id representative kept), and
    kept + dropped partitions the corpus exactly."""
    from mix_blink_ray.stages.dedup import dedup_corpus

    texts = [
        BASE,                                   # 0  kept (representative)
        BASE,                                   # 1  exact dup of 0
        BASE.replace("quick", "swift"),         # 2  near dup of 0
        BASE.replace("lazy dog", "sleepy cat"), # 3  near dup of 0 (transitive via 0)
        "completely different content about databases and distributed query engines running on clusters",  # 4 kept
        "yet another unrelated document mentioning tensors gradients and optimizers in training loops",     # 5 kept
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    kept, dropped, metrics = dedup_corpus(
        rd.from_arrow(tbl), DedupConfig(jaccard_threshold=0.5), verify_threshold=0.5
    )
    kdf = kept.to_pandas().sort_values("doc_id")
    ddf = dropped.to_pandas().sort_values("doc_id")
    assert list(kdf["doc_id"]) == [0, 4, 5]
    assert set(kdf["doc_id"]) | set(ddf["doc_id"]) == set(range(6))
    assert set(kdf["doc_id"]) & set(ddf["doc_id"]) == set()
    by_id = ddf.set_index("doc_id")
    assert by_id.loc[1, "reason"] == "exact_dup_of" and by_id.loc[1, "dropped_for"] == 0
    assert by_id.loc[2, "reason"] == "near_dup_of" and by_id.loc[2, "dropped_for"] == 0
    assert by_id.loc[3, "reason"] == "near_dup_of" and by_id.loc[3, "dropped_for"] == 0
    assert metrics == {"n_docs": 6, "n_exact_dropped": 1, "n_near_dropped": 2}


def test_simhash_hot_chunk_cap_counted():
    from mix_blink_ray.state.counters import read_counters, reset_counters

    reset_counters()
    texts = ["identical duplicated content for the cap test"] * 12
    tbl = pa.table({"doc_id": pa.array(range(12), pa.int64()), "text": pa.array(texts)})
    pairs = simhash_near_dup_pairs(tbl_ds := rd.from_arrow(tbl), DedupConfig(hot_band_cap=8)).to_pandas()
    counts = read_counters()
    assert counts.get("simhash_hot_chunk_truncated_pairs", 0) >= 38  # C(12,2)-C(8,2) per chunk
    assert len(pairs) <= 8 * 7 // 2


def test_grouped_run_pairs_matches_per_key_grouping_and_bounds_python():
    """grouped_run_pairs must hand pair_fn exactly the full row set of each
    colliding key — same pair set as a per-key groupby — with ~90% singleton
    keys scattered randomly across input blocks (the round-3 map_groups
    hotspot shape)."""
    from mix_blink_ray.stages.dedup import grouped_run_pairs

    rng = np.random.RandomState(7)
    n = 2000
    # ~90% singleton keys, a few colliding keys of size 2-6
    keys = np.arange(n, dtype=np.int64) * 1000
    ids = np.arange(n, dtype=np.int64)
    extra_keys, extra_ids = [], []
    nid = n
    expected = {}
    for k, sz in [(5_000_000, 2), (6_000_000, 3), (7_000_000, 6)]:
        members = []
        for _ in range(sz):
            extra_keys.append(k)
            extra_ids.append(nid)
            members.append(nid)
            nid += 1
        expected[k] = sorted(members)
    keys = np.concatenate([keys, np.array(extra_keys, dtype=np.int64)])
    ids = np.concatenate([ids, np.array(extra_ids, dtype=np.int64)])
    perm = rng.permutation(len(keys))
    rows = rd.from_arrow(
        pa.table({"k": pa.array(keys[perm]), "i": pa.array(ids[perm])})
    ).repartition(7)

    def pair_fn(g: pa.Table) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        gi = np.sort(np.asarray(g["i"], dtype=np.int64))
        iu, ju = np.triu_indices(len(gi), k=1)
        return pa.table({"a_id": pa.array(gi[iu]), "b_id": pa.array(gi[ju])})

    out = grouped_run_pairs(rows, "k", pair_fn, n_buckets=64).to_pandas()
    got = set(zip(out["a_id"], out["b_id"]))
    want = set()
    for members in expected.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                want.add((members[x], members[y]))
    assert got == want


def test_semantic_dedup_keep_lowest_and_join_fallback():
    """SemDeDup rule on a constructed corpus: three near-identical vectors
    (cos ≈ 1) collapse to the lowest id; an orthogonal vector stays.  The
    broadcast attach and the forced partitioned-join fallback
    (broadcast_limit=0) must agree exactly."""
    from mix_blink_ray.stages.dedup import DedupConfig, semantic_dedup

    rng = np.random.RandomState(5)
    base = rng.randn(64)
    other = rng.randn(64)
    other -= other @ base / (base @ base) * base  # orthogonal to base
    vecs = [base, base * 2.0, base * 0.5 + 1e-9 * other, other]
    tbl = pa.table(
        {
            "vec_id": pa.array([10, 11, 12, 13], pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = rd.from_arrow(tbl)
    out = (
        semantic_dedup(ds, DedupConfig(cosine_threshold=0.95))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(out["status"]) == ["kept", "dropped", "dropped", "kept"]
    assert list(out["dup_of"]) == [-1, 10, 10, -1]

    forced = (
        semantic_dedup(rd.from_arrow(tbl), DedupConfig(cosine_threshold=0.95), broadcast_limit=0)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(out, forced)


def test_pair_stat_matches_sort_aggregate():
    """pair_stat's bucketed exchange must equal the two-column sort
    aggregate it replaced, for both stats, across block layouts."""
    import pandas as pd
    from ray.data.aggregate import Count, Min

    from mix_blink_ray.stages.dedup import pair_stat

    rng = np.random.RandomState(7)
    n = 4000
    tbl = pa.table(
        {
            "a_id": pa.array(rng.randint(0, 60, n), type=pa.int64()),
            "b_id": pa.array(rng.randint(0, 60, n), type=pa.int64()),
            "hamming": pa.array(rng.randint(0, 64, n), type=pa.int64()),
        }
    )
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        got_c = (
            pair_stat(ds, "count", out_col="n")
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )
        want_c = (
            rd.from_arrow(tbl)
            .groupby(["a_id", "b_id"])
            .aggregate(Count(alias_name="n"))
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got_c, want_c.astype("int64"))
        got_m = (
            pair_stat(ds, "min", value_col="hamming", out_col="hamming")
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )
        want_m = (
            rd.from_arrow(tbl)
            .groupby(["a_id", "b_id"])
            .aggregate(Min("hamming", alias_name="hamming"))
            .to_pandas()
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got_m, want_m.astype("int64"))


def test_windowed_banding_matches_global_candidates_within_window():
    """Window-mode banding (cell-mixed keys + adjacent-cell copies) must find
    EXACTLY the within-window subset of the global candidate pair set — the
    two-cell emission can never drop a |Δ| < width collision."""
    texts, ids = [], []
    for i in range(40):
        texts.append(BASE if i % 2 == 0 else BASE.replace("quick", "swift"))
        ids.append(i)
    day = np.arange(40, dtype=np.int64) * 3 % 29  # spread over ~a month

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "day": pa.array(day),
            }
        )
    )
    cfg = DedupConfig(jaccard_threshold=0.3)
    g = minhash_near_dup_pairs(ds, cfg).to_pandas()
    w = minhash_near_dup_pairs(ds, cfg, window_col="day", window_width=8).to_pandas()

    def pairset(df, window=None):
        out = set()
        for r in df.itertuples():
            if window is not None and abs(int(day[r.a_id]) - int(day[r.b_id])) > window:
                continue
            out.add((r.a_id, r.b_id))
        return out

    # engine guarantee: every global pair with |Δday| < width collides in
    # window mode too; window mode may ALSO surface boundary pairs beyond
    # that (callers filter exactly), but never pairs global banding missed
    within = pairset(g, window=7)
    got = pairset(w)
    assert within <= got, sorted(within - got)[:5]
    assert got <= pairset(g), "window mode invented a non-colliding pair"
    assert within, "constructed corpus must produce within-window collisions"


def test_near_dup_windowed_query_window_semantics(tmp_path):
    """docs_near_dup_windowed: near-identical texts pair iff their derived
    crawl days are ≤ 7 apart (ids chosen by probing the day view)."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import _crawl_day, docs_near_dup_windowed

    days = _crawl_day(np.arange(4000, dtype=np.int64))
    # find an id pair with |Δday| <= 7 and one with > 7
    close_pair = far_pair = None
    for i in range(1, 4000):
        if abs(int(days[i]) - int(days[0])) <= 7 and close_pair is None:
            close_pair = (0, i)
        if abs(int(days[i]) - int(days[0])) > 7 and far_pair is None:
            far_pair = (0, i)
        if close_pair and far_pair:
            break
    ids = [close_pair[0], close_pair[1], far_pair[1]]
    texts = [BASE, BASE.replace("quick", "swift"), BASE.replace("fox", "wolf")]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = docs_near_dup_windowed(str(tmp_path)).to_pandas()
    pairs = {(r.a_id, r.b_id) for r in out.itertuples()}
    assert tuple(sorted(close_pair)) in pairs
    assert all(far_pair[1] not in p for p in pairs), pairs
    assert (out["day_a"] - out["day_b"]).abs().le(7).all()


def test_mutual_knn_hand_geometry_and_pair_stat_sum():
    """mutual_knn at k=1 on constructed 2-D directions: 0° and 5° are each
    other's nearest (mutual, rank 1/1); 40° points at 5° but is nobody's
    nearest (one-sided edge must NOT appear).  Also pins pair_stat(sum)."""
    import math

    from mix_blink_ray.stages.ann import mutual_knn
    from mix_blink_ray.stages.dedup import pair_stat

    angles = {10: 0.0, 11: 5.0, 12: 40.0}
    tbl = pa.table(
        {
            "vec_id": pa.array(sorted(angles), pa.int64()),
            "embedding": pa.array(
                [
                    [math.cos(math.radians(a)), math.sin(math.radians(a))]
                    for _, a in sorted(angles.items())
                ],
                pa.list_(pa.float64()),
            ),
        }
    )
    out = mutual_knn(rd.from_arrow(tbl), k=1).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.a_id, r.b_id, r.rank_ab, r.rank_ba) == (10, 11, 1, 1)

    # k=2: every edge among 3 points is mutual (each top-2 is the other two)
    out2 = mutual_knn(rd.from_arrow(tbl), k=2).to_pandas()
    assert len(out2) == 3

    # pair_stat sum: duplicate pair rows add their values
    ps = pair_stat(
        rd.from_arrow(
            pa.table(
                {
                    "a_id": pa.array([1, 1, 2], pa.int64()),
                    "b_id": pa.array([5, 5, 6], pa.int64()),
                    "v": pa.array([3, 4, 7], pa.int64()),
                }
            )
        ),
        stat="sum",
        value_col="v",
        out_col="s",
    ).to_pandas().set_index(["a_id", "b_id"])["s"].to_dict()
    assert ps == {(1, 5): 7, (2, 6): 7}


def test_sources_shingle_overlap_hand_computed(tmp_path):
    """Hand-computed shared-shingle counts; within-source duplicate shingles
    count once; non-overlapping pairs absent; two block layouts agree."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import sources_shingle_overlap

    texts = [
        ("A", "x y z w"),    # shingles: 'x y z', 'y z w'
        ("A", "x y z"),      # duplicate 'x y z' within A — counts once
        ("B", "x y z q"),    # shares 'x y z' with A
        ("B", "p q r s"),
        ("C", "a b c"),      # shares nothing
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array([t for _, t in texts]),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array([s for s, _ in texts]),
            "n_chars": pa.array([len(t) for _, t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = sources_shingle_overlap(str(tmp_path)).to_pandas()
    got = {(r.source_a, r.source_b): r.n_shared for r in out.itertuples()}
    assert got == {("A", "B"): 1}


def test_vocab_growth_matches_pandas_reference(tmp_path):
    """docs_vocab_growth equals a per-token min-day pandas reference on a
    constructed corpus with repeated tokens across days; curve is monotone
    and totals match the distinct vocabulary."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import _crawl_day, docs_vocab_growth

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(60)]
    ids = np.arange(50, dtype=np.int64)
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in ids
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["s"] * len(ids)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = docs_vocab_growth(str(tmp_path)).to_pandas()

    days = _crawl_day(ids)
    first = {}
    for i, t in enumerate(texts):
        for w in t.lower().split():
            d = int(days[i])
            if w not in first or d < first[w]:
                first[w] = d
    import collections

    exp = collections.Counter(first.values())
    got = dict(zip(out["day"], out["new_tokens"]))
    assert got == dict(exp)
    assert out["vocab_size"].is_monotonic_increasing
    assert out["new_tokens"].sum() == len(first) == out["vocab_size"].iloc[-1]


def test_waterfill_hand_computed(tmp_path):
    """sources_token_waterfill: counts [10, 20, 100], B = 78 → cap 48,
    allocations [10, 20, 48]; budget respected; remainder < uncapped count."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import sources_token_waterfill

    def doc(n):
        return " ".join(f"t{i}" for i in range(n))

    texts = [("A", doc(10)), ("B", doc(20)), ("C", doc(100))]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array([t for _, t in texts]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array([s for s, _ in texts]),
            "n_chars": pa.array([len(t) for _, t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = sources_token_waterfill(str(tmp_path)).to_pandas().set_index("source")
    assert out.loc["A", "allocated"] == 10 and out.loc["A", "capped"] == 0
    assert out.loc["B", "allocated"] == 20 and out.loc["B", "capped"] == 0
    assert out.loc["C", "allocated"] == 48 and out.loc["C", "capped"] == 1
    assert (out["cap"] == 48).all()
    budget = 130 * 3 // 5
    assert out["allocated"].sum() <= budget
    assert budget - out["allocated"].sum() < max((out["capped"] == 1).sum(), 1)


def test_temperature_mix_hand_computed(tmp_path):
    """sources_temperature_mix: counts [100, 9, 1] -> isqrt weights
    [10, 3, 1], B = 110*3//5 = 66, wsum 14 -> allocations [47, 14, 4];
    budget respected; sqrt damping flattens the ratio (100:1 -> 10:1)."""
    import pyarrow.parquet as pq

    from mix_blink_ray.pipelines.queries import sources_temperature_mix

    def doc(n):
        return " ".join(f"t{i}" for i in range(n))

    texts = [("A", doc(100)), ("B", doc(9)), ("C", doc(1))]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array([t for _, t in texts]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array([s for s, _ in texts]),
            "n_chars": pa.array([len(t) for _, t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = sources_temperature_mix(str(tmp_path)).to_pandas().set_index("source")
    assert out["weight"].to_dict() == {"A": 10, "B": 3, "C": 1}
    assert out["allocated"].to_dict() == {"A": 47, "B": 14, "C": 4}
    assert out["allocated"].sum() <= 66
    # remainder strictly below n_sources (floor-division convention)
    assert 66 - out["allocated"].sum() < 3

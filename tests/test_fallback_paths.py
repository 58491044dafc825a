"""Equivalence tests for the non-default execution paths: hash-join attach
fallback, actor-pool scorer, salted hot blocks, BPE-ish token counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage


def test_hashjoin_attach_equals_broadcast(synth_small):
    """broadcast_threshold=0 forces the partitioned hash-join fallback; the
    output must equal the broadcast map-side attach."""
    tr = rd.from_arrow(synth_small["transcripts"])
    a = run_linkage(tr, synth_small["catalog"], LinkageConfig()).mentions.to_pandas()
    b = run_linkage(
        tr, synth_small["catalog"], LinkageConfig(broadcast_threshold=0)
    ).mentions.to_pandas()
    cols = ["mention_uid", "pred_id", "best_id", "cluster_id"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("mention_uid").reset_index(drop=True),
        b[cols].sort_values("mention_uid").reset_index(drop=True),
    )


def test_actor_pool_scorer_equals_stateless(synth_small):
    tr = rd.from_arrow(synth_small["transcripts"])
    a = run_linkage(tr, synth_small["catalog"], LinkageConfig()).mentions.to_pandas()
    b = run_linkage(
        tr, synth_small["catalog"], LinkageConfig(use_scorer_actors=True, scorer_concurrency=(1, 2))
    ).mentions.to_pandas()
    cols = ["mention_uid", "pred_id", "cluster_id"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("mention_uid").reset_index(drop=True),
        b[cols].sort_values("mention_uid").reset_index(drop=True),
    )


def test_salted_hot_block_still_pairs_duplicates():
    """A block far above salt_cap is split deterministically (salt = hash of
    node id); the pair generator still yields all within-salt pairs, and
    cross-salt loss is the documented trade-off recovered by band redundancy."""
    from mix_blink_ray.stages.blocking import BlockingConfig, add_salt
    from mix_blink_ray.stages.scoring import ScoringConfig, make_pair_generator

    n = 300
    group = pa.table(
        {
            "node_id": pa.array([f"n{i:04d}" for i in range(n)]),
            # all nodes share similar text → one hot block
            "norm_text": pa.array(["the same hot surface text"] * n),
            "node_type": pa.array(["mention"] * n),
        }
    )
    cfg = BlockingConfig(salt_cap=64)
    salted = add_salt(group, cfg)
    assert salted["salted"].to_pylist() == [True] * n
    counts = np.bincount(np.asarray(salted["salt"]))
    assert len(counts) == -(-n // 64)

    pairs = make_pair_generator(ScoringConfig())(salted)
    # within each salt bucket all pairs are found (identical text)
    expected = sum(int(c) * (int(c) - 1) // 2 for c in counts)
    assert pairs.num_rows == expected
    assert (np.asarray(pairs["est_jaccard"]) == 1.0).all()


def test_token_stats_bpe_counts():
    from mix_blink_ray.stages.text_analysis import token_stats

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hello, world! 123", "  spaced   out  "]),
        }
    )
    out = token_stats(batch)
    # "hello" "," "world" "!" "123" → 5 BPE-ish tokens; 3 whitespace tokens
    assert out["n_bpe_tokens"].to_pylist() == [5, 2]
    assert out["n_tokens"].to_pylist() == [3, 2]


def test_gold_attach_hashjoin_equals_broadcast(tmp_path):
    """_attach_lists gold-side fallback: forcing the hash-join path
    (threshold=0) must produce the same gold_ids as the broadcast path."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    gold = pa.table(
        {
            "mention_uid": pa.array([f"m{i}" for i in range(6)]),
            "gold_ids": pa.array(
                [["E1"], ["E1", "E2"], ["<NIL>"], [], ["E3"], ["E2"]],
                pa.list_(pa.string()),
            ),
        }
    )
    gold_path = str(tmp_path / "gold.parquet")
    pq.write_table(gold, gold_path)
    mentions = rd.from_arrow(
        pa.table(
            {
                "mention_uid": pa.array([f"m{i}" for i in range(7)]),  # m6 has no gold row
                "norm_text": pa.array(["s"] * 7),
            }
        )
    )
    surf = rd.from_arrow(
        pa.table({"norm_text": pa.array(["s"]), "candidates": pa.array([["E1", "E2"]], pa.list_(pa.string()))})
    )
    a = entrymod._attach_lists(mentions, surf, gold_path).to_pandas()
    b = entrymod._attach_lists(mentions, surf, gold_path, gold_broadcast_threshold=0).to_pandas()
    a = a.sort_values("mention_uid").reset_index(drop=True)
    b = b.sort_values("mention_uid").reset_index(drop=True)
    assert list(a["mention_uid"]) == list(b["mention_uid"])
    assert [list(x) for x in a["gold_ids"]] == [list(x) for x in b["gold_ids"]]
    assert [list(x) for x in a["candidates"]] == [list(x) for x in b["candidates"]]


def test_pairwise_prf_distributed_equals_local(synth_small):
    """Distributed contingency-count pairwise PRF == the local count-based
    implementation, on real linkage output."""
    import pyarrow.parquet as pq

    from mix_blink_ray.evaluation.metrics import (
        pairwise_prf_counts,
        pairwise_prf_distributed,
    )
    from mix_blink_ray.sources.synth import NIL_ID

    tr = rd.from_arrow(synth_small["transcripts"])
    res = run_linkage(tr, synth_small["catalog"], LinkageConfig())
    gold_tbl = synth_small["mentions_gold"]

    mdf = res.mentions.to_pandas().set_index("mention_uid")
    gdf = gold_tbl.to_pandas()
    gold_sets = [frozenset(g) - {NIL_ID} for g in gdf["gold_ids"]]
    cl = mdf["cluster_id"].reindex(gdf["mention_uid"]).to_numpy(dtype=object)
    pr = mdf["pred_id"].reindex(gdf["mention_uid"]).to_numpy(dtype=object)
    clusters = [c if (isinstance(p, str) and p != NIL_ID) else None for c, p in zip(cl, pr)]
    local = pairwise_prf_counts(gold_sets, clusters)

    gold_ds = rd.from_arrow(gold_tbl.select(["mention_uid", "gold_ids"]))
    dist = pairwise_prf_distributed(res.mentions, gold_ds)
    for k in ("precision", "recall", "f1", "tp", "fp", "fn"):
        assert dist[k] == local[k], (k, dist[k], local[k])


def test_q3_join_fallback_equals_broadcast(monkeypatch):
    """Forcing _SEMI_BROADCAST_LIMIT=0 switches q3 to partitioned hash joins;
    the result must be identical to the broadcast semi-join path."""
    from mix_blink_ray.pipelines import queries as qmod

    sf = "/root/testdata/sf0.001"
    a = qmod.q3_top_orders(sf).to_pandas().reset_index(drop=True)
    monkeypatch.setattr(qmod, "_SEMI_BROADCAST_LIMIT", 0)
    b = qmod.q3_top_orders(sf).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sharded_catalog_strategy_equals_default(synth_small):
    """scoring_strategy='sharded_catalog' (catalog streams, surfaces
    broadcast) must produce the same mention output as the default."""
    tr = rd.from_arrow(synth_small["transcripts"])
    a = run_linkage(tr, synth_small["catalog"], LinkageConfig()).mentions.to_pandas()
    b = run_linkage(
        tr, synth_small["catalog"], LinkageConfig(scoring_strategy="sharded_catalog")
    ).mentions.to_pandas()
    cols = ["mention_uid", "pred_id", "best_id", "cluster_id"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("mention_uid").reset_index(drop=True),
        b[cols].sort_values("mention_uid").reset_index(drop=True),
    )


def test_pairwise_prf_counts_gold_rows_missing_from_mentions():
    """A gold mention absent from the linkage output must count in the
    gold-pairs denominator as an unclustered singleton (left-join semantics),
    matching the local count-based math."""
    from mix_blink_ray.evaluation.metrics import (
        pairwise_prf_counts,
        pairwise_prf_distributed,
    )

    mentions = rd.from_arrow(
        pa.table(
            {
                "mention_uid": pa.array(["m1", "m2"]),
                "pred_id": pa.array(["E1", "E1"]),
                "cluster_id": pa.array(["e:E1", "e:E1"]),
            }
        )
    )
    gold = rd.from_arrow(
        pa.table(
            {
                "mention_uid": pa.array(["m1", "m2", "m3"]),  # m3 missing from mentions
                "gold_ids": pa.array([["E1"], ["E1"], ["E1"]], pa.list_(pa.string())),
            }
        )
    )
    dist = pairwise_prf_distributed(mentions, gold)
    local = pairwise_prf_counts(
        [frozenset({"E1"})] * 3, ["e:E1", "e:E1", None]  # m3 unclustered
    )
    for k in ("precision", "recall", "f1", "tp", "fp", "fn"):
        assert dist[k] == local[k], (k, dist[k], local[k])
    assert dist["fn"] == 2  # pairs (m1,m3), (m2,m3) missed


def test_l2_normalize_rows_zero_norm_is_deterministic_zero():
    """Round-2 ADVICE: np.divide(where=) without out= left zero-norm rows
    uninitialized. The shared helper must emit exact zero vectors."""
    import numpy as np

    from mix_blink_ray.stages.ann import l2_normalize_rows

    m = np.array([[3.0, 4.0], [0.0, 0.0], [0.0, 1.0]])
    u = l2_normalize_rows(m)
    np.testing.assert_array_equal(u[1], np.zeros(2))
    np.testing.assert_allclose(np.linalg.norm(u[[0, 2]], axis=1), 1.0)
    np.testing.assert_array_equal(u, l2_normalize_rows(m.copy()))


def test_empty_partition_join_error_filter():
    """propagate_labels retries ONLY the Ray 2.49 empty-partition ArrowInvalid;
    everything else re-raises."""
    import pyarrow as pa

    from mix_blink_ray.stages.clustering import _is_empty_partition_join_error

    assert _is_empty_partition_join_error(pa.ArrowInvalid("No match for FieldRef"))
    wrapped = RuntimeError("task failed")
    wrapped.cause = pa.ArrowInvalid("No match for FieldRef")  # RayTaskError shape
    assert _is_empty_partition_join_error(wrapped)
    chained = RuntimeError("boom")
    chained.__cause__ = pa.ArrowInvalid("x")
    assert _is_empty_partition_join_error(chained)
    assert not _is_empty_partition_join_error(ValueError("schema bug"))
    assert not _is_empty_partition_join_error(MemoryError("oom"))


def test_repetition_stats_known_values():
    from mix_blink_ray.stages.text_analysis import repetition_stats

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a a a",              # all dup; top bigram "a a" 2/2
                    "x y z",              # all distinct
                    "a b a b a",          # dup 3/5; "a b" 2/4
                    "solo",               # single token: bigram frac 0
                    "   ",                # whitespace-only: n_tokens 0
                ]
            ),
        }
    )
    out = repetition_stats(batch)
    assert out["n_tokens"].to_pylist() == [3, 3, 5, 1, 0]
    assert out["dup_token_frac"].to_pylist() == [2 / 3, 0.0, 3 / 5, 0.0, 0.0]
    assert out["top_token_frac"].to_pylist() == [1.0, 1 / 3, 3 / 5, 1.0, 0.0]
    assert out["top_bigram_frac"].to_pylist() == [1.0, 1 / 2, 2 / 4, 0.0, 0.0]


def test_repetition_stats_partition_invariant():
    """Per-row map: splitting the batch must not change any row's stats."""
    import numpy as np

    from mix_blink_ray.stages.text_analysis import repetition_stats

    rng = np.random.default_rng(3)
    texts = [
        " ".join(rng.choice(["aa", "bb", "cc", "dd"], size=rng.integers(1, 12)))
        for _ in range(30)
    ]
    batch = pa.table({"doc_id": pa.array(range(30), pa.int64()), "text": pa.array(texts)})
    whole = repetition_stats(batch).to_pandas()
    parts = pa.concat_tables(
        [repetition_stats(batch.slice(i, 7)) for i in range(0, 30, 7)]
    ).to_pandas()
    assert whole.equals(parts.reset_index(drop=True))


def test_pack_next_fit_semantics():
    import numpy as np

    from mix_blink_ray.stages.text_analysis import pack_next_fit

    # greedy next-fit vs hand-computed: budget 10
    lens = np.array([4, 4, 4, 10, 3, 12, 1, 9], dtype=np.int64)
    # [4,4]=8 | [4]=4+10>10 → wait: 4+4=8, +4=12>10 → bin1 starts at 4; 4+10>10
    # → bin2=[10]; [3]=3, +12>10 → bin4=[12] oversize; [1,9]=10 exact fit
    assert pack_next_fit(lens, 10).tolist() == [0, 0, 1, 2, 3, 4, 5, 5]
    # sequential reference on random input
    rng = np.random.default_rng(6)
    lens = rng.integers(1, 9, size=400, dtype=np.int64)
    got = pack_next_fit(lens, 16)
    b, fill, expect = 0, 0, []
    for n in lens:
        if fill and fill + n > 16:
            b, fill = b + 1, 0
        fill += n
        expect.append(b)
    assert got.tolist() == expect
    assert pack_next_fit(np.array([], dtype=np.int64), 8).tolist() == []


def test_q5_partitioned_join_fallback_equals_broadcast(monkeypatch):
    """Forcing _SEMI_BROADCAST_LIMIT=0 sends BOTH dimension attaches of
    q5_local_supplier_volume (customer→nation, supplier→nation) down the
    partitioned-hash-join path; the result must equal the broadcast-lut
    path (round-3 VERDICT item 2)."""
    from mix_blink_ray.pipelines import queries

    sf = "/root/testdata/sf0.001"
    base = queries.q5_local_supplier_volume(sf).to_pandas()
    monkeypatch.setattr(queries, "_SEMI_BROADCAST_LIMIT", 0)
    forced = queries.q5_local_supplier_volume(sf).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("n_name").reset_index(drop=True),
        forced.sort_values("n_name").reset_index(drop=True),
    )


def test_q22_anti_join_fallback_equals_broadcast(monkeypatch):
    """Forcing _ANTI_BROADCAST_LIMIT=0 sends q22's NOT-EXISTS side through
    the partitioned left-outer + null-filter path; identical result
    (order-insensitive) to the broadcast key-set path."""
    from mix_blink_ray.pipelines import queries as qmod

    sf = "/root/testdata/sf0.001"

    def norm(t):
        return (
            t.to_pandas().sort_values("nationkey").reset_index(drop=True)
        )

    a = norm(qmod.q22_sales_opportunity(sf))
    monkeypatch.setattr(qmod, "_ANTI_BROADCAST_LIMIT", 0)
    b = norm(qmod.q22_sales_opportunity(sf))
    pd.testing.assert_frame_equal(a, b)

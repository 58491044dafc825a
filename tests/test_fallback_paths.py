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

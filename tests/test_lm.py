"""Bigram LM perplexity scoring (stages/lm.py): known-value check, the
vocabulary broadcast guard, and row-layout invariance.  SQL parity is
covered by the oracle sweep (docs_lm_perplexity)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.lm import bigram_lm_scores


def _corpus():
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b a", "a b", "solo", "  "]),
        }
    )


def test_bigram_lm_known_values():
    out = bigram_lm_scores(rd.from_arrow(_corpus())).to_pandas().set_index("doc_id")
    # uni: a=3 b=2 solo=1 → V=3; bi: "a b"=2, "b a"=1
    # doc0: (-ln((2+1)/(3+3)) - ln((1+1)/(2+3))) / 2 ; doc1: -ln(3/6)
    t_ab = -np.log(3 / 6)
    t_ba = -np.log(2 / 5)
    assert set(out.index) == {0, 1}  # <2-token docs emit no row
    assert out.loc[0, "n_bigrams"] == 2 and out.loc[1, "n_bigrams"] == 1
    assert abs(out.loc[0, "avg_nll"] - (t_ab + t_ba) / 2) < 1e-12
    assert abs(out.loc[1, "avg_nll"] - t_ab) < 1e-12


def test_bigram_lm_block_layout_invariant():
    a = bigram_lm_scores(rd.from_arrow(_corpus()).repartition(1)).to_pandas()
    b = bigram_lm_scores(rd.from_arrow(_corpus()).repartition(4)).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_bigram_model_constructor_guard_raises():
    """train_bigram_model's contract IS a driver-resident table, so it still
    raises above the cap; the scoring entry points switch topology instead."""
    from mix_blink_ray.stages.lm import train_bigram_model

    with pytest.raises(ValueError, match="broadcast cap"):
        train_bigram_model(rd.from_arrow(_corpus()), max_vocab=2)


def test_bigram_lm_distributed_path_parity():
    """max_vocab=0 forces the partitioned-join topology (no driver model
    table); it must produce the broadcast path's exact doc set / bigram
    counts and the same NLLs up to float summation order."""
    import pandas as pd

    bc = bigram_lm_scores(rd.from_arrow(_corpus())).to_pandas()
    dist = bigram_lm_scores(rd.from_arrow(_corpus()), max_vocab=0).to_pandas()
    bc = bc.sort_values("doc_id").reset_index(drop=True)
    dist = dist.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc[["doc_id", "n_bigrams"]], dist[["doc_id", "n_bigrams"]])
    assert np.allclose(bc["avg_nll"], dist["avg_nll"], rtol=0, atol=1e-12)


def test_dsir_distributed_path_parity():
    """Forced-low-cap DSIR: four partitioned joins must reproduce the
    two-broadcast-model scoring pass (unseen target grams take the
    smoothing mass on both paths)."""
    import pandas as pd

    from mix_blink_ray.stages.lm import dsir_log_importance

    raw = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["a b a c", "a b", "x y z x y", "solo"]),
            }
        )
    )
    tgt = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11], pa.int64()),
                "text": pa.array(["a b a b", "a c"]),
            }
        )
    )
    bcast = dsir_log_importance(raw, tgt).to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = (
        dsir_log_importance(raw, tgt, max_vocab=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        bcast[["doc_id", "n_bigrams"]], dist[["doc_id", "n_bigrams"]]
    )
    assert np.allclose(bcast["log_w"], dist["log_w"], rtol=0, atol=1e-12)


def test_dsir_importance_orders_target_like_docs_first():
    """DSIR log_w = nll_raw − nll_target must rank documents resembling the
    target distribution above off-target ones."""
    from mix_blink_ray.stages.lm import dsir_log_importance

    target_texts = ["alpha beta gamma delta"] * 3
    raw_texts = [
        "alpha beta gamma delta",      # 0: exactly target-like
        "alpha beta gamma epsilon",    # 1: mostly target-like
        "totally unrelated words here",# 2: off-target
    ]
    raw = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(raw_texts)})
    )
    tgt = rd.from_arrow(
        pa.table({"doc_id": pa.array([10, 11, 12], pa.int64()), "text": pa.array(target_texts)})
    )
    out = dsir_log_importance(raw, tgt).to_pandas().set_index("doc_id")["log_w"]
    assert out[0] > out[1] > out[2]

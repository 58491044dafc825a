"""Fellegi–Sunter match weights: exact pattern-weight formula, guard
behavior, self-consistency of the query output, emit_counts contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.pipelines import queries as q
from mix_blink_ray.pipelines.queries import _fs_pattern_weights
from mix_blink_ray.stages.dedup import ngram_jaccard_verify

SF_DIR = "/root/testdata/sf0.001"


def test_pattern_weights_hand_computed():
    # n_m=4 matches, n_u=6 non-matches; field agreements am=[4,2,3], au=[1,3,0]
    n_m, n_u, am, au = 4, 6, [4, 2, 3], [1, 3, 0]
    w = _fs_pattern_weights(n_m, n_u, am, au)
    # all-agree pattern 111: num = 1e6 * (5*8)*(3*8)*(4*8), den = (2*6)*(4*6)*(1*6)
    num = 10**6 * (5 * 8) * (3 * 8) * (4 * 8)
    den = (2 * 6) * (4 * 6) * (1 * 6)
    assert w[7] == num // den
    # none-agree pattern 000: term_m = n_m - am + 1, term_u = n_u - au + 1
    num0 = 10**6 * (1 * 8) * (3 * 8) * (2 * 8)
    den0 = (6 * 6) * (4 * 6) * (7 * 6)
    assert w[0] == num0 // den0
    # agreement on a match-predictive field raises the weight
    assert w[7] > w[0]


def test_pattern_weights_defined_at_degenerate_counts():
    # zero matches / zero non-matches: every Laplace term >= 1, no div-by-zero
    for n_m, n_u in [(0, 5), (5, 0), (0, 0)]:
        am = [min(n_m, 1)] * 3
        au = [min(n_u, 1)] * 3
        w = _fs_pattern_weights(n_m, n_u, am, au)
        assert len(w) == 8 and all(v >= 0 for v in w)


def test_pattern_weights_overflow_raises():
    big = 2**31  # pair counts large enough that the HUGEINT product blows
    with pytest.raises(ValueError, match="HUGEINT overflow"):
        _fs_pattern_weights(big, big, [big] * 3, [big] * 3)


def test_query_self_consistency(ray_session):
    out = q.docs_fs_match_weights(SF_DIR).to_pandas()
    assert len(out) > 0
    # recompute the sufficient statistics from the output and replay the
    # weight formula: every row's weight_ppm must equal its pattern's weight
    n_m = int(out["is_match"].sum())
    n_u = len(out) - n_m
    fields = ["agree_lang", "agree_source", "agree_len"]
    am = [int((out["is_match"] * out[k]).sum()) for k in fields]
    au = [int(((1 - out["is_match"]) * out[k]).sum()) for k in fields]
    w = _fs_pattern_weights(n_m, n_u, am, au)
    idx = 4 * out["agree_lang"] + 2 * out["agree_source"] + out["agree_len"]
    assert (out["weight_ppm"].to_numpy() == np.array(w)[idx.to_numpy()]).all()
    # identical agreement patterns always score identically
    assert out.groupby(["agree_lang", "agree_source", "agree_len"])["weight_ppm"].nunique().max() == 1


def test_emit_counts_keeps_all_pairs_and_matches_threshold_filter(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["abcdefgh", "abcdefgx", "zzzzzzzz"]),
            }
        )
    )
    pairs = rd.from_arrow(
        pa.table({"a_id": pa.array([1, 1], pa.int64()), "b_id": pa.array([2, 3], pa.int64())})
    )
    all_pairs = ngram_jaccard_verify(pairs, docs, threshold=0.7, emit_counts=True).to_pandas()
    assert len(all_pairs) == 2  # no filter applied
    assert {"inter", "uni"} <= set(all_pairs.columns)
    # integer rule == float threshold on the same counts
    keep_int = all_pairs[10 * all_pairs["inter"] >= 7 * all_pairs["uni"]]
    filtered = ngram_jaccard_verify(pairs, docs, threshold=0.7).to_pandas()
    assert sorted(map(tuple, keep_int[["a_id", "b_id"]].to_numpy())) == sorted(
        map(tuple, filtered[["a_id", "b_id"]].to_numpy())
    )
    # counts are exact: "abcdefgh" vs "abcdefgx" share trigrams abc..efg (5 of 6+6)
    row = all_pairs[all_pairs["b_id"] == 2].iloc[0]
    assert row["inter"] == 5 and row["uni"] == 7

"""Contamination-suite behavior tests: token n-gram hashing, benchmark
decontamination, and duplicate-span stats — each against a brute-force
Python reference, on both the broadcast and join execution paths.
(The SQL oracles are exercised by test_queries.py's generic sweep.)"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.functions.hashing import token_ngram_hashes
from mix_blink_ray.stages.contamination import decontaminate, dup_span_stats
from mix_blink_ray.stages.vocab import tokenize_batch

TEXTS = [
    "the quick brown fox jumps over the lazy dog",          # 0 (bench: 0 % 13 == 0)
    "a quick brown fox jumps over the lazy cat today",      # 1: shares a 5-gram with 0
    "completely different words in this one here now ok",   # 2: clean
    "the quick brown fox jumps again and again and again",  # 3: shares "the quick brown fox jumps"
    "short text",                                           # 4: < 5 tokens, zero grams
    "completely different words in this one here now ok",   # 5: exact dup of 2
]


def _docs_table():
    return pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": pa.array(TEXTS)})


def _grams(text, n=5):
    toks = text.lower().split()
    return [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]


def test_token_ngram_hashes_alignment_and_determinism():
    toks = tokenize_batch(pa.array(TEXTS))
    gh, row = token_ngram_hashes(toks, 5)
    # one gram per window, none for the short row
    expected_rows = np.concatenate(
        [np.full(max(len(t.split()) - 4, 0), i) for i, t in enumerate(TEXTS)]
    )
    assert np.array_equal(row, expected_rows)
    # identical windows hash identically across rows: doc 2 and doc 5 are
    # exact duplicates, so their gram hash multisets match
    assert sorted(gh[row == 2]) == sorted(gh[row == 5])
    # and the shared phrase "the quick brown fox jumps" collides across 0/3
    assert len(set(gh[row == 0]) & set(gh[row == 3])) >= 1
    gh2, row2 = token_ngram_hashes(tokenize_batch(pa.array(TEXTS)), 5)
    assert np.array_equal(gh, gh2) and np.array_equal(row, row2)


def test_token_ngram_hashes_rejects_nulls():
    arr = pa.array([["a", "b"], None], pa.list_(pa.string()))
    with pytest.raises(ValueError, match="non-null"):
        token_ngram_hashes(arr, 2)


@pytest.mark.parametrize("limit", [None, 0], ids=["broadcast", "join"])
def test_decontaminate_matches_bruteforce(ray_session, limit):
    ds = rd.from_arrow(_docs_table()).repartition(3)
    out = decontaminate(ds, n=5, bench_mod=13, broadcast_limit=limit).to_pandas()
    bench = set(g for i, t in enumerate(TEXTS) if i % 13 == 0 for g in _grams(t))
    exp = {
        i: (len(_grams(t)), sum(g in bench for g in _grams(t)))
        for i, t in enumerate(TEXTS)
        if i % 13 != 0
    }
    got = {r.doc_id: (r.n_grams, r.n_hits) for r in out.itertuples()}
    assert got == exp
    assert set(out[out.flagged].doc_id) == {i for i, (_, h) in exp.items() if h > 0}
    # docs 1 and 3 overlap the benchmark doc 0; 2/4/5 are clean
    assert set(out[out.flagged].doc_id) == {1, 3}


@pytest.mark.parametrize("limit", [None, 0], ids=["broadcast", "join"])
def test_dup_span_stats_matches_bruteforce(ray_session, limit):
    ds = rd.from_arrow(_docs_table()).repartition(3)
    out = dup_span_stats(ds, n=5, broadcast_limit=limit).to_pandas()
    gsets = {i: set(_grams(t)) for i, t in enumerate(TEXTS)}
    from collections import Counter

    df = Counter(g for s in gsets.values() for g in s)
    dup = {g for g, k in df.items() if k >= 2}
    exp = {i: (len(s), len(s & dup)) for i, s in gsets.items()}
    got = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in out.itertuples()}
    assert got == exp
    fr = out.set_index("doc_id")
    # zero-gram doc reports 0.0, exact-dup pair reports 1.0
    assert fr.loc[4, "dup_frac"] == 0.0
    assert fr.loc[2, "dup_frac"] == 1.0 and fr.loc[5, "dup_frac"] == 1.0
    for i, (ng, nd) in exp.items():
        assert fr.loc[i, "dup_frac"] == (nd / ng if ng else 0.0)

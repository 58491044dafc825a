"""bpe_train vs an independently-written single-process reference BPE
(Sennrich et al. 2016 get_stats/merge loop): identical merge sequences,
layout invariance, overlap (aaa) greedy semantics, early stop."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.bpe import EOW, bpe_train

SEP = "\x1e"


def ref_bpe(word_counts: dict, n_merges: int, min_count: int = 2):
    """Plain-Python reference: dict-of-tuples vocab, O(V·L) per round."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        stats = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = stats.get((syms[i], syms[i + 1]), 0) + c
        if not stats:
            break
        best_c = max(stats.values())
        if best_c < min_count:
            break
        cands = [p for p, c in stats.items() if c == best_c]
        a, b = min(cands, key=lambda p: p[0] + SEP + p[1])
        merges.append((rank, a, b, a + b, best_c))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _wc_table(wc: dict) -> pa.Table:
    return pa.table(
        {
            "token": pa.array(list(wc.keys()), pa.string()),
            "n": pa.array(list(wc.values()), pa.int64()),
        }
    )


CORPUS = {
    "low": 5, "lower": 2, "lowest": 2, "newer": 6, "wider": 3,
    "new": 4, "widest": 1, "aaa": 4, "aaaa": 2, "banana": 3,
}


@pytest.mark.parametrize("parallelism", [1, 7])
def test_bpe_matches_reference(ray_session, parallelism):
    got = bpe_train(
        rd.from_arrow(_wc_table(CORPUS)).repartition(parallelism), 15, min_count=2
    ).to_pandas()
    want = ref_bpe(CORPUS, 15, min_count=2)
    assert len(got) == len(want)
    for row, (rank, a, b, m, c) in zip(got.itertuples(index=False), want):
        assert (row.rank, row.left, row.right, row.merged, row.pair_count) == (
            rank, a, b, m, c,
        )


def test_bpe_overlap_run_semantics(ray_session):
    # "aaaa": pairs (a,a) counted 3x per occurrence; leftmost-greedy merge
    # yields aa,aa — both sides must agree exactly
    wc = {"aaaa": 7, "aaa": 5}
    got = bpe_train(rd.from_arrow(_wc_table(wc)), 4, min_count=1).to_pandas()
    want = ref_bpe(wc, 4, min_count=1)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_bpe_early_stop(ray_session):
    # all-distinct chars: after the singleton merges nothing reaches min_count
    wc = {"ab": 1, "cd": 1}
    got = bpe_train(rd.from_arrow(_wc_table(wc)), 10, min_count=2).to_pandas()
    want = ref_bpe(wc, 10, min_count=2)
    assert len(got) == len(want)


def test_bpe_empty_input(ray_session):
    got = bpe_train(
        rd.from_arrow(pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})),
        5,
    )
    assert got.num_rows == 0


def test_encode_consistent_with_training(ray_session):
    """Encoding the training words with the learned merge sequence must
    reproduce the training procedure's final segmentation (subword counts)."""
    from mix_blink_ray.stages.bpe import bpe_encode

    merges = ref_bpe(CORPUS, 10, min_count=1)
    fixed = [(a, b) for _, a, b, _, _ in merges]

    # reference final segmentation: apply merges in rank order
    def seg(word):
        syms = list(word) + [EOW]
        for _, a, b, m, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = list(CORPUS)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(len(words), dtype=np.int64)),
            "text": pa.array(words, pa.string()),
        }
    )
    got = (
        bpe_encode(rd.from_arrow(docs).repartition(3), fixed)
        .to_pandas()
        .sort_values("doc_id")
    )
    want = [len(seg(w)) for w in words]
    assert got["n_subwords"].tolist() == want
    assert got["n_tokens"].tolist() == [1] * len(words)


# ── kernel fuzz (pure pa.Table functions, no Ray) ──────────────────────────
from hypothesis import given, settings
from hypothesis import strategies as st

from mix_blink_ray.stages.bpe import _apply_merge, _init_symbols


def _ref_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=20),
    merge_seq=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb", "</w>"]),
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb", "</w>"]),
        ),
        max_size=4,
    ),
)
def test_apply_merge_kernel_fuzz(words, merge_seq):
    """Vectorized merge application == the sequential reference, for ANY
    word multiset and ANY merge sequence (including a==b overlap runs,
    merges of already-merged symbols, and no-op merges)."""
    tbl = _init_symbols(
        pa.table(
            {
                "token": pa.array(words, pa.string()),
                "n": pa.array(np.ones(len(words), dtype=np.int64)),
            }
        )
    )
    ref = [list(w) + ["</w>"] for w in words]
    for a, b in merge_seq:
        tbl = _apply_merge(tbl, a, b, a + b)
        ref = [_ref_apply(s, a, b) for s in ref]
    sym = tbl["sym"].combine_chunks() if isinstance(tbl["sym"], pa.ChunkedArray) else tbl["sym"]
    got = sym.to_pylist()
    assert got == ref


def _big_corpus(n_words=2500, seed=17):
    """Synthetic vocab large enough to sustain 1,000+ merges."""
    rng = np.random.default_rng(seed)
    alpha = list("abcdefghijklmnop")
    wc = {}
    for _ in range(n_words):
        L = int(rng.integers(3, 12))
        w = "".join(alpha[i] for i in rng.integers(0, len(alpha), L))
        wc[w] = wc.get(w, 0) + int(rng.integers(1, 50))
    return wc


def test_bpe_local_fast_path_1000_merges_matches_reference(ray_session):
    """The round-4 verdict item: K sequential driver rounds are impractical
    at realistic merge counts.  The single-task incremental loop must emit
    the IDENTICAL merge sequence as the sequential reference at 1,000+
    merges — and do it in seconds, not the distributed path's K round-trips."""
    import time

    wc = _big_corpus()
    t0 = time.monotonic()
    got = bpe_train(rd.from_arrow(_wc_table(wc)).repartition(4), 1200, min_count=2).to_pandas()
    wall = time.monotonic() - t0
    want = ref_bpe(wc, 1200, min_count=2)
    assert len(want) >= 1000, f"corpus must sustain 1000+ merges, got {len(want)}"
    assert len(got) == len(want)
    for row, (rank, a, b, m, c) in zip(got.itertuples(index=False), want):
        assert (row.rank, row.left, row.right, row.merged, row.pair_count) == (
            rank, a, b, m, c,
        )
    # generous bound: the local loop does K heap pops, not K shuffle rounds
    assert wall < 120, f"local fast path took {wall:.1f}s for {len(got)} merges"


def test_bpe_local_and_distributed_paths_identical(ray_session):
    """local_budget_bytes=0 forces the distributed rounds; both paths must
    emit the same merge table (same argmax, same tie-break, same early stop)."""
    wc = _big_corpus(300, seed=23)
    local = bpe_train(rd.from_arrow(_wc_table(wc)), 40, min_count=2).to_pandas()
    dist = bpe_train(
        rd.from_arrow(_wc_table(wc)).repartition(5), 40, min_count=2, local_budget_bytes=0
    ).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(local, dist)

"""Property-based tests (Hypothesis) for the flat-buffer kernels — the
pieces every stage trusts.  No Ray needed: pure NumPy/Arrow."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from mix_blink_ray.functions.hashing import (
    _P,
    _P2,
    _SEED_MIX,
    _splitmix64,
    char_ngram_hashes,
    flat_utf8,
    gather_substrings,
    hash_strings_full,
)
from mix_blink_ray.sources.conll import decode_bio_spans

texts = st.lists(st.text(max_size=300), min_size=0, max_size=30)


def _slow_full_hash(s: str) -> tuple[int, int]:
    b = s.encode()
    L = np.uint64(len(b))
    out = []
    with np.errstate(over="ignore"):
        for base, seed in ((_P, _SEED_MIX), (_P2, ~_SEED_MIX)):
            h = np.uint64(0)
            for c in b:
                h = h * base + np.uint64(c)
            out.append(int(_splitmix64(np.array([L * base + seed + h], dtype=np.uint64))[0]))
    return tuple(out)


@settings(max_examples=50, deadline=None)
@given(texts)
def test_hash_strings_full_matches_bytewise_reference(strs):
    arr = pa.array(strs, pa.string())
    h1, h2 = hash_strings_full(*flat_utf8(arr))
    for i, s in enumerate(strs):
        assert (int(h1[i]), int(h2[i])) == _slow_full_hash(s)


@settings(max_examples=50, deadline=None)
@given(texts)
def test_hash_strings_full_batch_independent(strs):
    """Hashing a batch == hashing each row alone (no cross-row state)."""
    arr = pa.array(strs, pa.string())
    h1, h2 = hash_strings_full(*flat_utf8(arr))
    for i, s in enumerate(strs):
        s1, s2 = hash_strings_full(*flat_utf8(pa.array([s], pa.string())))
        assert (h1[i], h2[i]) == (s1[0], s2[0])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii"), max_size=100), max_size=20))
def test_gather_substrings_roundtrip(strs):
    """Gathering each row's full byte range reproduces the strings."""
    arr = pa.array(strs, pa.string())
    data, off = flat_utf8(arr)
    out = gather_substrings(data, off[:-1], off[1:])
    assert out.to_pylist() == strs


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40), max_size=10), st.integers(2, 4))
def test_char_ngram_hashes_counts(strs, n):
    """Row i contributes max(len_i - n + 1, 0) grams, plus one whole-string
    hash for nonempty rows shorter than n."""
    arr = pa.array(strs, pa.string())
    data, off = flat_utf8(arr)
    grams, rows = char_ngram_hashes(data, off, n=n)
    counts = np.bincount(rows, minlength=len(strs)) if len(rows) else np.zeros(len(strs), int)
    for i, s in enumerate(strs):
        b = len(s.encode())
        expect = b - n + 1 if b >= n else (1 if b > 0 else 0)
        assert counts[i] == expect, (s, n)
    assert np.all(np.diff(rows) >= 0)  # sorted row ids (reduceat contract)


_tag = st.sampled_from(["O", "B-PER", "I-PER", "B-ORG", "I-ORG"])


@settings(max_examples=100, deadline=None)
@given(st.lists(_tag, max_size=20))
def test_decode_bio_spans_invariants(tags):
    links = ["B-l" + str(i) if t != "O" else "" for i, t in enumerate(tags)]
    spans = decode_bio_spans(tags, links)
    covered = set()
    for s, e, label, link in spans:
        assert 0 <= s < e <= len(tags)
        assert not link.startswith(("B-", "I-"))  # prefixes stripped
        for i in range(s, e):
            assert tags[i] != "O"
            assert tags[i][2:] == label
            assert i not in covered  # spans never overlap
            covered.add(i)
    # every non-O token is covered by exactly one span
    assert covered == {i for i, t in enumerate(tags) if t != "O"}


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(max_size=30), min_size=1, max_size=8),
    st.data(),
)
def test_char_to_byte_offsets_matches_python_slicing(strs, data):
    """For ANY unicode rows and ANY in-range char offsets, converting char →
    byte offsets and slicing the flat buffer must equal Python str slicing
    (the reference's dataset.py:85-92 contract)."""
    from mix_blink_ray.functions.hashing import char_to_byte_offsets, gather_substrings

    arr = pa.array(strs, pa.large_string())
    d, off = flat_utf8(arr)
    starts_c, ends_c = [], []
    for s in strs:
        a = data.draw(st.integers(0, len(s)))
        b = data.draw(st.integers(a, len(s) + 3))  # may exceed → clamps
        starts_c.append(a)
        ends_c.append(b)
    bs = char_to_byte_offsets(d, off, np.array(starts_c, dtype=np.int64))
    be = char_to_byte_offsets(d, off, np.array(ends_c, dtype=np.int64))
    got = gather_substrings(d, bs, be).to_pylist()
    assert got == [s[a:b] for s, a, b in zip(strs, starts_c, ends_c)]


@settings(max_examples=100, deadline=None)
@given(
    st.integers(1, 6),   # Q
    st.integers(1, 12),  # C
    st.integers(1, 15),  # k
    st.integers(0, 2**31 - 1),
)
def test_emit_query_topk_properties(q, c, k, seed):
    """≤ Q·k rows, only finite sims, and per query exactly the top-min(k, finite)
    candidates by (cosine desc, vec_id asc)."""
    from mix_blink_ray.stages.ann import _emit_query_topk

    rng = np.random.RandomState(seed)
    sims = rng.randn(q, c)
    sims[rng.rand(q, c) < 0.3] = -np.inf
    q_ids = np.arange(100, 100 + q, dtype=np.int64)
    cand = rng.permutation(1000)[:c].astype(np.int64)
    t = _emit_query_topk(q_ids, cand, sims, k).to_pandas()
    assert len(t) <= q * k
    assert np.isfinite(t["cosine"]).all()
    for qi in range(q):
        finite = np.flatnonzero(np.isfinite(sims[qi]))
        want_n = min(k, len(finite))
        got = t[t["query_id"] == q_ids[qi]]
        assert len(got) == want_n
        # emitted set == the top want_n by similarity (ties: any of the tied)
        order = sorted(finite, key=lambda j: (-sims[qi, j], cand[j]))
        kth = sims[qi, order[want_n - 1]] if want_n else None
        for _, r in got.iterrows():
            assert r["cosine"] >= kth - 1e-12


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=0, max_size=200),
    st.integers(min_value=1, max_value=60),
)
def test_pack_next_fit_properties(lens, budget):
    """Invariants: bins are contiguous and 0-based increasing; every bin's
    fill ≤ budget unless it holds a single oversize doc; greedy = no doc
    could have joined the previous bin."""
    from mix_blink_ray.stages.text_analysis import pack_next_fit

    lens_np = np.array(lens, dtype=np.int64)
    bins = pack_next_fit(lens_np, budget)
    assert len(bins) == len(lens)
    if not len(lens):
        return
    assert bins[0] == 0
    diffs = np.diff(bins)
    assert ((diffs == 0) | (diffs == 1)).all()  # contiguous, increasing
    for b in range(int(bins.max()) + 1):
        members = lens_np[bins == b]
        assert len(members) > 0
        assert members.sum() <= budget or len(members) == 1
    # greedy: the first doc of every new bin would have overflowed the previous
    starts = np.flatnonzero(np.concatenate([[False], diffs == 1])) if len(lens) > 1 else []
    for s in starts:
        prev_fill = lens_np[bins == bins[s] - 1].sum()
        assert prev_fill + lens_np[s] > budget


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=20),
)
def test_mg_compress_error_bound(vals, k):
    """Misra-Gries: kept count ≥ true − dec for every item; ≤ k survivors;
    dec ≤ N/(k+1)."""
    import collections

    from mix_blink_ray.stages.sketches import _mg_compress

    exact = collections.Counter(vals)
    items = pa.array([str(x) for x in exact], pa.string())
    counts = np.array(list(exact.values()), dtype=np.int64)
    kept_items, kept_counts, dec = _mg_compress(items, counts, k)
    assert len(kept_counts) <= k
    assert dec <= len(vals) // (k + 1)
    kept = dict(zip(kept_items.to_pylist(), kept_counts))
    for item, true in exact.items():
        est = kept.get(str(item), 0)
        assert est >= true - dec
        assert est <= true


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab c", max_size=40), min_size=1, max_size=40))
def test_repetition_stats_matches_python_reference(texts):
    import collections

    from mix_blink_ray.stages.text_analysis import repetition_stats

    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = repetition_stats(batch)
    for i, t in enumerate(texts):
        toks = t.split()
        n = len(toks)
        assert out["n_tokens"][i].as_py() == n
        if n == 0:
            assert out["dup_token_frac"][i].as_py() == 0.0
            continue
        c = collections.Counter(toks)
        assert out["dup_token_frac"][i].as_py() == (n - len(c)) / n
        assert out["top_token_frac"][i].as_py() == max(c.values()) / n
        if n >= 2:
            bg = collections.Counter(zip(toks, toks[1:]))
            assert out["top_bigram_frac"][i].as_py() == max(bg.values()) / (n - 1)
        else:
            assert out["top_bigram_frac"][i].as_py() == 0.0


def test_merge_topk_vectorized_ties_and_ranks():
    """_merge_topk (vectorized lexsort merge) must rank by cosine desc with
    vec_id-ascending tie-break, truncate per query at k, and order output by
    (query_id, vec_id) — identical to the per-group pandas loop it replaced."""
    import pandas as pd

    from mix_blink_ray.stages.ann import _merge_topk

    partials = pd.DataFrame(
        {
            "query_id": [1, 1, 1, 1, 2, 2, 2, 3],
            "vec_id":   [9, 4, 7, 5, 2, 1, 3, 8],
            "cosine":   [0.5, 0.9, 0.9, 0.1, 0.3, 0.3, 0.3, 1.0],
        }
    )
    out = _merge_topk(partials, k=2).to_pandas()
    # q1: 0.9 ties → vec 4 then 7; q2: all tie → vec 1 then 2; q3: vec 8
    want = pd.DataFrame(
        {
            "query_id": [1, 1, 2, 2, 3],
            "vec_id":   [4, 7, 1, 2, 8],
            "rank":     [1, 2, 1, 2, 1],
        }
    ).sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)

    empty = _merge_topk(partials.iloc[:0], k=3).to_pandas()
    assert len(empty) == 0 and list(empty.columns) == ["query_id", "vec_id", "rank"]


@given(
    st.lists(st.binary(max_size=200), min_size=0, max_size=8),
    st.sampled_from(["png_prefix", "jpeg_prefix", "wav_prefix", "mp4_prefix", "raw"]),
)
@settings(max_examples=60, deadline=None)
def test_media_header_parsers_total_on_fuzz(payloads, prefix):
    """The pure-numpy header parsers must be TOTAL: arbitrary (including
    magic-prefixed truncated) bytes never raise — they parse or return the
    −1 sentinels.  Real crawl data contains every possible corruption."""
    from mix_blink_ray.stages.multimodal import (
        parse_image_dims,
        parse_mp4_headers,
        parse_wav_headers,
    )

    magic = {
        "png_prefix": b"\x89PNG\r\n\x1a\n",
        "jpeg_prefix": b"\xff\xd8\xff",
        "wav_prefix": b"RIFF\x10\x00\x00\x00WAVE",
        "mp4_prefix": b"\x00\x00\x00\x10ftypisom",
        "raw": b"",
    }[prefix]
    blobs = [magic + p for p in payloads]
    flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    off = np.cumsum([0] + [len(x) for x in blobs]).astype(np.int64)
    w, h, fmt = parse_image_dims(flat, off)
    assert len(w) == len(blobs) and ((fmt == 0) == (w == -1)).all()
    sr, ch, bits, dur = parse_wav_headers(flat, off)
    assert len(sr) == len(blobs)
    ts, vdur = parse_mp4_headers(flat, off)
    assert len(ts) == len(blobs)

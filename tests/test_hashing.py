"""Unit tests for the flat-buffer hashing kernels."""

import numpy as np
import pyarrow as pa
import pytest

from mix_blink_ray.functions.hashing import (
    char_ngram_hashes,
    flat_utf8,
    gather_substrings,
    hash_strings,
    hashed_ngram_multihot,
    lsh_band_keys,
    minhash_signatures,
    rolling_hashes,
    simhash,
)


def grams_of(s: str, n: int = 3) -> set[str]:
    b = s.encode()
    return {b[i : i + n] for i in range(len(b) - n + 1)} if len(b) >= n else {b}


def test_char_ngram_counts_and_rows():
    arr = pa.array(["hello world", "abc", "ab", "", "xyzw"])
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    counts = np.bincount(rows, minlength=5)
    assert counts.tolist() == [9, 1, 1, 0, 2]
    assert np.all(np.diff(rows) >= 0)  # sorted rows for reduceat


def test_ngram_hash_equality_semantics():
    # Identical strings → identical gram multisets; shared substring → shared hashes.
    arr = pa.array(["zormak systems", "zormak systems", "zormak labs"])
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    s0 = sorted(h[rows == 0])
    s1 = sorted(h[rows == 1])
    s2 = set(h[rows == 2])
    assert np.array_equal(s0, s1)
    assert len(set(s0) & s2) > 0


def test_sliced_array_offsets():
    arr = pa.array(["aaa bbb", "ccc ddd", "eee fff"]).slice(1, 2)
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    assert set(rows.tolist()) == {0, 1}


def test_hash_strings_distinct_and_stable():
    arr = pa.array(["abc", "abd", "abc", ""])
    data, off = flat_utf8(arr)
    h = hash_strings(data, off)
    assert h[0] == h[2]
    assert h[0] != h[1]
    h2 = hash_strings(*flat_utf8(pa.array(["abc", "abd", "abc", ""])))
    assert np.array_equal(h, h2)  # process-stable (no salted hash)


def test_minhash_jaccard_estimate():
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox leaps over the lazy dog"
    c = "completely different text with no overlap at all"
    arr = pa.array([a, b, c])
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    sig = minhash_signatures(h, rows, 3, num_perms=128, seed=42)
    sim_ab = (sig[0] == sig[1]).mean()
    sim_ac = (sig[0] == sig[2]).mean()
    ga, gb = grams_of(a), grams_of(b)
    true_j = len(ga & gb) / len(ga | gb)
    assert abs(sim_ab - true_j) < 0.15
    assert sim_ac < 0.2
    # identical empty rows collide
    sig_e = minhash_signatures(*char_ngram_hashes(*flat_utf8(pa.array(["", ""])), n=3), 2)
    assert np.array_equal(sig_e[0], sig_e[1])


def test_lsh_band_keys_shape_and_collision():
    arr = pa.array(["zormak systems inc", "zormak systems inc", "unrelated thing"])
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    sig = minhash_signatures(h, rows, 3, num_perms=64)
    keys = lsh_band_keys(sig, num_bands=16)
    assert keys.shape == (3, 16)
    assert np.array_equal(keys[0], keys[1])
    assert not np.array_equal(keys[0], keys[2])
    with pytest.raises(ValueError):
        lsh_band_keys(sig, num_bands=7)


def test_simhash_similar_vs_different():
    arr = pa.array(["the quick brown fox jumps", "the quick brown fox jumped", "zzz qqq www entirely other"])
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    fp = simhash(h, rows, 3)
    d01 = bin(int(fp[0]) ^ int(fp[1])).count("1")
    d02 = bin(int(fp[0]) ^ int(fp[2])).count("1")
    assert d01 < d02


def test_multihot_embedding_properties():
    arr = pa.array(["abcabc", "abcabc", "zzzzzz", ""])
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    mat = hashed_ngram_multihot(h, rows, 4, dim=32)
    assert mat.shape == (4, 32)
    assert np.array_equal(mat[0], mat[1])
    assert not np.array_equal(mat[0], mat[2])
    assert np.all(mat[3] == 0)


def test_rolling_hashes_word_shingles():
    # token hash sequences: rows with >=w tokens get len-w+1 shingles; short rows one.
    vals = np.array([1, 2, 3, 4, 10, 20, 99], dtype=np.uint64)
    rows = np.array([0, 0, 0, 0, 1, 1, 2], dtype=np.int64)
    h, r = rolling_hashes(vals, rows, 3, w=3)
    assert np.bincount(r, minlength=3).tolist() == [2, 1, 1]
    # same window contents → same hash
    h2, _ = rolling_hashes(np.array([1, 2, 3], dtype=np.uint64), np.zeros(3, dtype=np.int64), 1, w=3)
    assert h[0] == h2[0]


def test_gather_substrings():
    arr = pa.array(["hello world", "foobar"])
    data, off = flat_utf8(arr)
    out = gather_substrings(data, np.array([off[0] + 6, off[1] + 3]), np.array([off[0] + 11, off[1] + 6]))
    assert out.to_pylist() == ["world", "bar"]


def test_group_sums_int64_exact_beyond_float53():
    """The float64-weighted bincount this helper replaces loses integer
    exactness past 2^53 (round-3 ADVICE item 1); the segment reduce must
    not."""
    from mix_blink_ray.functions.numeric import group_sums_int64

    v = np.concatenate([np.array([2**53], dtype=np.int64), np.ones(3, dtype=np.int64)])
    idx = np.zeros(4, dtype=np.int64)
    (s,) = group_sums_int64(idx, 1, v)
    assert s[0] == 2**53 + 3
    # the old path provably rounds here
    f = int(np.bincount(idx, weights=v.astype(np.float64))[0])
    assert f != 2**53 + 3

    # multi-group, unsorted indices, multiple value columns
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 7, size=500).astype(np.int64)
    a = rng.randint(-(10**12), 10**12, size=500).astype(np.int64)
    b = rng.randint(0, 10**6, size=500).astype(np.int64)
    sa, sb = group_sums_int64(idx, 7, a, b)
    for g in range(7):
        assert sa[g] == int(a[idx == g].sum())
        assert sb[g] == int(b[idx == g].sum())
    # empty input
    ea, = group_sums_int64(np.zeros(0, dtype=np.int64), 3, np.zeros(0, dtype=np.int64))
    assert list(ea) == [0, 0, 0]

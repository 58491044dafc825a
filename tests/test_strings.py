"""Jaro-Winkler / Jaccard prefilter kernels vs hand-computed references."""

import numpy as np
import pyarrow as pa
import pytest

from mix_blink_ray.functions.strings import jaccard_pairs, jaro_winkler, jaro_winkler_pairs, pad_codes


def ref_jaro_winkler(s1: str, s2: str, p: float = 0.1) -> float:
    """Independent scalar reference implementation (textbook definition)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    window = max(max(len1, len2) // 2 - 1, 0)
    match1 = [False] * len1
    match2 = [False] * len2
    m = 0
    for i in range(len1):
        lo, hi = max(0, i - window), min(len2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s1[i] == s2[j]:
                match1[i] = match2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    a = [c for c, f in zip(s1, match1) if f]
    b = [c for c, f in zip(s2, match2) if f]
    t = sum(x != y for x, y in zip(a, b)) / 2
    jaro = (m / len1 + m / len2 + (m - t) / m) / 3
    ell = 0
    for x, y in zip(s1[:4], s2[:4]):
        if x != y:
            break
        ell += 1
    return jaro + ell * p * (1 - jaro)


CASES = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("zormak systems", "zormak sytsems"),
    ("apple", "applet"),
    ("abc", "xyz"),
    ("same", "same"),
    ("", "abc"),
    ("", ""),
    ("a", "a"),
]


@pytest.mark.parametrize("s1,s2", CASES)
def test_jaro_winkler_matches_reference(s1, s2):
    got = jaro_winkler(s1, s2)
    want = ref_jaro_winkler(s1, s2)
    assert got == pytest.approx(want, abs=1e-9), (s1, s2)


def test_jaro_winkler_pairs_batch():
    left = pa.array([c[0] for c in CASES])
    right = pa.array([c[1] for c in CASES])
    a, la = pad_codes(left)
    b, lb = pad_codes(right)
    got = jaro_winkler_pairs(a, la, b, lb)
    want = np.array([ref_jaro_winkler(*c) for c in CASES])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_jaccard_pairs_estimate():
    from mix_blink_ray.functions.hashing import char_ngram_hashes, flat_utf8, minhash_signatures

    arr = pa.array(["the quick brown fox", "the quick brown fix", "totally other words"])
    data, off = flat_utf8(arr)
    h, rows = char_ngram_hashes(data, off, n=3)
    sig = minhash_signatures(h, rows, 3, num_perms=128)
    est = jaccard_pairs(sig[[0, 0]], sig[[1, 2]])
    assert est[0] > 0.5
    assert est[1] < 0.15


def test_levenshtein_pairs_matches_reference():
    """Vectorized DP vs a classic single-pair reference, including empties,
    equal strings, and length-skewed pairs (padding must never leak)."""
    import random

    import pyarrow as pa

    from mix_blink_ray.functions.strings import levenshtein_pairs, pad_codes

    def ref(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    random.seed(3)
    al = ["", "abc", "kitten", "Customer#000000001"] + [
        "".join(random.choices("ab#01", k=random.randint(0, 15))) for _ in range(200)
    ]
    bl = ["", "abd", "sitting", "Customer#000000010"] + [
        "".join(random.choices("ab#01", k=random.randint(0, 15))) for _ in range(200)
    ]
    am, la = pad_codes(pa.array(al))
    bm, lb = pad_codes(pa.array(bl))
    got = levenshtein_pairs(am, la, bm, lb)
    assert list(got) == [ref(a, b) for a, b in zip(al, bl)]

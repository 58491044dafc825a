"""edit1_join (FastSS deletion neighborhoods): ZERO-MISS parity with
brute-force all-pairs Levenshtein ≤ 1, covering substitution / insertion /
deletion / equal cases, at two partition layouts; guard behaviors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.simjoin import edit1_join


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _brute(names: list) -> pd.DataFrame:
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = _lev(names[i], names[j])
            if d <= 1:
                rows.append((i, j, d))
    return pd.DataFrame(rows, columns=["a_id", "b_id", "dist"]).sort_values(
        ["a_id", "b_id"]
    ).reset_index(drop=True)


def _tbl(names: list) -> pa.Table:
    return pa.table(
        {
            "id": pa.array(np.arange(len(names), dtype=np.int64)),
            "name": pa.array(names, pa.string()),
        }
    )


def _random_names(n=150, seed=21):
    rng = np.random.default_rng(seed)
    alpha = "abcde"  # tiny alphabet + short strings => many d<=1 pairs
    names = ["".join(alpha[k] for k in rng.integers(0, 5, rng.integers(2, 7)))
             for _ in range(n)]
    # planted cases
    names[10] = "hello"
    names[11] = "hallo"      # substitution
    names[12] = "helo"       # deletion
    names[13] = "hhello"     # insertion
    names[14] = "hello"      # equal
    return names


@pytest.mark.parametrize("parallelism", [1, 6])
def test_edit1_zero_miss_vs_bruteforce(ray_session, parallelism):
    names = _random_names()
    got = (
        edit1_join(rd.from_arrow(_tbl(names)).repartition(parallelism), "name", "id")
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = _brute(names)
    planted = {(10, 11), (10, 12), (10, 13), (10, 14)}
    assert planted <= set(map(tuple, want[["a_id", "b_id"]].to_numpy()))
    pd.testing.assert_frame_equal(got, want)


def test_edit1_empty_and_single_char(ray_session):
    names = ["", "a", "b", "ab", ""]
    got = (
        edit1_join(rd.from_arrow(_tbl(names)), "name", "id")
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _brute(names))


def test_edit1_max_len_guard_raises(ray_session):
    names = ["x" * 100, "y"]
    with pytest.raises(Exception, match="max_len"):
        edit1_join(rd.from_arrow(_tbl(names)), "name", "id", max_len=64).to_pandas()


def test_edit1_hot_variant_guard_raises(ray_session):
    names = ["z"] * 40  # all equal: one shared self-hash floods the bucket
    with pytest.raises(Exception, match="hot_variant_cap"):
        edit1_join(
            rd.from_arrow(_tbl(names)), "name", "id", hot_variant_cap=8
        ).to_pandas()


# ── kernel fuzz (pure numpy, no Ray) ────────────────────────────────────────
from hypothesis import given, settings
from hypothesis import strategies as st

from mix_blink_ray.functions.strings import pad_codes
from mix_blink_ray.stages.simjoin import _deletion_hashes


def _direct_hash(s: bytes, P: int, PINV: int, LEN_MIX: int) -> int:
    """Reference: polynomial hash + length mix + splitmix64, from scratch."""
    from mix_blink_ray.stages.sketches import splitmix64
    import numpy as np

    H = 0
    for j, c in enumerate(s):
        H = (H + c * pow(P, j, 1 << 64)) % (1 << 64)
    mixed = (H + len(s) * LEN_MIX) % (1 << 64)
    return int(splitmix64(np.array([mixed], dtype=np.uint64))[0])


@settings(max_examples=150, deadline=None)
@given(words=st.lists(st.text(alphabet="abcxyz", min_size=0, max_size=12), min_size=1, max_size=8))
def test_deletion_hash_equals_direct_hash_of_deleted_string(words):
    """The O(1) modular-inverse deletion hash must equal hashing the actually
    deleted string from scratch — for every row and every deletion position."""
    import numpy as np
    import pyarrow as pa

    from mix_blink_ray.stages import simjoin as sj

    arr = pa.array(words, pa.string())
    mat, lens = pad_codes(arr, max_len=16)
    self_h, del_h, valid = _deletion_hashes(mat, lens)
    P, PINV, LEN_MIX = int(sj._POLY_P), int(sj._POLY_PINV), int(sj._LEN_MIX)
    for i, w in enumerate(words):
        b = w.encode()
        assert int(self_h[i]) == _direct_hash(b, P, PINV, LEN_MIX)
        for d in range(len(b)):
            assert bool(valid[i, d])
            want = _direct_hash(b[:d] + b[d + 1:], P, PINV, LEN_MIX)
            assert int(del_h[i, d]) == want
        assert not valid[i, len(b):].any()

"""ppjoin_pairs: ZERO-MISS completeness vs brute-force all-pairs token
Jaccard (the property distinguishing the exact join from LSH), at two
thresholds and two partition layouts, plus the guard behaviors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.simjoin import ppjoin_pairs

WORDS = [f"w{i}" for i in range(40)]


def _corpus(n=120, seed=9):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(3, 14))
        toks = [WORDS[j] for j in rng.integers(0, len(WORDS), k)]
        texts.append(" ".join(toks))
    # plant a few high-overlap pairs
    texts[7] = texts[3] + " extra"
    texts[11] = texts[3]
    texts[25] = " ".join(texts[20].split()[:-1])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _brute(tbl: pa.Table, t: float) -> pd.DataFrame:
    docs = tbl.to_pandas()
    sets = {r.doc_id: set(r.text.lower().split()) for r in docs.itertuples(index=False)}
    ids = sorted(sets)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = max(len(sets[a] | sets[b]), 1)
            jac = inter / union
            if jac >= t:
                rows.append((a, b, round(jac * 1_000_000) / 1_000_000.0))
    return pd.DataFrame(rows, columns=["a_id", "b_id", "jaccard"]).sort_values(
        ["a_id", "b_id"]
    ).reset_index(drop=True)


@pytest.mark.parametrize("t,parallelism", [(0.5, 1), (0.5, 7), (0.8, 5)])
def test_ppjoin_zero_miss_vs_bruteforce(ray_session, t, parallelism):
    tbl = _corpus()
    got = (
        ppjoin_pairs(rd.from_arrow(tbl).repartition(parallelism), t)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = _brute(tbl, t)
    assert len(want) > 0, "corpus must contain qualifying pairs"
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("t", [0.5, 0.8])
def test_ppjoin_distributed_rank_path_parity(ray_session, t):
    """max_broadcast_vocab=0 forces the distributed rank-assignment path
    (prefix scan + partitioned rank join — no driver vocab table); it must
    emit the IDENTICAL pair set and jaccards as the broadcast path and the
    brute-force oracle — both paths share one (df asc, token asc) total
    order, so prefix rows are equal, not merely equivalent."""
    tbl = _corpus()
    got = (
        ppjoin_pairs(rd.from_arrow(tbl).repartition(5), t, max_broadcast_vocab=0)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = _brute(tbl, t)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_ppjoin_hot_token_cap_raises(ray_session):
    # every doc shares one token -> that token floods its prefix group
    n = 30
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"shared u{i}" for i in range(n)], pa.string()),
        }
    )
    with pytest.raises(Exception, match="hot_token_cap"):
        ppjoin_pairs(rd.from_arrow(tbl), 0.3, hot_token_cap=8).to_pandas()


def test_ppjoin_threshold_validation(ray_session):
    tbl = _corpus(30)
    with pytest.raises(ValueError):
        ppjoin_pairs(rd.from_arrow(tbl), 0.0)


def test_ppjoin_no_pairs(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aa bb cc", "dd ee ff"], pa.string()),
        }
    )
    out = ppjoin_pairs(rd.from_arrow(tbl), 0.5).to_pandas()
    assert len(out) == 0


def test_ppjoin_payload_join_fallback_parity(ray_session):
    """payload_broadcast_limit=0 forces the partitioned-join text attach in
    the verify stage; results must equal the broadcast attach (and thus the
    brute-force oracle)."""
    tbl = _corpus()
    bc = (
        ppjoin_pairs(rd.from_arrow(tbl).repartition(3), 0.5)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    jn = (
        ppjoin_pairs(rd.from_arrow(tbl).repartition(3), 0.5, payload_broadcast_limit=0)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, jn)


def _brute_containment(tbl: pa.Table, t: float) -> pd.DataFrame:
    docs = tbl.to_pandas()
    sets = {r.doc_id: set(r.text.lower().split()) for r in docs.itertuples(index=False)}
    rows = []
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / max(len(sets[a]), 1)
            if c >= t:
                rows.append((a, b, round(c * 1_000_000) / 1_000_000.0))
    return pd.DataFrame(rows, columns=["a_id", "b_id", "containment"]).sort_values(
        ["a_id", "b_id"]
    ).reset_index(drop=True)


@pytest.mark.parametrize("t,parallelism", [(0.7, 1), (0.7, 7), (1.0, 5)])
def test_containment_zero_miss_vs_bruteforce(ray_session, t, parallelism):
    """containment_join: ZERO MISSES vs brute-force directed containment at a
    fractional and the subset (t=1) threshold, two partition layouts."""
    from mix_blink_ray.stages.simjoin import containment_join

    tbl = _corpus()
    got = (
        containment_join(rd.from_arrow(tbl).repartition(parallelism), t)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = _brute_containment(tbl, t)
    assert len(want) > 0, "corpus must contain qualifying directed pairs"
    pd.testing.assert_frame_equal(got, want)


def test_containment_directedness(ray_session):
    """A short doc fully inside a long one: (short, long) qualifies at t=1,
    (long, short) does not."""
    from mix_blink_ray.stages.simjoin import containment_join

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta", "alpha beta gamma delta"], pa.string()),
        }
    )
    out = containment_join(rd.from_arrow(tbl), 1.0).to_pandas()
    assert {(r.a_id, r.b_id) for r in out.itertuples()} == {(1, 2)}
    assert out["containment"].iloc[0] == 1.0


def test_containment_hot_pair_cap_raises(ray_session):
    from mix_blink_ray.stages.simjoin import containment_join

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(30, dtype=np.int64)),
            "text": pa.array(["same token everywhere"] * 30, pa.string()),
        }
    )
    with pytest.raises(Exception, match="hot_pair_cap"):
        containment_join(rd.from_arrow(tbl), 0.9, hot_pair_cap=10).to_pandas()

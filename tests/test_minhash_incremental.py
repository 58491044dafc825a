"""minhash_incremental: 3-batch state evolution must report exactly the
pairs the full-corpus batch run reports (within-delta at the delta's own
call, cross-batch at the later batch's call, history×history never twice),
with identical est_jaccard values."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.stages.dedup import (
    DedupConfig,
    minhash_incremental,
    minhash_near_dup_pairs,
)

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _text(seed: int, mutate_at: int = -1) -> str:
    rng = np.random.default_rng(seed)
    toks = [WORDS[i] for i in rng.integers(0, len(WORDS), 24)]
    if mutate_at >= 0:
        toks[mutate_at] = "zulu"
    return " ".join(toks)


def _docs(rows: list) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def test_three_batch_evolution_matches_full_batch(ray_session, tmp_path):
    cfg = DedupConfig(jaccard_threshold=0.5)
    # planted duplicates are exact copies (J=1.0 — every band collides, so
    # detection is guaranteed, not banding-probabilistic); one mutated doc
    # (id 15) exercises the near-but-not-exact path on both sides equally
    b1 = [(0, _text(100))] + [(1, _text(100))] + [
        (i, _text(100 + i)) for i in range(2, 10)
    ]
    # batch 2: 10-19 with a copy of history doc 3 (cross-batch)
    b2 = (
        [(10, _text(103))]
        + [(15, _text(104, mutate_at=5))]
        + [(i, _text(200 + i)) for i in range(11, 20) if i != 15]
    )
    # batch 3: 20-29 with copies of history docs 11 (batch 2) and 5 (batch 1)
    b3 = (
        [(20, _text(211))]
        + [(21, _text(105))]
        + [(i, _text(300 + i)) for i in range(22, 30)]
    )
    state = str(tmp_path / "mh_state")

    got = []
    for batch in (b1, b2, b3):
        out = minhash_incremental(
            rd.from_arrow(_docs(batch)), state, cfg=cfg
        ).to_pandas()
        got.append(out)
    got_all = _norm(pd.concat(got, ignore_index=True))

    full = _norm(
        minhash_near_dup_pairs(
            rd.from_arrow(_docs(b1 + b2 + b3)), cfg=cfg
        ).to_pandas()
    )
    assert len(full) >= 4, "corpus must contain the planted near-dup pairs"
    pd.testing.assert_frame_equal(got_all, full)

    # cross-batch pairs were reported at the LATER batch, not re-reported
    pair_sets = [set(map(tuple, g[["a_id", "b_id"]].to_numpy())) for g in got]
    assert (3, 10) in pair_sets[1]
    assert (11, 20) in pair_sets[2] and (5, 21) in pair_sets[2]
    assert not (pair_sets[0] & pair_sets[1]) and not (pair_sets[1] & pair_sets[2])


def test_first_batch_with_no_pairs_still_writes_state(ray_session, tmp_path):
    state = str(tmp_path / "mh_state2")
    b1 = [(i, _text(400 + i)) for i in range(5)]
    out1 = minhash_incremental(rd.from_arrow(_docs(b1)), state).to_pandas()
    assert len(out1) == 0
    # a later exact copy of doc 2 must be caught against the state
    b2 = [(100, _text(402))]
    out2 = minhash_incremental(rd.from_arrow(_docs(b2)), state).to_pandas()
    assert set(map(tuple, out2[["a_id", "b_id"]].to_numpy())) == {(2, 100)}


def _three_batches():
    b1 = [(0, _text(100))] + [(1, _text(100))] + [
        (i, _text(100 + i)) for i in range(2, 10)
    ]
    b2 = (
        [(10, _text(103))]
        + [(15, _text(104, mutate_at=5))]
        + [(i, _text(200 + i)) for i in range(11, 20) if i != 15]
    )
    b3 = (
        [(20, _text(211))]
        + [(21, _text(105))]
        + [(i, _text(300 + i)) for i in range(22, 30)]
    )
    return b1, b2, b3


def test_band_index_path_matches_legacy_full_read(ray_session, tmp_path, monkeypatch):
    """The actor-sharded band index returns exactly the history rows whose
    band_key collides with a delta key — the only rows that can emit a pair
    — so the 3-batch evolution must be IDENTICAL to the legacy path that
    unions the full history band store."""
    cfg = DedupConfig(jaccard_threshold=0.5)
    batches = _three_batches()

    monkeypatch.setenv("GRAFT_MINHASH_BAND_INDEX", "0")
    legacy = [
        minhash_incremental(
            rd.from_arrow(_docs(b)), str(tmp_path / "legacy"), cfg=cfg
        ).to_pandas()
        for b in batches
    ]
    monkeypatch.setenv("GRAFT_MINHASH_BAND_INDEX", "1")
    indexed = [
        minhash_incremental(
            rd.from_arrow(_docs(b)), str(tmp_path / "indexed"), cfg=cfg
        ).to_pandas()
        for b in batches
    ]
    assert sum(len(g) for g in legacy) >= 4
    for lg, ix in zip(legacy, indexed):
        pd.testing.assert_frame_equal(_norm(lg), _norm(ix))


def test_history_band_files_not_reread(ray_session, tmp_path, monkeypatch):
    """The round-4 limit, closed: history band files load at most ONCE per
    session, and deltas ingested in-session are never read back at all."""
    import glob as _glob

    from mix_blink_ray.stages.band_index import band_index_reset, band_index_stats

    cfg = DedupConfig(jaccard_threshold=0.5)
    b1, b2, b3 = _three_batches()
    state = str(tmp_path / "mh_idx")

    # batches 1+2 published by a "previous session" (legacy path, no actors)
    monkeypatch.setenv("GRAFT_MINHASH_BAND_INDEX", "0")
    for b in (b1, b2):
        minhash_incremental(rd.from_arrow(_docs(b)), state, cfg=cfg).to_pandas()
    n_hist_files = len(_glob.glob(f"{state}/delta_*/bands/*.parquet"))
    assert n_hist_files >= 2

    monkeypatch.setenv("GRAFT_MINHASH_BAND_INDEX", "1")
    band_index_reset(state)  # simulate a fresh session
    out3 = minhash_incremental(rd.from_arrow(_docs(b3)), state, cfg=cfg).to_pandas()
    assert {(11, 20), (5, 21)} <= set(map(tuple, out3[["a_id", "b_id"]].to_numpy()))
    stats = band_index_stats(state)
    # cold sync: every shard scanned each history file exactly once
    assert all(s["files_read"] == n_hist_files for s in stats)
    # batch 3's own delta was ingested directly, never read back
    assert all("delta_00002" in s["loaded"] for s in stats)

    # a fourth batch (copy of a batch-3 doc): pairs still found, ZERO new
    # file reads — neither history nor the in-session delta re-loads
    b4 = [(40, _text(322))]
    out4 = minhash_incremental(rd.from_arrow(_docs(b4)), state, cfg=cfg).to_pandas()
    assert set(map(tuple, out4[["a_id", "b_id"]].to_numpy())) == {(22, 40)}
    stats4 = band_index_stats(state)
    assert all(s["files_read"] == n_hist_files for s in stats4)
    band_index_reset(state)

"""Incremental (delta-batch) linkage: two incremental runs over corpus
halves must produce byte-identical labels to one full run, and the second
run must score only surfaces unseen in the first."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from mix_blink_ray.pipelines.linkage import (
    LinkageConfig,
    run_linkage,
    run_linkage_incremental,
)


def _halves(transcripts: pa.Table) -> tuple[pa.Table, pa.Table]:
    convs = sorted(set(transcripts["conv_id"].to_pylist()))
    first = set(convs[: len(convs) // 2])
    mask = pc.is_in(transcripts["conv_id"], value_set=pa.array(sorted(first)))
    return transcripts.filter(mask), transcripts.filter(pc.invert(mask))


COLS = ["mention_uid", "pred_id", "best_id", "cluster_id"]


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df[COLS].sort_values("mention_uid").reset_index(drop=True)


def test_incremental_equals_full_run(synth_small, tmp_path):
    t1, t2 = _halves(synth_small["transcripts"])
    state = str(tmp_path / "state")
    cfg = LinkageConfig()

    m1, s1 = run_linkage_incremental(rd.from_arrow(t1), synth_small["catalog"], cfg, state)
    m2, s2 = run_linkage_incremental(rd.from_arrow(t2), synth_small["catalog"], cfg, state)
    inc = pd.concat([m1.to_pandas(), m2.to_pandas()])

    full = run_linkage(
        rd.from_arrow(synth_small["transcripts"]), synth_small["catalog"], cfg
    ).mentions.to_pandas()

    pd.testing.assert_frame_equal(_sorted(inc), _sorted(full))

    # first run scores everything; second only the genuinely new surfaces
    assert s1["n_novel"] == s1["n_surfaces"] and s1["n_known"] == 0
    surf1 = set(m1.to_pandas()["norm_text"])
    surf2 = set(m2.to_pandas()["norm_text"])
    assert s2["n_novel"] == len(surf2 - surf1)
    assert s2["n_known"] == len(surf2 & surf1)
    assert s2["n_novel"] < s2["n_surfaces"]  # halves share hot surfaces


def test_incremental_state_resumable_layout(synth_small, tmp_path):
    """State write is atomic (tmp+rename) and a rerun of the SAME batch
    scores zero novel surfaces (idempotent)."""
    import os

    t1, _ = _halves(synth_small["transcripts"])
    state = str(tmp_path / "state")
    cfg = LinkageConfig()
    _, s1 = run_linkage_incremental(rd.from_arrow(t1), synth_small["catalog"], cfg, state)
    assert os.path.isdir(os.path.join(state, "surface_preds"))
    assert not os.path.exists(os.path.join(state, "surface_preds.tmp"))
    _, s_again = run_linkage_incremental(rd.from_arrow(t1), synth_small["catalog"], cfg, state)
    assert s_again["n_novel"] == 0
    assert s_again["n_known"] == s1["n_surfaces"]


def test_incremental_antijoin_membership_equals_broadcast(synth_small, tmp_path):
    """broadcast_threshold=0 forces BOTH state-sized fallbacks — the keyed
    anti-join membership check and the partitioned join attach (the round-2
    scale hole: the attach used to to_pandas() the accumulated state
    unconditionally); output and novel counts must match the broadcast path."""
    t1, t2 = _halves(synth_small["transcripts"])
    s_a = str(tmp_path / "a")
    s_b = str(tmp_path / "b")
    cfg_b = LinkageConfig()
    cfg_j = LinkageConfig(broadcast_threshold=0)
    run_linkage_incremental(rd.from_arrow(t1), synth_small["catalog"], cfg_b, s_a)
    run_linkage_incremental(rd.from_arrow(t1), synth_small["catalog"], cfg_b, s_b)
    m_a, st_a = run_linkage_incremental(rd.from_arrow(t2), synth_small["catalog"], cfg_b, s_a)
    m_b, st_b = run_linkage_incremental(rd.from_arrow(t2), synth_small["catalog"], cfg_j, s_b)
    assert st_a["n_novel"] == st_b["n_novel"] and st_a["n_known"] == st_b["n_known"]
    pd.testing.assert_frame_equal(_sorted(m_a.to_pandas()), _sorted(m_b.to_pandas()))


def test_incremental_refuses_state_from_different_catalog(synth_small, tmp_path):
    """Surface-pred state is catalog-dependent: a changed catalog must raise,
    not silently blend stale and fresh predictions (round-2 ADVICE)."""
    import pyarrow as pa
    import pytest

    t1, t2 = _halves(synth_small["transcripts"])
    state = str(tmp_path / "state")
    cfg = LinkageConfig()
    run_linkage_incremental(rd.from_arrow(t1), synth_small["catalog"], cfg, state)
    cat = synth_small["catalog"]
    renamed = cat.set_column(
        cat.schema.get_field_index("name"),
        "name",
        pa.array(["X-" + n for n in cat["name"].to_pylist()], pa.string()),
    )
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        run_linkage_incremental(rd.from_arrow(t2), renamed, cfg, state)


def test_dedup_incremental_three_batches(tmp_path):
    """Batch 2 resubmits batch-1 docs plus new dups; batch 3 is all-known.
    Novel sets must be exactly the never-seen texts; state grows by one
    delta per non-empty batch."""
    import os

    import pyarrow as pa
    import ray

    from mix_blink_ray.stages.dedup import dedup_incremental

    state = str(tmp_path / "state")

    def batch(ids, texts):
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
        ).repartition(2)

    b1 = dedup_incremental(batch([1, 2, 3], ["aa", "bb", "aa"]), state)
    assert sorted(b1.to_pandas()["doc_id"]) == [1, 2]  # within-batch dup dropped

    # "bb" known from batch 1; "cc" new (twice → one winner); "aa" known
    b2 = dedup_incremental(batch([10, 11, 12, 13], ["bb", "cc", "cc", "aa"]), state)
    assert sorted(b2.to_pandas()["doc_id"]) == [11]

    b3 = dedup_incremental(batch([20, 21], ["aa", "cc"]), state)
    assert b3.count() == 0

    deltas = sorted(os.listdir(os.path.join(state, "hashes")))
    assert deltas == ["delta_00000", "delta_00001"]  # empty batch 3 adds none

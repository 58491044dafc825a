"""Canopy assignment: hand-computed rarest-token picks, singleton canopies,
size accounting, tie-break order, broadcast-cap guard."""

import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.pipelines import queries as q
from mix_blink_ray.stages.vocab import canopy_assignments

SF_DIR = "/root/testdata/sf0.001"


def _docs(texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )


def test_hand_computed_assignment(ray_session):
    # dfs: the=3, cat=2, sat=1, dog=2, ran=1, hat=1
    out = (
        canopy_assignments(_docs(["the cat sat", "the dog ran", "the cat dog hat"]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0: rarest is sat (df=1); doc 1: ran (df=1); doc 2: hat (df=1)
    assert out["canopy_token"].tolist() == ["sat", "ran", "hat"]
    assert out["canopy_df"].tolist() == [1, 1, 1]
    assert out["canopy_size"].tolist() == [1, 1, 1]  # all singletons


def test_tie_breaks_to_smallest_token(ray_session):
    # both 'aa' and 'zz' have df=1 in doc 0: tie at min df → smallest token
    out = canopy_assignments(_docs(["zz aa shared", "shared"])).to_pandas()
    row0 = out[out["doc_id"] == 0].iloc[0]
    assert row0["canopy_token"] == "aa"


def test_shared_canopy_and_size_accounting(ray_session):
    # 'rare' (df=2) is the rarest token of both docs → one canopy of size 2
    out = canopy_assignments(_docs(["common rare", "common rare", "common only xx"])).to_pandas()
    by_doc = out.set_index("doc_id")
    assert by_doc.loc[0, "canopy_token"] == "rare" == by_doc.loc[1, "canopy_token"]
    assert by_doc.loc[0, "canopy_size"] == 2
    # sizes sum to the number of assigned documents
    assert int(out.groupby("canopy_token")["canopy_size"].first().sum()) == len(out)


def test_broadcast_cap_raises(ray_session):
    with pytest.raises(ValueError, match="max_broadcast_vocab"):
        canopy_assignments(_docs(["a b c d e"]), max_broadcast_vocab=2)


def test_testdata_determinism_and_consistency(ray_session):
    a = q.docs_canopy_assign(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q.docs_canopy_assign(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # every doc with tokens gets exactly one canopy; sizes are group counts
    counts = a.groupby("canopy_token").size()
    for tok, grp in a.groupby("canopy_token"):
        assert (grp["canopy_size"] == counts[tok]).all()

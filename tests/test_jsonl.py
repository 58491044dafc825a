"""JSONL nested-document ingest: reference on-disk shape → flattened
mention rows, with the Preprocessor's label-resolution semantics
(``mix_blink/data/dataset.py:79-117``) including the count contract from
the reference's ``tests/test_dataset.py:64-67`` (8 mentions with NIL kept,
6 with remove_nil)."""

import pyarrow as pa
import pytest

from mix_blink_ray.sources.jsonl import (
    NIL,
    TOY_LABELS,
    flatten_documents,
    mixblink_mentions,
    read_mixblink_jsonl,
    resolve_mention_labels,
    write_toy_fixture,
)


@pytest.fixture(scope="module")
def toy_path(tmp_path_factory):
    return write_toy_fixture(str(tmp_path_factory.mktemp("jsonl") / "dataset_toy.jsonl"))


def test_flatten_and_surface_slices(toy_path):
    flat = read_mixblink_jsonl(toy_path).map_batches(
        flatten_documents, batch_format="pyarrow"
    ).to_pandas()
    assert len(flat) == 8  # entity-free docs contribute no rows
    for _, r in flat.iterrows():
        assert r["surface"] == r["text"][r["start"] : r["end"]]
    assert set(flat.columns) == {
        "doc_id", "example_id", "text", "start", "end", "surface", "labels", "hard_negatives",
    }
    # hard negatives carried through verbatim at this stage
    assert ["E02", "E03"] in [list(h) for h in flat["hard_negatives"]]


def test_reference_count_contract(toy_path):
    # NIL kept: dictionary built WITH the NIL row → all 8 mentions resolve.
    with_nil = mixblink_mentions(toy_path, TOY_LABELS + [NIL], remove_nil=False)
    assert with_nil.count() == 8
    # remove_nil: NIL-only mentions drop (2 of them) → 6.
    without = mixblink_mentions(toy_path, TOY_LABELS, remove_nil=True)
    df = without.to_pandas()
    assert len(df) == 6
    # multi-label ["E04","-1"] keeps E04, loses the NIL
    ml = df[df["doc_id"] == "d003"].sort_values("example_id")
    assert list(ml["labels"].iloc[0]) == ["E04"]
    # hard negatives lose unknown/NIL ids under remove_nil (dataset.py:105-113)
    d2 = df[df["example_id"] == "d002-P1"]
    assert list(d2["hard_negatives"].iloc[0]) == ["E01"]


def test_unknown_label_raises_without_remove_nil(toy_path):
    # without the NIL dictionary row, "-1" is unknown → KeyError (dataset.py:100)
    with pytest.raises(Exception, match="not found in label2id"):
        mixblink_mentions(toy_path, TOY_LABELS, remove_nil=False).materialize()


def test_empty_entities_and_missing_docs(toy_path):
    flat = read_mixblink_jsonl(toy_path).map_batches(
        flatten_documents, batch_format="pyarrow"
    ).to_pandas()
    assert "d005" not in set(flat["doc_id"])  # entity-free doc → no mention rows


def test_resolve_preserves_order_and_columns(toy_path):
    ds = read_mixblink_jsonl(toy_path).map_batches(flatten_documents, batch_format="pyarrow")
    out = resolve_mention_labels(ds, TOY_LABELS + [NIL]).to_pandas()
    assert list(out.columns)[:6] == ["doc_id", "example_id", "text", "start", "end", "surface"]
    assert len(out) == 8

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


def test_non_ascii_char_offsets(tmp_path):
    """Round-2 ADVICE: entity start/end are CHARACTER offsets (the reference
    slices the Python str, dataset.py:85-92). Non-ASCII text before a mention
    must still yield the exact str slice, not a byte-shifted / mid-codepoint
    cut."""
    import json

    docs = [
        {
            "doc-id": "u001",
            "examples": [
                {
                    # 'Café Über — ' precedes the mention; chars != bytes
                    "id": "u001-P1",
                    "text": "Café Über — Steel Hawk flog über die Straße.",
                    "entities": [{"start": 12, "end": 22, "label": ["E01"], "hard_negatives": []}],
                },
                {
                    # mention itself is non-ASCII, mixed with CJK + emoji before it
                    "id": "u001-P2",
                    "text": "老虎🐯機 Überstraße ançienne",
                    "entities": [
                        {"start": 5, "end": 15, "label": ["E02"], "hard_negatives": []},
                        {"start": 16, "end": 24, "label": ["E03"], "hard_negatives": []},
                    ],
                },
            ],
        }
    ]
    p = tmp_path / "nonascii.jsonl"
    p.write_text("\n".join(json.dumps(d, ensure_ascii=False) for d in docs) + "\n", encoding="utf-8")
    flat = read_mixblink_jsonl(str(p)).map_batches(
        flatten_documents, batch_format="pyarrow"
    ).to_pandas()
    assert len(flat) == 3
    for _, r in flat.iterrows():
        assert r["surface"] == r["text"][r["start"] : r["end"]]
    assert set(flat["surface"]) == {"Steel Hawk", "Überstraße", "ançienne"}


def test_char_to_byte_offsets_unit():
    import numpy as np

    from mix_blink_ray.functions.hashing import char_to_byte_offsets, flat_utf8, gather_substrings

    texts = ["abc", "héllo wörld", "", "老虎x", "plain"]
    arr = pa.array(texts, pa.large_string())
    data, offsets = flat_utf8(arr)
    starts_c = np.array([1, 6, 0, 2, 0])
    ends_c = np.array([3, 11, 0, 3, 99])  # 99 clamps to row length
    b0 = char_to_byte_offsets(data, offsets, starts_c)
    b1 = char_to_byte_offsets(data, offsets, ends_c)
    got = gather_substrings(data, b0, b1).to_pylist()
    assert got == [t[s:e] for t, s, e in zip(texts, starts_c, ends_c)]
    # ASCII-only fast path agrees
    arr2 = pa.array(["abcd", "xyz"], pa.large_string())
    d2, o2 = flat_utf8(arr2)
    np.testing.assert_array_equal(
        char_to_byte_offsets(d2, o2, np.array([2, 1])), o2[:-1] + np.array([2, 1])
    )

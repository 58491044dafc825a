"""JSONL nested-document ingest — the reference's actual on-disk dataset
format (``README.md:16-35``; loader ``mix_blink/data/dataset.py:25-49``;
fixture shape ``tests/test_data/dataset_toy.jsonl``):

    {"doc-id": "...", "examples": [
        {"id": "...", "text": "...",
         "entities": [{"start": int, "end": int,
                       "label": [id, ...], "hard_negatives": [id, ...]}]}]}

Three pieces, all Ray-Data-native:

- :func:`read_mixblink_jsonl` — ``ray.data.read_json`` (Arrow JSON reader,
  schema inferred with the nested list<struct> columns intact).
- :func:`flatten_documents` — ``map_batches`` body exploding
  doc → examples → entities into one row per mention, fully vectorized over
  Arrow list offsets (``pc.list_flatten`` / ``list_parent_indices`` twice).
- :func:`resolve_mention_labels` — the reference Preprocessor's label
  resolution (``dataset.py:92-113``): labels are kept only if present in the
  catalog label set; with ``remove_nil`` unknown labels are dropped (and a
  mention whose label list empties is dropped, ``dataset.py:115-116``),
  without it an unknown label raises ``KeyError`` (``dataset.py:100``).
  ``hard_negatives`` get the same treatment (``dataset.py:105-113``) — this
  is the user-provided hard-negatives ingest path; the engine can also
  *compute* hard negatives (``stages.scoring.split_candidates_hard_negatives``).

The catalog label set is broadcast via ``ray.put`` once and read per worker —
never re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.hashing import gather_substrings

__all__ = ["read_mixblink_jsonl", "flatten_documents", "resolve_mention_labels", "mixblink_mentions"]


def read_mixblink_jsonl(path: str) -> Dataset:
    """Read a mix-blink-format JSONL dataset (nested docs, schema above)."""
    import ray.data as rd

    return rd.read_json(path)


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def flatten_documents(batch: pa.Table) -> pa.Table:
    """One input document row → one output row per (example, entity).

    Output: ``doc_id, example_id, text, start:int32, end:int32, surface,
    labels:list<string>, hard_negatives:list<string>`` — ``surface`` is the
    ``text[start:end]`` slice (reference ``entity_span`` semantics,
    ``dataset.py:91``; start/end are CHARACTER offsets exactly as the
    reference's str slicing treats them, converted to byte offsets internally).
    """
    examples = _combine(batch["examples"])
    ex_doc = pc.list_parent_indices(examples)              # example → doc row
    ex = examples.flatten()                                # struct rows
    entities = _combine(ex.field("entities"))
    ent_ex = pc.list_parent_indices(entities)              # entity → example row
    ent = entities.flatten()

    ex_id = ex.field("id")
    ex_text = ex.field("text")
    doc_take = pc.take(ex_doc, ent_ex)                     # entity → doc row
    text = pc.take(ex_text, ent_ex)
    start = pc.cast(ent.field("start"), pa.int32())
    end = pc.cast(ent.field("end"), pa.int32())

    if len(ent):
        from ..functions.hashing import char_to_byte_offsets, flat_utf8

        data, offsets = flat_utf8(text)
        # start/end are CHARACTER offsets (reference dataset.py:85-92 slices
        # the Python str); convert per row to byte offsets before slicing the
        # flat UTF-8 buffer — byte-indexing directly would cut mid-codepoint
        # on any non-ASCII text preceding a mention.
        starts = char_to_byte_offsets(data, offsets, np.asarray(start, dtype=np.int64))
        ends = char_to_byte_offsets(data, offsets, np.asarray(end, dtype=np.int64))
        surface = gather_substrings(data, starts, ends)
    else:
        surface = pa.array([], pa.large_string())

    has_hard = any(f.name == "hard_negatives" for f in ent.type)
    hard = (
        pc.cast(ent.field("hard_negatives"), pa.list_(pa.string()))
        if has_hard
        else pa.array([[]] * len(ent), pa.list_(pa.string()))
    )
    return pa.table(
        {
            "doc_id": pc.take(_combine(batch["doc-id"]), doc_take),
            "example_id": pc.take(ex_id, ent_ex),
            "text": text,
            "start": start,
            "end": end,
            "surface": pc.cast(surface, pa.string()),
            "labels": pc.cast(ent.field("label"), pa.list_(pa.string())),
            "hard_negatives": hard,
        }
    )


def _filter_list_to_known(col: pa.ListArray, known: pa.Array) -> pa.ListArray:
    """Vectorized per-row list filter: keep only values in ``known``."""
    col = _combine(col)
    off = np.asarray(col.offsets, dtype=np.int64)
    rows = np.repeat(np.arange(len(col), dtype=np.int64), np.diff(off))
    vals = col.flatten()
    keep = np.asarray(pc.is_in(vals, value_set=known), dtype=bool)
    counts = np.bincount(rows[keep], minlength=len(col))
    new_off = np.zeros(len(col) + 1, dtype=np.int32)
    np.cumsum(counts, out=new_off[1:])
    kept_vals = vals.take(pa.array(np.flatnonzero(keep)))
    return pa.ListArray.from_arrays(pa.array(new_off), kept_vals)


def resolve_mention_labels(
    mentions: Dataset,
    label_set: list[str] | pa.Array,
    remove_nil: bool = False,
) -> Dataset:
    """Reference Preprocessor label resolution over flattened mention rows.

    - every label/hard-negative must be in ``label_set`` (the catalog ids,
      INCLUDING the NIL id when the dictionary was built with a NIL row);
      with ``remove_nil`` unknown ones are silently dropped, without it an
      unknown label raises ``KeyError`` (``dataset.py:96-113``),
    - a mention whose resolved label list is empty is dropped
      (``dataset.py:115-116`` "if encodings['labels']").
    """
    import ray

    known = pa.array(sorted(set(label_set if isinstance(label_set, list) else label_set.to_pylist())), pa.string())
    known_ref = ray.put(known)

    def resolve(batch: pa.Table) -> pa.Table:
        kn = ray.get(known_ref) if not isinstance(known_ref, pa.Array) else known_ref
        labels = _combine(batch["labels"])
        if not remove_nil:
            unknown = pc.filter(labels.flatten(), pc.invert(pc.is_in(labels.flatten(), value_set=kn)))
            if len(unknown):
                raise KeyError(
                    f"Label {unknown[0].as_py()} not found in label2id mapping."
                )  # reference dataset.py:100
            kept_labels = labels
        else:
            kept_labels = _filter_list_to_known(labels, kn)
        kept_hard = _filter_list_to_known(batch["hard_negatives"], kn) if remove_nil else _combine(batch["hard_negatives"])
        out = batch.drop_columns(["labels", "hard_negatives"])
        out = out.append_column("labels", pc.cast(kept_labels, pa.list_(pa.string())))
        out = out.append_column("hard_negatives", pc.cast(kept_hard, pa.list_(pa.string())))
        return out.filter(pc.greater(pc.list_value_length(out["labels"]), 0))

    return mentions.map_batches(resolve, batch_format="pyarrow")


TOY_LABELS = ["E01", "E02", "E03", "E04", "E05"]
NIL = "-1"

# Deterministic toy dataset in the reference's on-disk shape (content is the
# engine's own; the SHAPE mirrors dataset_toy.jsonl: 8 mentions total, 2 of
# them NIL-only ⇒ 6 survive remove_nil — the reference's test_dataset.py:64-67
# count contract).
_TOY_DOCS = [
    {
        "doc-id": "d001",
        "examples": [
            {
                "id": "d001-P1",
                "text": "Steel Hawk flew over the river.",
                "entities": [
                    {"start": 0, "end": 10, "label": ["E01"], "hard_negatives": ["E02", "E03"]}
                ],
            }
        ],
    },
    {
        "doc-id": "d002",
        "examples": [
            {
                "id": "d002-P1",
                "text": "Quantum Forge opened today.",
                "entities": [
                    {"start": 0, "end": 13, "label": ["E02"], "hard_negatives": ["E01", "-1"]}
                ],
            },
            {
                "id": "d002-P2",
                "text": "Moon Garden blossomed.",
                "entities": [
                    {"start": 0, "end": 11, "label": ["E03"], "hard_negatives": ["E04"]}
                ],
            },
        ],
    },
    {
        "doc-id": "d003",
        "examples": [
            {
                "id": "d003-P1",
                "text": "We toured Copper Vale.",
                "entities": [
                    {"start": 10, "end": 21, "label": ["E04", "-1"], "hard_negatives": ["E01"]}
                ],
            },
            {
                "id": "d003-P2",
                "text": "We toured Ember Peak.",
                "entities": [
                    {"start": 10, "end": 20, "label": ["E05"], "hard_negatives": ["E02"]}
                ],
            },
        ],
    },
    {
        "doc-id": "d004",
        "examples": [
            {
                "id": "d004-P1",
                "text": "Mystery Thing appeared.",
                "entities": [
                    {"start": 0, "end": 13, "label": ["-1"], "hard_negatives": ["E01"]}
                ],
            },
            {
                "id": "d004-P2",
                "text": "Another Thing and Shadow Form.",
                "entities": [
                    {"start": 0, "end": 13, "label": ["E01"], "hard_negatives": ["-1", "E02"]},
                    {"start": 18, "end": 29, "label": ["-1"], "hard_negatives": ["E03"]},
                ],
            },
        ],
    },
    {
        "doc-id": "d005",
        "examples": [{"id": "d005-P1", "text": "Nothing notable here.", "entities": []}],
    },
]


def write_toy_fixture(path: str) -> str:
    """Write the deterministic toy JSONL dataset to ``path`` (idempotent)."""
    import json
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    content = "\n".join(json.dumps(d) for d in _TOY_DOCS) + "\n"
    if not (os.path.exists(path) and open(path).read() == content):
        with open(path, "w") as f:
            f.write(content)
    return path


def mixblink_mentions(
    path: str, label_set: list[str], remove_nil: bool = False
) -> Dataset:
    """read → flatten → resolve, end to end (the reference ``get_splits``
    pipeline shape, ``dataset.py:120-137``, minus tokenization)."""
    docs = read_mixblink_jsonl(path)
    flat = docs.map_batches(flatten_documents, batch_format="pyarrow")
    return resolve_mention_labels(flat, label_set, remove_nil=remove_nil)

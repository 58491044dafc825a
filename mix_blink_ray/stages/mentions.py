"""Mention extraction: transcripts → one row per mention (a flat-map).

Engine analog of the reference ``Preprocessor.__call__`` flat-map
(``mix_blink/data/dataset.py:78-116``), which turns nested documents into one
row per annotated mention.  Transcript tables carry no span annotations, so
the engine extracts mentions itself with a deterministic NER-lite contract:

    a mention is a maximal run of Capitalized words (each word's first
    character uppercase) separated by single spaces, in otherwise-lowercase
    text.

The extractor is fully vectorized over the flat UTF-8 buffer of the Arrow
string column — the only loops are over a handful of NumPy arrays of word
positions, never Python-per-row.  Offsets are half-open char offsets into the
turn text (reference convention ``mix_blink/data/dataset.py:13-16``); for
ASCII text byte and char offsets coincide (the synthetic corpus is ASCII;
documented limitation for non-ASCII).

Every mention is keyed by ``mention_uid = "{conv_id}:{turn_idx}:{start}"``.
Keys, never positional order, align downstream stages — the reference's
positional ``pop(0)`` re-nesting (``mix_blink/cli/get_candidates.py:39-52``)
is the one order-sensitive behavior the engine deliberately replaces
(SURVEY.md §2.2 M10).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import flat_utf8, gather_substrings
from ..functions.text import normalize

__all__ = [
    "extract_mentions",
    "mentions_from_annotations",
    "mention_uid_column",
    "resolve_gold_labels",
]


def _find_capitalized_runs(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (row, start, end) of maximal Capitalized-word runs.

    Positions are absolute into ``data``; ``end`` is exclusive.
    """
    n = len(data)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    upper = (data >= 65) & (data <= 90)
    lower = (data >= 97) & (data <= 122)
    digit = (data >= 48) & (data <= 57)
    alnum = upper | lower | digit

    prev_alnum = np.empty(n, dtype=bool)
    prev_alnum[0] = False
    prev_alnum[1:] = alnum[:-1]
    next_alnum = np.empty(n, dtype=bool)
    next_alnum[-1] = False
    next_alnum[:-1] = alnum[1:]
    # Row boundaries cut words: first char of a row has no "previous" char.
    row_starts = offsets[:-1][(offsets[:-1] >= 0) & (offsets[:-1] < n)]
    prev_alnum[row_starts] = False
    row_ends = offsets[1:] - 1
    row_ends = row_ends[(row_ends >= 0) & (row_ends < n)]
    next_alnum[row_ends] = False

    word_start = alnum & ~prev_alnum
    word_end = alnum & ~next_alnum
    S = np.flatnonzero(word_start)  # word start positions
    E = np.flatnonzero(word_end)    # word end positions (inclusive), pairs with S
    # Guard against sliced arrays whose data buffer extends past [offsets[0], offsets[-1]).
    in_range = (S >= offsets[0]) & (E < offsets[-1])
    S, E = S[in_range], E[in_range]
    if len(S) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    cap = upper[S]

    word_row = np.searchsorted(offsets, S, side="right") - 1
    connected = np.zeros(len(S), dtype=bool)
    if len(S) > 1:
        connected[1:] = (
            (S[1:] == E[:-1] + 2)
            & (data[np.maximum(S[1:] - 1, 0)] == 32)
            & (word_row[1:] == word_row[:-1])
        )
    prev_cap = np.zeros(len(S), dtype=bool)
    prev_cap[1:] = cap[:-1]

    new_run = cap & ~(connected & prev_cap)
    cap_idx = np.flatnonzero(cap)
    if len(cap_idx) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    run_head = new_run[cap_idx]
    seg_starts = np.flatnonzero(run_head)
    seg_ends = np.concatenate([seg_starts[1:], [len(cap_idx)]]) - 1
    first_word = cap_idx[seg_starts]
    last_word = cap_idx[seg_ends]
    return word_row[first_word], S[first_word], E[last_word] + 1


def extract_mentions(batch: pa.Table, min_chars: int = 2) -> pa.Table:
    """``map_batches(batch_format="pyarrow")`` body: transcripts → mentions.

    Output schema: mention_uid, conv_id, turn_idx, role, tool, start, end,
    surface, norm_text.  Emits zero rows for mention-free turns (flat-map may
    shrink as well as grow — analog of the reference's unlabeled-mention
    filter, ``mix_blink/data/dataset.py:115-116``).
    """
    text = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
    data, offsets = flat_utf8(text)
    row, start_abs, end_abs = _find_capitalized_runs(data, offsets)
    keep = (end_abs - start_abs) >= min_chars
    row, start_abs, end_abs = row[keep], start_abs[keep], end_abs[keep]

    start = (start_abs - offsets[row]).astype(np.int32)
    end = (end_abs - offsets[row]).astype(np.int32)
    idx = pa.array(row)
    surface = pc.cast(gather_substrings(data, start_abs, end_abs), pa.string())

    conv_id = pc.take(batch["conv_id"], idx)
    turn_idx = pc.take(batch["turn_idx"], idx)
    out = pa.table(
        {
            "mention_uid": mention_uid_column(conv_id, turn_idx, pa.array(start)),
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": pc.take(batch["role"], idx),
            "tool": pc.take(batch["tool"], idx),
            "start": pa.array(start, pa.int32()),
            "end": pa.array(end, pa.int32()),
            "surface": surface,
            "norm_text": normalize(surface),
        }
    )
    return out


def mention_uid_column(conv_id: pa.Array, turn_idx: pa.Array, start: pa.Array) -> pa.Array:
    """``"{conv_id}:{turn_idx}:{start}"`` — the engine's alignment key."""
    return pc.binary_join_element_wise(
        conv_id,
        pc.cast(turn_idx, pa.string()),
        pc.cast(start, pa.string()),
        ":",
    )


def resolve_gold_labels(
    batch: pa.Table,
    known_ids: set[str] | pa.Array,
    remove_nil: bool = True,
    gold_col: str = "gold_ids",
) -> pa.Table:
    """Reference label-mapping + NIL policy, vectorized (``mix_blink/data/
    dataset.py:94-116``): each gold label is checked against the catalog id
    set; unknown labels are DROPPED when ``remove_nil`` (reference
    ``remove_nil=True``) else raise ``KeyError`` (reference ``dataset.py``
    strict path); mentions left with zero resolvable labels are filtered out
    (the unlabeled-mention filter, ``dataset.py:115-116``)."""
    gold = batch[gold_col]
    gold = gold.combine_chunks() if isinstance(gold, pa.ChunkedArray) else gold
    offs = np.asarray(gold.offsets, dtype=np.int64)
    vals = gold.flatten()
    known = (
        pa.array(sorted(known_ids), pa.string()) if isinstance(known_ids, set) else known_ids
    )
    is_known = np.asarray(pc.is_in(vals, value_set=known), dtype=bool)
    if not remove_nil and not is_known.all():
        bad = vals.take(pa.array(np.flatnonzero(~is_known)[:3])).to_pylist()
        raise KeyError(f"gold label(s) not in catalog: {bad}")
    row = np.repeat(np.arange(len(gold), dtype=np.int64), np.diff(offs))
    counts = np.bincount(row[is_known], minlength=len(gold))
    new_offs = np.zeros(len(gold) + 1, dtype=np.int32)
    np.cumsum(counts, out=new_offs[1:])
    kept_vals = vals.take(pa.array(np.flatnonzero(is_known)))
    new_list = pa.ListArray.from_arrays(pa.array(new_offs), kept_vals)
    out = batch.drop_columns([gold_col]).append_column(gold_col, new_list)
    return out.filter(pa.array(counts > 0))


def mentions_from_annotations(transcripts: pa.Table, spans: pa.Table) -> pa.Table:
    """Alternative mention source: pre-annotated spans (the reference's input
    shape — documents arrive with ``entities`` offsets,
    ``mix_blink/data/dataset.py:19-22``).  Joins spans to turn text by
    ``(conv_id, turn_idx)`` and slices surfaces; used by conformance tests.
    """
    key_t = pc.binary_join_element_wise(
        transcripts["conv_id"], pc.cast(transcripts["turn_idx"], pa.string()), ":"
    )
    key_s = pc.binary_join_element_wise(
        spans["conv_id"], pc.cast(spans["turn_idx"], pa.string()), ":"
    )
    pos = pc.index_in(key_s, value_set=key_t)
    text = pc.take(transcripts["text"], pos)
    tdata, toff = flat_utf8(text)
    s_abs = toff[:-1] + np.asarray(spans["start"], dtype=np.int64)
    e_abs = toff[:-1] + np.asarray(spans["end"], dtype=np.int64)
    surface = pc.cast(gather_substrings(tdata, s_abs, e_abs), pa.string())
    return pa.table(
        {
            "mention_uid": mention_uid_column(spans["conv_id"], spans["turn_idx"], spans["start"]),
            "conv_id": spans["conv_id"],
            "turn_idx": spans["turn_idx"],
            "role": pc.take(transcripts["role"], pos),
            "tool": pc.take(transcripts["tool"], pos),
            "start": spans["start"],
            "end": spans["end"],
            "surface": surface,
            "norm_text": normalize(surface),
        }
    )

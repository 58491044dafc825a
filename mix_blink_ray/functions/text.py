"""Vectorized text normalization and tokenization kernels (pyarrow.compute).

The normalizer defines ``norm_text``, the canonical key for mention surfaces:
lowercase, whitespace-collapsed, edge-trimmed.  Exact-duplicate surfaces
contract to one row under this key before any scoring happens
(``pipelines/linkage.py``), which is the engine's primary skew defense.

Reference analogs: the dictionary text composition ``mix_blink/data/
dictionary.py:99-103`` (string concat) and the mention-marker splice
``mix_blink/data/dataset.py:85`` (pure string ops) — both are plain
Arrow-kernel string transforms here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["normalize", "splice_markers", "compose_description", "word_tokens"]


def normalize(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Canonical surface normalization: lower → collapse whitespace → trim."""
    out = pc.utf8_lower(arr)
    out = pc.replace_substring_regex(out, r"\s+", " ")
    return pc.utf8_trim_whitespace(out)


def splice_markers(
    text: pa.Array,
    start: pa.Array,
    end: pa.Array,
    start_token: str = "[START_ENT]",
    end_token: str = "[END_ENT]",
) -> pa.Array:
    """``text[:start] + start_token + surface + end_token + text[end:]``.

    The reference splices mention markers into paragraph text before encoding
    (``mix_blink/data/dataset.py:85``).  Offsets are half-open byte offsets,
    reference convention ``mix_blink/data/dataset.py:13-16`` (byte == char for
    ASCII).
    """
    import numpy as np

    from .hashing import flat_utf8, gather_substrings

    n = len(text)
    data, off = flat_utf8(text)
    s_abs = off[:-1] + np.asarray(start, dtype=np.int64)
    e_abs = off[:-1] + np.asarray(end, dtype=np.int64)
    before = gather_substrings(data, off[:-1], s_abs)
    mention = gather_substrings(data, s_abs, e_abs)
    after = gather_substrings(data, e_abs, off[1:])
    return pc.binary_join_element_wise(
        before,
        pa.array([start_token] * n, pa.large_string()),
        mention,
        pa.array([end_token] * n, pa.large_string()),
        after,
        "",
    )


def compose_description(
    name: pa.Array, description: pa.Array, entity_token: str = "[ENT]"
) -> pa.Array:
    """``name + entity_token + (description or "{name} is an entity in this dictionary.")``.

    Reference semantics: ``mix_blink/data/dictionary.py:99-103`` (default text
    at ``dictionary.py:101``).
    """
    n = len(name)
    default = pc.binary_join_element_wise(name, pa.array([" is an entity in this dictionary."] * n), "")
    empty = pc.or_(pc.is_null(description), pc.equal(description, ""))
    desc = pc.if_else(empty, default, description)
    return pc.binary_join_element_wise(name, pa.array([entity_token] * n), desc, "")


def word_tokens(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace word tokens as a list<string> column (lowercased)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.utf8_split_whitespace(pc.utf8_lower(arr))

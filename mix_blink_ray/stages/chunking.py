"""Document chunking for training-data pipelines.

Long documents are split into fixed-token-count windows with overlap — the
standard pre-tokenization step before packing sequences for LLM training.
The operator is a pure per-batch ``map_batches`` flat-map (no shuffle, no
state): at 100 TB every worker chunks its own blocks independently and the
output streams straight to the next stage or a partitioned parquet sink.

Vectorization: tokens come from one Arrow ``utf8_split_whitespace`` per
batch; every chunk's token-index range is materialized with the standard
"concatenated-aranges" trick (``arange(total) - repeat(chunk_offsets) +
repeat(chunk_starts)``) so there is no per-row or per-chunk Python in the
hot path; chunk text is re-joined with one ``binary_join`` kernel.

Tokenization contract matches the vocabulary suite (``stages/vocab.py``):
whitespace runs collapse, so ``chunk_text`` is the single-space join of the
window's tokens — the SQL twin is ``array_to_string(list_slice(toks, s+1,
s+W), ' ')`` over ``regexp_split_to_array(trim(text), '\\s+')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

__all__ = ["chunk_batch", "chunk_documents"]


def chunk_batch(
    batch: pa.Table,
    chunk_tokens: int = 50,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Chunk one Arrow batch: rows ``(doc_id, chunk_idx, chunk_text,
    n_tokens)``.  Window starts are ``0, stride, 2·stride, …`` while
    ``start < n_tokens`` (``stride = chunk_tokens - overlap``), so every
    token is covered, consecutive chunks share ``overlap`` tokens, and a
    short document yields exactly one chunk.  Empty / whitespace-only
    documents yield no rows."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap={overlap} must be < chunk_tokens={chunk_tokens}")
    stride = chunk_tokens - overlap
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    # Whitespace-only / null documents have no tokens: drop them up front
    # (split_whitespace of "" yields [''] — one empty token — on both Arrow
    # and DuckDB, which would otherwise emit a bogus empty chunk).
    trimmed = pc.utf8_trim_whitespace(batch[text_col])
    keep = pc.and_kleene(pc.is_valid(trimmed), pc.not_equal(trimmed, pa.scalar("")))
    batch = batch.filter(pc.fill_null(keep, False))
    if batch.num_rows == 0:
        return empty
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(batch[text_col]))
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    row_off = np.asarray(toks.offsets, dtype=np.int64)
    counts = row_off[1:] - row_off[:-1]

    # chunks per row, then one global row index per chunk
    n_chunks = np.where(counts > 0, (np.maximum(counts - 1, 0) // stride) + 1, 0)
    total_chunks = int(n_chunks.sum())
    if total_chunks == 0:
        return empty
    chunk_row = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_chunks)
    # intra-row chunk index: arange over each row's chunk run
    chunk_base = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_idx = np.arange(total_chunks, dtype=np.int64) - np.repeat(chunk_base, n_chunks)
    starts = chunk_idx * stride
    sizes = np.minimum(starts + chunk_tokens, counts[chunk_row]) - starts

    # concatenated aranges: global token indices of every chunk, in order
    tok_total = int(sizes.sum())
    size_base = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    flat_idx = (
        np.arange(tok_total, dtype=np.int64)
        - np.repeat(size_base, sizes)
        + np.repeat(row_off[:-1][chunk_row] + starts, sizes)
    )
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(sizes)]), pa.int32()),
        pc.take(toks.values, pa.array(flat_idx)),
    )
    return pa.table(
        {
            id_col: pc.take(batch[id_col], pa.array(chunk_row)),
            "chunk_idx": pa.array(chunk_idx),
            "chunk_text": pc.binary_join(chunk_lists, " "),
            "n_tokens": pa.array(sizes),
        }
    )


def chunk_documents(
    docs: Dataset,
    chunk_tokens: int = 50,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Distributed chunking: a stateless flat-map, one output row per window."""
    return docs.map_batches(
        lambda b: chunk_batch(b, chunk_tokens, overlap, text_col, id_col),
        batch_format="pyarrow",
    )

"""Corpus vocabulary operators: token counting with map-side combine,
document-frequency tables, per-document top terms, and an inverted index.

These are the groupby-heavy text primitives of a training-data pipeline
(vocabulary pruning, tf-based keyword extraction, postings for lookup).
Tokenization is the SAME whitespace split the rest of the engine uses
(``pc.utf8_split_whitespace`` after trim/lower), which the DuckDB oracles
replay as ``regexp_split_to_array(trim(lower(text)), '\\s+')`` — both RE2,
proven to agree by the ``docs_tokens`` hash-match.

Scale notes
-----------
``token_counts`` combines per batch with ``np.unique`` before the exchange,
so the shuffle carries ``vocab_size × n_blocks`` partial rows, not one row
per token occurrence.  ``doc_frequencies`` dedups (token, doc) pairs per
batch first (documents do not span batches — one row per document), so the
exchange carries distinct pairs only.  ``top_terms_per_doc`` broadcasts the
df table (``ray.put`` once, read per actor) and ranks inside the batch —
no per-doc shuffle; the broadcast is guarded by ``max_broadcast_vocab``
because a 100 TB corpus's raw vocabulary can exceed worker memory (the
documented fallback is df-pruning: terms with df < floor are never top
terms of interest and the prune happens before the broadcast).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

__all__ = [
    "tokenize_batch",
    "token_counts",
    "doc_frequencies",
    "top_terms_per_doc",
    "inverted_index",
]


def tokenize_batch(texts: pa.ChunkedArray | pa.Array, lower: bool = True) -> pa.ListArray:
    """Whitespace tokens per row (list<string>), engine-standard semantics."""
    t = pc.utf8_trim_whitespace(texts)
    if lower:
        t = pc.utf8_lower(t)
    toks = pc.utf8_split_whitespace(t)
    return toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks


def _explode(b: pa.Table, id_col: str, text_col: str, lower: bool) -> tuple[np.ndarray, np.ndarray]:
    """Exploded (doc_ids, tokens) as numpy arrays (empty-safe)."""
    if b.num_rows == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=object)
    toks = tokenize_batch(b[text_col], lower=lower)
    ids = pc.take(b[id_col], pc.list_parent_indices(toks))
    flat = pc.cast(toks.flatten(), pa.string())
    return np.asarray(ids, dtype=np.int64), flat.to_numpy(zero_copy_only=False)


def token_counts(ds: Dataset, text_col: str = "text", lower: bool = True) -> Dataset:
    """(token, n) global counts.  Per-batch ``np.unique`` combine, then a
    small ``groupby(token).sum`` — the canonical pre-aggregated wordcount."""

    def partial(b: pa.Table) -> pa.Table:
        _, flat = _explode(b, b.column_names[0], text_col, lower)
        toks, counts = np.unique(flat, return_counts=True)
        return pa.table({"token": pa.array(toks, pa.string()), "n_partial": pa.array(counts.astype(np.int64))})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_partial", alias_name="n"))
    )


def doc_frequencies(ds: Dataset, id_col: str = "doc_id", text_col: str = "text", lower: bool = True) -> Dataset:
    """(token, df) — number of documents containing each token.  Pairs are
    deduped inside the batch (np.unique over the exploded pair set) so only
    distinct (token, doc) rows shuffle."""

    def distinct_pairs(b: pa.Table) -> pa.Table:
        dids, toks = _explode(b, id_col, text_col, lower)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), id_col: pa.array([], pa.int64())})
        # dedup within batch: documents are whole rows, so per-batch dedup is global-per-doc
        order = np.lexsort((dids, toks))
        toks, dids = toks[order], dids[order]
        keep = np.concatenate([[True], (toks[1:] != toks[:-1]) | (dids[1:] != dids[:-1])])
        return pa.table({"token": pa.array(toks[keep], pa.string()), id_col: pa.array(dids[keep])})

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="df"))
    )


def top_terms_per_doc(
    ds: Dataset,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    max_broadcast_vocab: int = 20_000_000,
) -> Dataset:
    """Per-document top-``k`` terms ranked by (tf DESC, df ASC, token ASC) —
    the integer-exact flavor of tf-idf keyword extraction (idf is monotone
    decreasing in df, so for FIXED tf the df-ascending tie-break is the
    tf-idf order; using raw integers keeps the oracle bit-exact with no
    float-log parity games).  Output: (doc_id, token, tf, df).

    The df table is broadcast (``ray.put`` once); above
    ``max_broadcast_vocab`` entries the caller must prune by df floor first
    (raise rather than silently shuffle per-token)."""
    df_tbl = pa.Table.from_pandas(doc_frequencies(ds, id_col, text_col, lower).to_pandas(), preserve_index=False)
    if df_tbl.num_rows > max_broadcast_vocab:
        raise ValueError(
            f"vocabulary {df_tbl.num_rows} exceeds max_broadcast_vocab={max_broadcast_vocab}; "
            "prune by df floor before ranking (see module docstring)"
        )
    vocab = pc.cast(df_tbl["token"], pa.string()).combine_chunks()
    dfs = pc.cast(df_tbl["df"], pa.int64()).combine_chunks()
    vocab_ref = ray.put(vocab)
    dfs_ref = ray.put(dfs)

    def rank(b: pa.Table) -> pa.Table:
        vc = ray.get(vocab_ref)
        dv = ray.get(dfs_ref)
        dids, toks = _explode(b, id_col, text_col, lower)
        if len(toks) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        # tf within batch == global tf (documents are whole rows)
        order = np.lexsort((toks, dids))
        toks, dids = toks[order], dids[order]
        new = np.concatenate([[True], (dids[1:] != dids[:-1]) | (toks[1:] != toks[:-1])])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(toks)))
        u_dids, u_toks = dids[starts], toks[starts]
        tok_arr = pa.array(u_toks, pa.string())
        df_idx = pc.index_in(tok_arr, value_set=vc).to_numpy(zero_copy_only=False)
        u_df = dv.to_numpy(zero_copy_only=False)[df_idx.astype(np.int64)]
        # per-doc top-k by (tf desc, df asc, token asc)
        sel = np.lexsort((u_toks, u_df, -tf, u_dids))
        d_sorted = u_dids[sel]
        change = np.flatnonzero(np.concatenate([[True], d_sorted[1:] != d_sorted[:-1]]))
        run_start = np.repeat(change, np.diff(np.append(change, len(d_sorted))))
        rank_in_doc = np.arange(len(d_sorted)) - run_start
        keep = sel[rank_in_doc < k]
        return pa.table(
            {
                id_col: pa.array(u_dids[keep]),
                "token": pa.array(u_toks[keep], pa.string()),
                "tf": pa.array(tf[keep]),
                "df": pa.array(u_df[keep]),
            }
        )

    return ds.map_batches(rank, batch_format="pyarrow")


def inverted_index(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text", lower: bool = True
) -> Dataset:
    """token → (df, comma-joined sorted posting list).  Distinct pairs are
    built map-side (see ``doc_frequencies``), then one ``groupby(token)``
    assembles each posting list.  Posting lists are strings so the result is
    hashable by the driver; at scale cap or shard hot tokens upstream (a
    stopword's posting list is the corpus — the df table tells you which
    tokens to exclude before assembly)."""

    def distinct_pairs(b: pa.Table) -> pa.Table:
        dids, toks = _explode(b, id_col, text_col, lower)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), id_col: pa.array([], pa.int64())})
        order = np.lexsort((dids, toks))
        toks, dids = toks[order], dids[order]
        keep = np.concatenate([[True], (toks[1:] != toks[:-1]) | (dids[1:] != dids[:-1])])
        return pa.table({"token": pa.array(toks[keep], pa.string()), id_col: pa.array(dids[keep])})

    def assemble(g: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(g[id_col], dtype=np.int64))
        return pa.table(
            {
                "token": g["token"].slice(0, 1),
                "df": pa.array([len(ids)], pa.int64()),
                "postings": pa.array([",".join(map(str, ids))], pa.string()),
            }
        )

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(assemble, batch_format="pyarrow")
    )

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
    "rarity_scores",
    "tfidf_search",
    "bigram_counts",
    "distinctive_tokens",
    "canopy_assignments",
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
    """(token, df) — number of documents containing each token.

    Two contractions before anything shuffles: distinct (token, doc) pairs
    per batch (documents are whole rows, so per-batch distinct is globally
    distinct per doc), then per-batch (token, n_partial) COUNTS — the
    shuffle moves batches × per-batch vocabulary int-count rows, never the
    pair set.  Partials merge through a token-hashed bucket exchange (one
    small-int64 sort key instead of a row-scale string range-sort) with one
    vectorized Arrow ``group_by`` per bucket — the ``distinct_pairs`` /
    ``grouped_run_pairs`` exchange shape."""
    from ..functions.hashing import flat_utf8, hash_strings

    empty_partial = pa.table(
        {"token": pa.array([], pa.string()), "n_partial": pa.array([], pa.int64())}
    )
    empty_df = pa.table({"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())})

    def partials(b: pa.Table) -> pa.Table:
        dids, toks = _explode(b, id_col, text_col, lower)
        if len(toks) == 0:
            return empty_partial
        order = np.lexsort((dids, toks))
        toks, dids = toks[order], dids[order]
        keep = np.concatenate([[True], (toks[1:] != toks[:-1]) | (dids[1:] != dids[:-1])])
        toks = toks[keep]
        starts = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]])
        cnt = np.diff(np.r_[starts, len(toks)])
        return pa.table(
            {
                "token": pa.array(toks[starts], pa.string()),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    n_buckets = max(256, 2 * int(ray.cluster_resources().get("CPU", 8))) if ray.is_initialized() else 256

    def add_bucket(b: pa.Table) -> pa.Table:
        col = b["token"].combine_chunks() if isinstance(b["token"], pa.ChunkedArray) else b["token"]
        h = hash_strings(*flat_utf8(col))
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def bucket_merge(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_bucket"])
        if g.num_rows == 0:
            return empty_df
        out = g.group_by("token").aggregate([("n_partial", "sum")])
        return pa.table(
            {"token": out["token"], "df": pc.cast(out["n_partial_sum"], pa.int64())}
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_merge, batch_format="pyarrow")
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


def rarity_scores(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    max_broadcast_vocab: int = 20_000_000,
) -> Dataset:
    """Per-document mean inverse token frequency — a CCNet-style rarity /
    quality proxy kept INTEGER-exact so the DuckDB oracle matches bitwise
    (a float unigram-LM surprisal would differ from DuckDB by libm ulps;
    measured: numpy and DuckDB ``log2`` disagree on ~15% of rationals).

    Per token: ``inv = total_tokens // corpus_count(token)`` (floor division,
    int64).  Per doc: ``rarity = sum(inv) / n_tokens`` — a same-integer f64
    division, order-independent.  Output: ``(doc_id, n_toks, inv_sum,
    rarity)``; docs with no tokens report 0 / 0 / 0.0.

    Two passes: a map-side-combined wordcount (``token_counts``), then a
    broadcast probe — the corpus never shuffles.  The vocabulary broadcast is
    guarded like ``top_terms_per_doc``; above the cap, prune low-count tail
    tokens into a sentinel bucket first (their ``inv`` saturates at
    ``total`` anyway)."""
    counts = pa.Table.from_pandas(token_counts(ds, text_col, lower).to_pandas(), preserve_index=False)
    if counts.num_rows > max_broadcast_vocab:
        raise ValueError(
            f"vocabulary {counts.num_rows} exceeds max_broadcast_vocab={max_broadcast_vocab}; "
            "prune the low-count tail before scoring (see docstring)"
        )
    vocab_pa = pc.cast(counts["token"], pa.string()).combine_chunks()
    cnt_np = np.asarray(counts["n"], dtype=np.int64)
    total = int(cnt_np.sum())
    inv_np = total // cnt_np  # int64 floor division, exact
    vocab_ref = ray.put(vocab_pa)
    inv_ref = ray.put(inv_np)

    def score(b: pa.Table) -> pa.Table:
        vc, iv = ray.get(vocab_ref), ray.get(inv_ref)
        dids, toks = _explode(b, id_col, text_col, lower)
        ids = np.asarray(b[id_col], dtype=np.int64)
        o = np.argsort(ids, kind="stable")
        pos = o[np.searchsorted(ids[o], dids)] if len(toks) else np.zeros(0, np.int64)
        if len(toks):
            vi = pc.fill_null(pc.index_in(pa.array(toks, pa.string()), value_set=vc), -1)
            vi = vi.to_numpy(zero_copy_only=False).astype(np.int64)
            # unseen token (reuse on other data): rarest possible (inv = total)
            inv = np.where(vi >= 0, iv[np.maximum(vi, 0)], total)
        else:
            inv = np.zeros(0, dtype=np.int64)
        n_toks = np.bincount(pos, minlength=b.num_rows).astype(np.int64)
        inv_sum = np.zeros(b.num_rows, dtype=np.int64)  # exact int64 (float
        np.add.at(inv_sum, pos, inv)  # bincount weights would round > 2^53)
        rarity = np.divide(inv_sum, n_toks, out=np.zeros(len(n_toks)), where=n_toks > 0)
        return pa.table(
            {
                id_col: b[id_col],
                "n_toks": pa.array(n_toks),
                "inv_sum": pa.array(inv_sum),
                "rarity": pa.array(rarity, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_search(
    ds: Dataset,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
) -> pa.Table:
    """Top-``k`` documents for a term query by integer tf-idf:
    ``score(doc) = Σ_terms tf(term, doc) · ((N_docs · 1000) // df(term))``.

    The idf is integer-quantized (``· 1000 //``) instead of ``log(N/df)`` so
    the score is exact across engines (log is monotone in N/df, so for a
    FIXED query the integer reciprocal preserves per-term ranking; the usual
    float BM25 drops in transparently where cross-engine bit-parity is not a
    requirement).  Execution: one tiny stats pass (per-batch partial df for
    the ≤ dozens of query terms + doc-count partials — a few int rows per
    batch reach the driver), then a scoring pass with the per-term idf
    broadcast inside the closure, then the engine's partial top-k merge
    (never a global sort).  Returns ``(doc_id, score)``, score > 0 only,
    ties broken by ``doc_id`` ascending."""
    qt = sorted({t for t in (query.lower() if lower else query).split()})
    if not qt:
        raise ValueError("query has no terms")
    qarr = np.array(qt, dtype=object)

    def stats(b: pa.Table) -> pa.Table:
        dids, toks = _explode(b, id_col, text_col, lower)
        dfp = np.zeros(len(qt), dtype=np.int64)
        if len(toks):
            for j, term in enumerate(qt):
                dfp[j] = len(np.unique(dids[toks == term]))
        return pa.table(
            {
                "j": pa.array(np.arange(len(qt) + 1, dtype=np.int64)),
                "c": pa.array(np.append(dfp, np.int64(b.num_rows))),
            }
        )

    agg = (
        ds.map_batches(stats, batch_format="pyarrow").groupby("j").aggregate(Sum("c", alias_name="c")).to_pandas()
    )
    agg = agg.sort_values("j").reset_index(drop=True)
    dfs = agg["c"].to_numpy()[: len(qt)].astype(np.int64)
    n_docs = int(agg["c"].to_numpy()[len(qt)])
    live = dfs > 0
    idf = np.zeros(len(qt), dtype=np.int64)
    idf[live] = (n_docs * 1000) // dfs[live]

    def score(b: pa.Table) -> pa.Table:
        dids, toks = _explode(b, id_col, text_col, lower)
        ids = np.asarray(b[id_col], dtype=np.int64)
        o = np.argsort(ids, kind="stable")
        pos = o[np.searchsorted(ids[o], dids)] if len(toks) else np.zeros(0, np.int64)
        sc = np.zeros(b.num_rows, dtype=np.int64)
        for j, term in enumerate(qt):
            if idf[j] == 0:
                continue
            m = toks == term
            if m.any():
                sc += np.bincount(pos[m], minlength=b.num_rows).astype(np.int64) * idf[j]
        keep = sc > 0
        return pa.table({id_col: pa.array(ids[keep]), "score": pa.array(sc[keep])})

    from .topk import topk_rows

    scored = ds.map_batches(score, batch_format="pyarrow")
    return topk_rows(scored, ["score", id_col], [True, False], k)


def bigram_counts(ds: Dataset, text_col: str = "text", lower: bool = True) -> Dataset:
    """(bigram, n) corpus counts of adjacent token pairs — the collocation /
    first-BPE-merge statistic.  The pair strings are built with one Arrow
    ``binary_join_element_wise`` over two shifted views of the flat token
    buffer (no Python per-pair), deduped per batch with ``np.unique`` before
    the exchange (same map-side-combine contract as :func:`token_counts`)."""

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"bigram": pa.array([], pa.string()), "n_partial": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = tokenize_batch(b[text_col], lower=lower)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        flat = pc.cast(toks.flatten(), pa.string())
        m = len(flat) - 1
        if m <= 0:
            return empty
        joined = pc.binary_join_element_wise(flat.slice(0, m), flat.slice(1, m), " ")
        starts = np.arange(m, dtype=np.int64)
        row = np.searchsorted(off, starts, side="right") - 1
        valid = (starts + 2) <= off[row + 1]
        grams = joined.to_numpy(zero_copy_only=False)[valid]
        u, c = np.unique(grams, return_counts=True)
        return pa.table({"bigram": pa.array(u, pa.string()), "n_partial": pa.array(c.astype(np.int64))})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n_partial", alias_name="n"))
    )


def distinctive_tokens(
    ds: Dataset,
    k: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    lower: bool = True,
    max_broadcast_vocab: int = 20_000_000,
) -> Dataset:
    """Per-group top-``k`` distinctive tokens by integer lift
    ``(tf_g · total · 1000) // (ctf · g_total)`` — the ratio of a token's
    in-group rate to its corpus rate, kept in int64 so the oracle is exact
    (a float log-lift would hit the libm parity wall; see ``rarity_scores``).

    Shuffle ∝ distinct (group, token) cells, never rows: per-batch combined
    cell counts → one groupby; the corpus-count side re-aggregates FROM the
    cell table (no second corpus pass) and broadcasts under the vocab guard;
    per-group ranking contracts map-side to ≤ k rows per group per batch
    before a final ≤ k·blocks-per-group merge."""

    def cells(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "tf_partial": pa.array([], pa.int64()),
                }
            )
        toks = tokenize_batch(b[text_col], lower=lower)
        grp = pc.take(b[group_col], pc.list_parent_indices(toks)).to_numpy(zero_copy_only=False)
        flat = pc.cast(toks.flatten(), pa.string()).to_numpy(zero_copy_only=False)
        order = np.lexsort((flat, grp))
        grp, flat = grp[order], flat[order]
        new = np.concatenate([[True], (grp[1:] != grp[:-1]) | (flat[1:] != flat[:-1])])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(grp)))
        return pa.table(
            {
                group_col: pa.array(grp[starts], pa.string()),
                "token": pa.array(flat[starts], pa.string()),
                "tf_partial": pa.array(tf.astype(np.int64)),
            }
        )

    grouped = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby([group_col, "token"])
        .aggregate(Sum("tf_partial", alias_name="tf"))
        .materialize()
    )
    ct_tbl = pa.Table.from_pandas(
        grouped.groupby("token").aggregate(Sum("tf", alias_name="ctf")).to_pandas(), preserve_index=False
    )
    if ct_tbl.num_rows > max_broadcast_vocab:
        raise ValueError(
            f"vocabulary {ct_tbl.num_rows} exceeds max_broadcast_vocab={max_broadcast_vocab}; "
            "prune the low-count tail first (tail tokens are never top-lift candidates of interest)"
        )
    stot = {
        r[group_col]: int(r["g_total"])
        for r in grouped.groupby(group_col)
        .aggregate(Sum("tf", alias_name="g_total"))
        .to_pandas()
        .to_dict("records")
    }
    total = int(sum(stot.values()))
    max_tf = int(np.asarray(ct_tbl["ctf"], dtype=np.int64).max(initial=0))
    if max_tf * total * 1000 >= 2**63:  # Python ints: exact overflow check
        raise ValueError(
            "lift numerator would overflow int64 at this corpus size; "
            "rescale the 1000 quantizer or pre-divide total (keep it integer)"
        )
    vocab = pc.cast(ct_tbl["token"], pa.string()).combine_chunks()
    ctf = np.asarray(ct_tbl["ctf"], dtype=np.int64)
    vocab_ref = ray.put(vocab)
    ctf_ref = ray.put(ctf)

    def rank_partial(b: pa.Table) -> pa.Table:
        vc, cf = ray.get(vocab_ref), ray.get(ctf_ref)
        if b.num_rows == 0:
            return b.append_column("lift_q", pa.array([], pa.int64()))
        grp = b[group_col].to_numpy(zero_copy_only=False)
        tok = b["token"].to_numpy(zero_copy_only=False)
        tf = np.asarray(b["tf"], dtype=np.int64)
        vi = pc.index_in(pa.array(tok, pa.string()), value_set=vc).to_numpy(zero_copy_only=False)
        c = cf[np.asarray(vi, dtype=np.int64)]
        gt = np.array([stot[g] for g in grp], dtype=np.int64)
        lift = (tf * total * 1000) // (c * gt)
        # per-batch per-group top-k contraction (lift desc, token asc)
        sel = np.lexsort((tok, -lift, grp))
        g_sorted = grp[sel]
        change = np.flatnonzero(np.concatenate([[True], g_sorted[1:] != g_sorted[:-1]]))
        run_start = np.repeat(change, np.diff(np.append(change, len(g_sorted))))
        keep = sel[np.arange(len(sel)) - run_start < k]
        return pa.table(
            {
                group_col: pa.array(grp[keep], pa.string()),
                "token": pa.array(tok[keep], pa.string()),
                "tf": pa.array(tf[keep]),
                "lift_q": pa.array(lift[keep]),
            }
        )

    def top_final(g: pa.Table) -> pa.Table:
        tok = g["token"].to_numpy(zero_copy_only=False)
        lift = np.asarray(g["lift_q"], dtype=np.int64)
        sel = np.lexsort((tok, -lift))[:k]
        return g.take(pa.array(np.sort(sel)))

    return (
        grouped.map_batches(rank_partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(top_final, batch_format="pyarrow")
    )


def canopy_assignments(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    max_broadcast_vocab: int = 20_000_000,
) -> Dataset:
    """Canopy-clustering assignment (McCallum/Nigam/Ungar, KDD'00) with a
    deterministic cheap distance: every document joins the canopy of its
    RAREST token — min (df, token) lexicographic, so the canopy key is a
    pure function of the corpus and replays exactly (ties by token string:
    binary order, which equals numpy's code-point order on this corpus's
    ASCII tokens — the band-key caveat class, documented not hidden).
    Canopies from rarest tokens are the classic blocking prior for an
    expensive within-canopy comparison stage: rare terms are discriminative,
    so canopies stay small where it matters (df = 1 ⇒ a singleton canopy).

    Shape: the df table broadcasts ONCE (``ray.put``; above
    ``max_broadcast_vocab`` this RAISES — prune by df floor first, the
    ``top_terms_per_doc`` convention), the per-doc argmin is pure map-side
    numpy (documents are whole rows, so no doc-keyed exchange exists at
    all), canopy sizes contract map-side to (token, count) cells before one
    canopy-scale groupby, and sizes gather back onto assignments by a
    second broadcast.  Output: (doc_id, canopy_token, canopy_df,
    canopy_size)."""
    df_tbl = pa.Table.from_pandas(
        doc_frequencies(ds, id_col, text_col, lower).to_pandas(), preserve_index=False
    )
    if df_tbl.num_rows > max_broadcast_vocab:
        raise ValueError(
            f"vocabulary {df_tbl.num_rows} exceeds max_broadcast_vocab={max_broadcast_vocab}; "
            "prune by df floor before canopy assignment"
        )
    vocab = pc.cast(df_tbl["token"], pa.string()).combine_chunks()
    dfs = pc.cast(df_tbl["df"], pa.int64()).combine_chunks()
    vocab_ref = ray.put(vocab)
    dfs_ref = ray.put(dfs)
    empty_assign = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "canopy_token": pa.array([], pa.string()),
            "canopy_df": pa.array([], pa.int64()),
        }
    )

    def assign(b: pa.Table) -> pa.Table:
        vc = ray.get(vocab_ref)
        dv = ray.get(dfs_ref)
        dids, toks = _explode(b, id_col, text_col, lower)
        if len(toks) == 0:
            return empty_assign
        # distinct (doc, token) then argmin by (df, token) per doc run
        order = np.lexsort((toks, dids))
        toks, dids = toks[order], dids[order]
        keep = np.concatenate([[True], (dids[1:] != dids[:-1]) | (toks[1:] != toks[:-1])])
        toks, dids = toks[keep], dids[keep]
        df_idx = pc.index_in(pa.array(toks, pa.string()), value_set=vc).to_numpy(
            zero_copy_only=False
        )
        u_df = dv.to_numpy(zero_copy_only=False)[df_idx.astype(np.int64)]
        sel = np.lexsort((toks, u_df, dids))
        d_sorted = dids[sel]
        first = np.concatenate([[True], d_sorted[1:] != d_sorted[:-1]])
        pick = sel[first]
        return pa.table(
            {
                id_col: pa.array(dids[pick]),
                "canopy_token": pa.array(toks[pick], pa.string()),
                "canopy_df": pa.array(u_df[pick]),
            }
        )

    assigns = ds.map_batches(assign, batch_format="pyarrow").materialize()

    def size_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"canopy_token": pa.array([], pa.string()), "n_partial": pa.array([], pa.int64())}
            )
        u, cnt = np.unique(b["canopy_token"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"canopy_token": pa.array(u, pa.string()), "n_partial": pa.array(cnt.astype(np.int64))}
        )

    sizes = pa.Table.from_pandas(
        assigns.map_batches(size_partial, batch_format="pyarrow")
        .groupby("canopy_token")
        .aggregate(Sum("n_partial", alias_name="canopy_size"))
        .to_pandas(),
        preserve_index=False,
    )
    sz_tok = pc.cast(sizes["canopy_token"], pa.string()).combine_chunks()
    sz_n = pc.cast(sizes["canopy_size"], pa.int64()).combine_chunks()
    sz_tok_ref, sz_n_ref = ray.put(sz_tok), ray.put(sz_n)

    def attach_size(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("canopy_size", pa.array([], pa.int64()))
        st, sn = ray.get(sz_tok_ref), ray.get(sz_n_ref)
        pos = pc.index_in(b["canopy_token"], value_set=st)
        return b.append_column("canopy_size", pc.take(sn, pos))

    return assigns.map_batches(attach_size, batch_format="pyarrow")

"""Bigram language-model scoring for data curation.

Two classic web-corpus operators reduced to their distributable cores:

- **CCNet-style perplexity filtering** (Wenzek et al. 2020,
  arXiv:1911.00359): score documents with an n-gram LM, bucket/filter by
  perplexity — :func:`bigram_lm_scores`.
- **DSIR importance weighting** (Xie et al. 2023, arXiv:2302.03169): weight
  each raw document by ``log p_target(x) − log p_raw(x)`` under two hashed
  n-gram LMs so raw data can be importance-resampled toward a target
  distribution — :func:`dsir_log_importance`.

Shape shared by both:

1. COUNT pass per model: per-batch (token, n) unigram partials and
   ("w1 w2", n) bigram partials contract map-side (Arrow group_by), then one
   ``groupby.aggregate(Sum)`` — shuffle ∝ distinct grams, never corpus
   size.  Grams travel as strings so a SQL oracle replays them verbatim
   (the ``token_ngram_blocks`` trade-off; a production run would hash to
   u64 first — same topology, 1/10 the bytes).
2. SCORE pass, one of two topologies picked by model size:

   - **Broadcast** (vocabulary ≤ ``max_vocab`` entries): count tables
     broadcast ONCE (``ray.put``), every batch scores its bigrams
     vectorized — Laplace-smoothed NLL ``−ln((c(w1 w2) + k) / (c(w1) +
     k·V))`` with one ``pc.index_in`` lookup per side, summed per document.
   - **Partitioned-join** (above the cap — the 100-TB path, so the
     operator no longer refuses on web-scale vocabularies): per-doc
     distinct ``(doc, w1, bigram, occ)`` cells flow through left-outer
     partitioned joins against the count Dataset (shuffle ∝ cells +
     distinct grams; NO driver-side model table), the smoothed NLL term is
     computed per cell × occurrence count, and one ``groupby(doc)`` sums
     per document.  Identical terms to the broadcast path — the only
     difference is float summation order, absorbed by the oracle's 6-dp
     rounding (forced-low-cap parity test in ``tests/test_lm.py``).

   Unseen grams (cross-corpus scoring) fall back to the smoothing mass —
   count 0 — on both paths (``fill_null(0)`` after the left-outer join is
   the join-path spelling of the broadcast path's ``index_in`` miss).

Everything is float64 arithmetic a DuckDB oracle reproduces term by term.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = [
    "bigram_lm_scores",
    "dsir_log_importance",
    "train_bigram_counts",
    "train_bigram_model",
]


def _doc_bigrams(b: pa.Table, text_col: str, id_col: str):
    """Per-batch (doc_id, w1, bigram, all_tokens) arrays — shifted-view
    join, no per-gram Python (the ``token_ngram_blocks`` construction,
    undeduped because the LM needs every occurrence).  Whitespace-only
    documents drop FIRST (``tokenize_batch`` would otherwise emit one
    empty-string token, silently inflating V vs the oracle's
    ``trim(text) <> ''`` filter)."""
    from .vocab import tokenize_batch

    b = b.filter(pc.not_equal(pc.utf8_trim_whitespace(b[text_col]), ""))
    toks = tokenize_batch(b[text_col], lower=True)
    off = np.asarray(toks.offsets, dtype=np.int64)
    off = off - off[0]
    flat = pc.cast(toks.flatten(), pa.string())
    m = len(flat) - 1
    if m <= 0:
        return None
    joined = pc.binary_join_element_wise(flat.slice(0, m), flat.slice(1, m), " ")
    starts = np.arange(m, dtype=np.int64)
    row = np.searchsorted(off, starts, side="right") - 1
    valid = (starts + 2) <= off[row + 1]  # bigram must not cross a row
    idx = pa.array(np.flatnonzero(valid))
    dids = np.asarray(b[id_col], dtype=np.int64)[row[valid]]
    return dids, pc.take(flat.slice(0, m), idx), pc.take(joined, idx), flat


def train_bigram_counts(
    corpus: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[Dataset, int, int]:
    """Distributed bigram/unigram counting — the shared COUNT pass.

    Returns ``(counts, n_vocab, n_entries)``: a materialized Dataset with
    schema ``(gram: string, is_bigram: bool, n: int64)``, the unigram
    vocabulary size V, and the total entry count (used to pick the scoring
    topology).  Never pulls the table to the driver."""

    def count_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "is_bigram": pa.array([], pa.bool_()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        parts = _doc_bigrams(b, text_col, id_col)
        if parts is None:
            from .vocab import tokenize_batch

            b = b.filter(pc.not_equal(pc.utf8_trim_whitespace(b[text_col]), ""))
            flat = pc.cast(tokenize_batch(b[text_col], lower=True).flatten(), pa.string())
            if len(flat) == 0:
                return empty
            uni = pa.table({"gram": flat}).group_by("gram").aggregate([("gram", "count")])
            return pa.table(
                {
                    "gram": uni["gram"],
                    "is_bigram": pa.array([False] * uni.num_rows),
                    "n_partial": pc.cast(uni["gram_count"], pa.int64()),
                }
            )
        _, _, bigrams, flat = parts
        uni = pa.table({"gram": flat}).group_by("gram").aggregate([("gram", "count")])
        bi = pa.table({"gram": bigrams}).group_by("gram").aggregate([("gram", "count")])
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "gram": uni["gram"],
                        "is_bigram": pa.array(np.zeros(uni.num_rows, dtype=bool)),
                        "n_partial": pc.cast(uni["gram_count"], pa.int64()),
                    }
                ),
                pa.table(
                    {
                        "gram": bi["gram"],
                        "is_bigram": pa.array(np.ones(bi.num_rows, dtype=bool)),
                        "n_partial": pc.cast(bi["gram_count"], pa.int64()),
                    }
                ),
            ]
        )

    counts = (
        corpus.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["gram", "is_bigram"])
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()
    )
    n_entries = counts.count()

    def vocab_partial(b: pa.Table) -> pa.Table:
        nv = b.num_rows - int(pc.sum(pc.cast(b["is_bigram"], pa.int64())).as_py() or 0)
        return pa.table({"nv": pa.array([nv], pa.int64())})

    n_vocab = int(
        counts.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()["nv"].sum()
    )
    return counts, n_vocab, n_entries


def _pull_model(counts: Dataset):
    """Collect a (small) count Dataset into the broadcastable model tuple
    ``(uni_grams, uni_counts, bi_grams, bi_counts, V)``."""
    import ray

    tabs = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        e = pa.array([], pa.string())
        return (e, np.zeros(0, dtype=np.int64), e, np.zeros(0, dtype=np.int64), 0)
    tbl = pa.concat_tables(tabs)
    is_bi = np.asarray(tbl["is_bigram"], dtype=bool)
    uni_tbl = tbl.filter(pa.array(~is_bi))
    bi_tbl = tbl.filter(pa.array(is_bi))
    return (
        uni_tbl["gram"].combine_chunks(),
        np.asarray(uni_tbl["n"], dtype=np.int64),
        bi_tbl["gram"].combine_chunks(),
        np.asarray(bi_tbl["n"], dtype=np.int64),
        uni_tbl.num_rows,
    )


def train_bigram_model(
    corpus: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 20_000_000,
):
    """Distributed counts → one broadcastable model tuple
    ``(uni_grams, uni_counts, bi_grams, bi_counts, V)``.  RAISES above
    ``max_vocab`` distinct entries — this constructor's whole contract is a
    driver-resident table; callers who must scale past the cap use the
    scoring entry points, which switch to the partitioned-join topology
    instead of materializing a model at all."""
    counts, _, n_entries = train_bigram_counts(corpus, text_col, id_col)
    if n_entries > max_vocab:
        raise ValueError(
            f"bigram LM vocabulary ({n_entries} entries) exceeds the broadcast "
            f"cap ({max_vocab}); use bigram_lm_scores/dsir_log_importance "
            "(partitioned-join scoring) or hash the grams "
            "(functions/hashing.py token_ngram_hashes) before scoring"
        )
    return _pull_model(counts)


def _model_nll(model, w1: pa.Array, bigrams: pa.Array, k: float) -> np.ndarray:
    """Vectorized per-bigram Laplace NLL under one broadcast model; grams
    unseen by the model (cross-corpus scoring) take count 0."""
    uni_g, uni_n, bi_g, bi_n, n_vocab = model
    up = np.asarray(pc.fill_null(pc.index_in(w1, value_set=uni_g), -1), dtype=np.int64)
    bp = np.asarray(pc.fill_null(pc.index_in(bigrams, value_set=bi_g), -1), dtype=np.int64)
    uc = np.where(up >= 0, uni_n[np.maximum(up, 0)], 0)
    bc = np.where(bp >= 0, bi_n[np.maximum(bp, 0)], 0)
    return -np.log((bc + k) / (uc + k * n_vocab))


def _per_doc(dids: np.ndarray):
    """Stable doc grouping for segment reduces: (ids, seg_starts, seg_lens,
    sort order)."""
    order = np.argsort(dids, kind="stable")
    sd = dids[order]
    starts = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1]])
    ns = np.diff(np.r_[starts, len(sd)])
    return sd[starts], starts, ns, order


# ---------------------------------------------------------------------------
# Partitioned-join scoring (the above-cap / 100-TB topology)
# ---------------------------------------------------------------------------


def _gram_cells(docs: Dataset, text_col: str, id_col: str) -> Dataset:
    """Per-document distinct bigram cells ``(doc, w1, bigram, occ)`` — the
    contracted unit the join topology shuffles (∝ per-doc distinct bigrams,
    never raw occurrences)."""

    def cells(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "w1": pa.array([], pa.string()),
                "bigram": pa.array([], pa.string()),
                "occ": pa.array([], pa.int64()),
            }
        )
        parts = _doc_bigrams(b, text_col, id_col)
        if parts is None:
            return empty
        dids, w1, bigrams, _ = parts
        if len(dids) == 0:
            return empty
        t = pa.table({id_col: pa.array(dids), "w1": w1, "bigram": bigrams})
        g = t.group_by([id_col, "w1", "bigram"]).aggregate([([], "count_all")])
        return pa.table(
            {
                id_col: g[id_col],
                "w1": g["w1"],
                "bigram": g["bigram"],
                "occ": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return docs.map_batches(cells, batch_format="pyarrow")


def _attach_model_counts(cells: Dataset, counts: Dataset, tag: str, n_parts: int) -> Dataset:
    """Left-outer partitioned joins attaching one model's counts to the
    cell rows as ``bc{tag}``/``uc{tag}`` (null = unseen gram = smoothing
    mass).  Ray 2.49's join keeps the LEFT key columns, so ``w1``/``bigram``
    survive for the next model's joins."""
    bi = counts.map_batches(
        lambda b: (lambda m: pa.table({"bigram": m["gram"], f"bc{tag}": m["n"]}))(
            b.filter(b["is_bigram"])
        ),
        batch_format="pyarrow",
    )
    uni = counts.map_batches(
        lambda b: (lambda m: pa.table({"w1": m["gram"], f"uc{tag}": m["n"]}))(
            b.filter(pc.invert(b["is_bigram"]))
        ),
        batch_format="pyarrow",
    )
    cells = cells.join(bi, join_type="left_outer", num_partitions=n_parts, on=("bigram",))
    return cells.join(uni, join_type="left_outer", num_partitions=n_parts, on=("w1",))


def _cell_nll(b: pa.Table, tag: str, k: float, n_vocab: int) -> np.ndarray:
    bc = np.asarray(pc.fill_null(b[f"bc{tag}"], 0), dtype=np.int64)
    uc = np.asarray(pc.fill_null(b[f"uc{tag}"], 0), dtype=np.int64)
    return -np.log((bc + k) / (uc + k * n_vocab))


def _empty_scores(id_col: str, value_col: str) -> Dataset:
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                value_col: pa.array([], pa.float64()),
            }
        )
    )


def _scored_cells(docs: Dataset, text_col: str, id_col: str, *side_counts: int):
    """Materialized cell table + the partition count its joins should use
    (``None`` cells means the corpus has no bigrams at all).  The partition
    count is clamped by the SMALLEST join side — the unigram/bigram count
    tables too, not just the cells — so no hash partition can go empty
    (Ray 2.49's empty-partition join bug, ``stages/clustering.py``)."""
    from .clustering import cpu_scaled_partitions

    cells = _gram_cells(docs, text_col, id_col).materialize()
    n_cells = cells.count()
    if n_cells == 0:
        return None, 0
    return cells, cpu_scaled_partitions(min(n_cells, *side_counts))


def bigram_lm_scores(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    max_vocab: int = 20_000_000,
) -> Dataset:
    """Per-document average bigram NLL under the corpus-trained Laplace-
    smoothed bigram LM (self-scoring: every lookup hits).  Returns
    ``(doc_id, n_bigrams, avg_nll)`` for every document with ≥ 1 bigram.

    Vocabularies up to ``max_vocab`` entries broadcast the count tables
    once; above the cap the operator switches to the partitioned-join
    topology (see module docstring) instead of refusing — the web-scale
    corpus whose vocabulary exceeds the cap is exactly the one that needs
    perplexity filtering most."""
    import ray

    counts, n_vocab, n_entries = train_bigram_counts(docs, text_col, id_col)

    if n_entries <= max_vocab:
        model_ref = ray.put(_pull_model(counts))

        def score(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "avg_nll": pa.array([], pa.float64()),
                }
            )
            parts = _doc_bigrams(b, text_col, id_col)
            if parts is None:
                return empty
            dids, w1, bigrams, _ = parts
            if len(dids) == 0:
                return empty
            nll = _model_nll(ray.get(model_ref), w1, bigrams, k)
            ids, starts, ns, order = _per_doc(dids)
            sums = np.add.reduceat(nll[order], starts)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "n_bigrams": pa.array(ns.astype(np.int64)),
                    "avg_nll": pa.array(sums / ns),
                }
            )

        # each ROW is one document, so per-batch grouping is exact (a doc_id
        # appears in exactly one row)
        return docs.map_batches(score, batch_format="pyarrow")

    cells, n_parts = _scored_cells(docs, text_col, id_col, n_vocab, n_entries - n_vocab)
    if cells is None:
        return _empty_scores(id_col, "avg_nll")
    cells = _attach_model_counts(cells, counts, "", n_parts)

    def cell_terms(b: pa.Table) -> pa.Table:
        occ = np.asarray(b["occ"], dtype=np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "occ": b["occ"],
                "nll_part": pa.array(occ * _cell_nll(b, "", k, n_vocab)),
            }
        )

    agg = (
        cells.map_batches(cell_terms, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("occ", alias_name="n_bigrams"), Sum("nll_part", alias_name="sum_nll"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": pc.cast(b["n_bigrams"], pa.int64()),
                "avg_nll": pa.array(
                    np.asarray(b["sum_nll"], dtype=np.float64)
                    / np.asarray(b["n_bigrams"], dtype=np.float64)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def dsir_log_importance(
    docs: Dataset,
    target_docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    max_vocab: int = 20_000_000,
) -> Dataset:
    """DSIR importance weights (Xie et al. 2023): per raw document,
    ``log_w = log p_target(x) − log p_raw(x) = nll_raw − nll_target`` under
    two Laplace bigram LMs — the target model trained on ``target_docs``,
    the raw model on ``docs`` itself.  Emits ``(doc_id, n_bigrams, log_w)``;
    downstream, ``stages/sampling.py``'s weighted sampler resamples by
    ``exp(log_w)``.  Grams absent from the target model take its smoothing
    mass (count 0) — the cross-corpus case self-scoring never hits.

    Both models up to ``max_vocab`` entries broadcast once with ONE scoring
    pass; if either exceeds the cap, both models stay distributed and the
    cell rows take four left-outer partitioned joins (raw + target ×
    bigram + unigram) — no driver-resident model either way."""
    import ray

    raw_counts, v_raw, n_raw = train_bigram_counts(docs, text_col, id_col)
    tgt_counts, v_tgt, n_tgt = train_bigram_counts(target_docs, text_col, id_col)

    if max(n_raw, n_tgt) <= max_vocab:
        raw_ref = ray.put(_pull_model(raw_counts))
        tgt_ref = ray.put(_pull_model(tgt_counts))

        def score(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "log_w": pa.array([], pa.float64()),
                }
            )
            parts = _doc_bigrams(b, text_col, id_col)
            if parts is None:
                return empty
            dids, w1, bigrams, _ = parts
            if len(dids) == 0:
                return empty
            nll_raw = _model_nll(ray.get(raw_ref), w1, bigrams, k)
            nll_tgt = _model_nll(ray.get(tgt_ref), w1, bigrams, k)
            ids, starts, ns, order = _per_doc(dids)
            sum_raw = np.add.reduceat(nll_raw[order], starts)
            sum_tgt = np.add.reduceat(nll_tgt[order], starts)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "n_bigrams": pa.array(ns.astype(np.int64)),
                    "log_w": pa.array(sum_raw - sum_tgt),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow")

    cells, n_parts = _scored_cells(
        docs, text_col, id_col, v_raw, n_raw - v_raw, v_tgt, n_tgt - v_tgt
    )
    if cells is None:
        return _empty_scores(id_col, "log_w")
    cells = _attach_model_counts(cells, raw_counts, "_r", n_parts)
    cells = _attach_model_counts(cells, tgt_counts, "_t", n_parts)

    def cell_terms(b: pa.Table) -> pa.Table:
        occ = np.asarray(b["occ"], dtype=np.int64)
        diff = _cell_nll(b, "_r", k, v_raw) - _cell_nll(b, "_t", k, v_tgt)
        return pa.table(
            {
                id_col: b[id_col],
                "occ": b["occ"],
                "w_part": pa.array(occ * diff),
            }
        )

    agg = (
        cells.map_batches(cell_terms, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("occ", alias_name="n_bigrams"), Sum("w_part", alias_name="sum_w"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": pc.cast(b["n_bigrams"], pa.int64()),
                "log_w": pa.array(np.asarray(b["sum_w"], dtype=np.float64)),
            }
        ),
        batch_format="pyarrow",
    )

"""Bigram language-model scoring for data curation.

Two classic web-corpus operators reduced to their distributable cores:

- **CCNet-style perplexity filtering** (Wenzek et al. 2020,
  arXiv:1911.00359): score documents with an n-gram LM, bucket/filter by
  perplexity — :func:`bigram_lm_scores`.
- **DSIR importance weighting** (Xie et al. 2023, arXiv:2302.03169): weight
  each raw document by ``log p_target(x) − log p_raw(x)`` under two hashed
  n-gram LMs so raw data can be importance-resampled toward a target
  distribution — :func:`dsir_log_importance` (both models broadcast, ONE
  scoring pass).

Shape shared by both:

1. COUNT pass per model: per-batch (token, n) unigram partials and
   ("w1 w2", n) bigram partials contract map-side (Arrow group_by), then one
   ``groupby.aggregate(Sum)`` — shuffle ∝ distinct grams, never corpus
   size.  Grams travel as strings so a SQL oracle replays them verbatim
   (the ``token_ngram_blocks`` trade-off; a production run would hash to
   u64 first — same topology, 1/10 the bytes).
2. SCORE pass: count tables broadcast ONCE (``ray.put``; counted guard
   RAISES above ``max_vocab`` entries, the ``stages/vocab.py`` rule — no
   silent degradation), every batch scores its bigrams vectorized:
   Laplace-smoothed NLL ``−ln((c(w1 w2) + k) / (c(w1) + k·V))`` with one
   ``pc.index_in`` lookup per side, summed per document.  Unseen grams
   (cross-corpus scoring) fall back to the smoothing mass — count 0.

Everything is float64 arithmetic a DuckDB oracle reproduces term by term.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

__all__ = ["bigram_lm_scores", "dsir_log_importance"]


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


def train_bigram_model(
    corpus: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 20_000_000,
):
    """Distributed bigram/unigram counts → one broadcastable model tuple
    ``(uni_grams, uni_counts, bi_grams, bi_counts, V)``.  RAISES above
    ``max_vocab`` distinct entries rather than degrading silently."""
    import ray

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
    if n_entries > max_vocab:
        raise ValueError(
            f"bigram LM vocabulary ({n_entries} entries) exceeds the broadcast "
            f"cap ({max_vocab}); shard the corpus or hash the grams "
            "(functions/hashing.py token_ngram_hashes) before scoring"
        )
    tbl = pa.concat_tables([t for t in ray.get(counts.to_arrow_refs()) if t.num_rows])
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


def bigram_lm_scores(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    max_vocab: int = 20_000_000,
) -> Dataset:
    """Per-document average bigram NLL under the corpus-trained Laplace-
    smoothed bigram LM (self-scoring: every lookup hits).  Returns
    ``(doc_id, n_bigrams, avg_nll)`` for every document with ≥ 1 bigram."""
    import ray

    model_ref = ray.put(train_bigram_model(docs, text_col, id_col, max_vocab))

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
    the raw model on ``docs`` itself.  Both models broadcast once; ONE
    scoring pass emits ``(doc_id, n_bigrams, log_w)``; downstream,
    ``stages/sampling.py``'s weighted sampler resamples by ``exp(log_w)``.
    Grams absent from the target model take its smoothing mass (count 0) —
    the cross-corpus case self-scoring never hits."""
    import ray

    raw_ref = ray.put(train_bigram_model(docs, text_col, id_col, max_vocab))
    tgt_ref = ray.put(train_bigram_model(target_docs, text_col, id_col, max_vocab))

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

"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — the per-document feature extractors a training-data
pipeline runs over every shard.

All are stateless ``map_batches`` bodies except :class:`LangId`, which
compiles its stopword tables once per actor (the actor-pool pattern: state in
``__init__``, work in ``__call__``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_stats",
    "quality_scores",
    "repetition_stats",
    "pack_next_fit",
    "fingerprint_md5",
    "LangId",
    "BPE_ISH_RE",
]

# A BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
# (the common GPT-2-style pre-tokenization shape, public knowledge).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "on", "with", "value", "key"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von", "nicht", "wert"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "avec", "pour", "valeur"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "con", "para", "valor"},
    "zh": set(),  # han-script detection below, not stopwords
}


def token_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """doc_id, n_chars, n_tokens (whitespace), n_bpe_tokens (BPE-ish regex)."""
    text = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(text)
    ws_tokens = pc.utf8_split_whitespace(trimmed)
    n_tokens = pc.list_value_length(ws_tokens)
    n_bpe = pc.count_substring_regex(text, BPE_ISH_RE)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
        }
    )


def quality_scores(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Heuristic quality features: length, punctuation ratio, stopword ratio,
    mean word length, and a combined [0,1] score (monotone heuristics in the
    C4/Gopher-rules family, public knowledge)."""
    text = pc.utf8_lower(batch[text_col])
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.float64)
    n_punct = np.asarray(pc.count_substring_regex(text, r"[^\w\s]"), dtype=np.float64)
    tokens = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
    n_tok = np.asarray(pc.list_value_length(tokens), dtype=np.float64)
    flat = tokens.combine_chunks().flatten() if isinstance(tokens, pa.ChunkedArray) else tokens.flatten()
    tok_len = np.asarray(pc.utf8_length(flat), dtype=np.float64)
    offs = np.asarray(
        (tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens).offsets,
        dtype=np.int64,
    )
    sums = np.add.reduceat(np.concatenate([tok_len, [0.0]]), offs[:-1] - offs[0]) if len(tok_len) else np.zeros(len(offs) - 1)
    sums = np.where(np.diff(offs) > 0, sums, 0.0)
    mean_wlen = sums / np.maximum(np.diff(offs), 1)

    stop = pa.array(sorted(set().union(*_STOPWORDS.values())), pa.string())
    is_stop = np.asarray(pc.is_in(flat, value_set=stop), dtype=np.float64)
    stop_counts = np.add.reduceat(np.concatenate([is_stop, [0.0]]), offs[:-1] - offs[0]) if len(is_stop) else np.zeros(len(offs) - 1)
    stop_counts = np.where(np.diff(offs) > 0, stop_counts, 0.0)
    stop_ratio = stop_counts / np.maximum(np.diff(offs), 1)

    punct_ratio = n_punct / np.maximum(n_chars, 1)
    length_score = np.clip(n_tok / 50.0, 0, 1)
    wlen_score = np.clip(1.0 - np.abs(mean_wlen - 5.0) / 5.0, 0, 1)
    score = 0.4 * length_score + 0.3 * (1.0 - punct_ratio) + 0.3 * wlen_score
    return pa.table(
        {
            id_col: batch[id_col],
            "punct_ratio": pa.array(punct_ratio),
            "stopword_ratio": pa.array(stop_ratio),
            "mean_word_len": pa.array(mean_wlen),
            "quality_score": pa.array(score),
        }
    )


def repetition_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Gopher-family repetition signals, exact and per document:

    - ``dup_token_frac``  = (n_tokens − n_distinct_tokens) / n_tokens
    - ``top_token_frac``  = occurrences of the most frequent token / n_tokens
    - ``top_bigram_frac`` = occurrences of the most frequent adjacent token
      bigram / (n_tokens − 1)  (0.0 when n_tokens < 2)

    Token identity comes from ``pc.dictionary_encode`` (collision-free integer
    codes), then every per-row statistic is segmented numpy over the flat code
    array — sort + run-length + ``reduceat``, no Python loop and no hashing
    approximation.  Pure per-row map: embarrassingly parallel at any scale.
    """
    text = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(text)
    tokens = pc.utf8_split_whitespace(trimmed)
    tokens = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    offs = np.asarray(tokens.offsets, dtype=np.int64)
    raw_lens = np.diff(offs)
    # Arrow splits "" into one empty token; a whitespace-only row has zero
    # tokens (its spurious code only feeds this row's own masked stats).
    lens = np.where(np.asarray(pc.utf8_length(trimmed), dtype=np.int64) > 0, raw_lens, 0)
    n = batch.num_rows
    flat = tokens.flatten()
    codes = np.asarray(pc.dictionary_encode(flat).indices, dtype=np.int64)
    v = int(codes.max()) + 1 if len(codes) else 1
    row_ids = np.repeat(np.arange(n, dtype=np.int64), raw_lens)

    def _per_row_max_and_distinct(keys: np.ndarray, rows: np.ndarray, modulus: int):
        """For composite keys ``rows * modulus + item``: per-row distinct-item
        count and per-row max item multiplicity."""
        if not len(keys):
            return np.zeros(n, dtype=np.int64), np.zeros(n, dtype=np.int64)
        uniq, counts = np.unique(rows * modulus + keys, return_counts=True)
        urows = uniq // modulus
        distinct = np.bincount(urows, minlength=n)
        # uniq is sorted ⇒ urows is non-decreasing; segment max via reduceat
        starts = np.flatnonzero(np.concatenate([[True], urows[1:] != urows[:-1]]))
        seg_max = np.maximum.reduceat(counts, starts)
        out_max = np.zeros(n, dtype=np.int64)
        out_max[urows[starts]] = seg_max
        return distinct, out_max

    distinct_tok, max_tok = _per_row_max_and_distinct(codes, row_ids, v)

    same_row = row_ids[:-1] == row_ids[1:] if len(codes) > 1 else np.zeros(0, dtype=bool)
    pair = codes[:-1][same_row] * v + codes[1:][same_row]
    # re-encode pairs so the composite (row, pair) key cannot overflow int64
    _, pcodes = np.unique(pair, return_inverse=True)
    p = int(pcodes.max()) + 1 if len(pcodes) else 1
    _, max_big = _per_row_max_and_distinct(pcodes, row_ids[:-1][same_row], p)

    lens_f = lens.astype(np.float64)
    dup_frac = np.where(lens > 0, (lens_f - distinct_tok) / np.maximum(lens_f, 1.0), 0.0)
    top_tok = np.where(lens > 0, max_tok / np.maximum(lens_f, 1.0), 0.0)
    top_big = np.where(lens >= 2, max_big / np.maximum(lens_f - 1.0, 1.0), 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(lens, pa.int64()),
            "dup_token_frac": pa.array(dup_frac),
            "top_token_frac": pa.array(top_tok),
            "top_bigram_frac": pa.array(top_big),
        }
    )


def pack_next_fit(lens: np.ndarray, budget: int) -> np.ndarray:
    """Next-fit sequence packing: assign consecutive documents to bins so
    each bin's token total stays ≤ ``budget`` (an oversize document gets a
    bin of its own) — the pre-training batch-packing step.

    Packing is inherently sequential (a document's bin depends on the fill
    left by every earlier one), so it can't be a two-phase scan; instead the
    loop here is over BINS, not documents — each bin boundary is one
    ``searchsorted`` into the prefix-sum array, O(bins · log n) with a
    vectorized interior.  At scale, pack per shard/group (bins never cross
    shards — standard practice), which is what ``queries.docs_pack_bins``
    does per ``source``.
    """
    lens = np.asarray(lens, dtype=np.int64)
    bins = np.zeros(len(lens), dtype=np.int64)
    if not len(lens):
        return bins
    cs = np.cumsum(lens)
    start, b, base = 0, 0, 0
    while start < len(lens):
        end = int(np.searchsorted(cs, base + budget, side="right"))
        if end <= start:  # oversize document: own bin
            end = start + 1
        bins[start:end] = b
        b += 1
        base = int(cs[end - 1])
        start = end
    return bins


def fingerprint_md5(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """md5 hex of the lowercased text — the SQL-parity content fingerprint
    (DuckDB ``md5(lower(text))``).  hashlib per row is C-speed; for the pure
    speed path use ``dedup.exact_dedup``'s 64-bit vectorized hash instead."""
    lowered = pc.utf8_lower(batch[text_col])
    fps = [hashlib.md5(s.encode()).hexdigest() for s in lowered.to_pylist()]
    return pa.table({id_col: batch[id_col], "fp": pa.array(fps, pa.string())})


class LangId:
    """Actor-pool language-ID: n-gram/stopword-vote heuristic.

    State (stopword Arrow sets per language) built once per actor
    (``__init__``), batches scored vectorized in ``__call__``.
    """

    def __init__(self) -> None:
        self.lang_sets = {
            lang: pa.array(sorted(words), pa.string())
            for lang, words in _STOPWORDS.items()
            if words
        }

    def __call__(self, batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
        text = pc.utf8_lower(batch[text_col])
        tokens = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        tokens = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        flat = tokens.flatten()
        offs = np.asarray(tokens.offsets, dtype=np.int64)
        seg = offs[:-1] - offs[0]
        n = batch.num_rows
        votes = np.zeros((n, len(self.lang_sets)), dtype=np.float64)
        langs = list(self.lang_sets)
        for j, lang in enumerate(langs):
            hit = np.asarray(pc.is_in(flat, value_set=self.lang_sets[lang]), dtype=np.float64)
            counts = np.add.reduceat(np.concatenate([hit, [0.0]]), seg) if len(hit) else np.zeros(n)
            votes[:, j] = np.where(np.diff(offs) > 0, counts, 0.0)
        # han-script share → zh
        han = np.asarray(pc.count_substring_regex(text, r"[一-鿿]"), dtype=np.float64)
        n_chars = np.asarray(pc.utf8_length(text), dtype=np.float64)
        best = votes.argmax(axis=1)
        has_vote = votes.max(axis=1) > 0
        pred = np.array([langs[b] for b in best], dtype=object)
        pred[~has_vote] = "unknown"
        pred[han / np.maximum(n_chars, 1) > 0.2] = "zh"
        return pa.table(
            {
                id_col: batch[id_col],
                "lang_pred": pa.array(pred, pa.string()),
            }
        )

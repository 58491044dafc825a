"""Distributed BPE tokenizer-merge training (Sennrich et al. 2016, ACL —
"Neural Machine Translation of Rare Words with Subword Units").

Training a subword tokenizer is a first-class step of a training-data
pipeline, and the classic algorithm is a K-round global argmax: count all
adjacent symbol pairs, merge the most frequent pair everywhere, repeat.  The
scale insight (same as the reference algorithm's own `get_vocab`): merges
operate on the DISTINCT-WORD frequency table, not the corpus — one corpus
pass builds ``(word, count)`` (``vocab.token_counts``: per-batch ``np.unique``
contraction + one groupby), and every subsequent round touches only the word
table, whose size is the vocabulary (millions of rows at 100 TB), not the
token stream (trillions).  Each round is then:

1. **pair-count partials** — per batch, adjacent symbol pairs weighted by
   word count, contracted in-batch with ``np.unique`` + exact int64 grouped
   sums (no float53 weights);
2. **one tiny shuffle** — ``groupby(pair).sum`` over distinct-pair cells;
3. **global argmax** — ``topk_rows`` (partial top-k per block, never a full
   sort) with the deterministic tie-break (max count, then lexicographically
   smallest pair);
4. **vectorized merge application** — leftmost-greedy pair replacement over
   the flattened symbol arrays (run-parity handles the aaa/aa overlap case),
   rebuilt as Arrow lists and re-materialized so lineage stays flat across
   rounds.

The merge SEQUENCE is deterministic and layout-invariant (asserted), and
matches an independently-written single-process reference implementation in
``tests/test_bpe.py`` — the oracle for an iterative global-argmax SQL cannot
express.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.numeric import group_sums_int64

__all__ = ["bpe_train", "bpe_encode", "EOW"]

EOW = "</w>"  # end-of-word marker symbol (never a whitespace-token substring)
_SEP = "\x1e"  # pair-string separator (record separator; never in tokens)


def _word_ids(offsets: np.ndarray, total: int) -> np.ndarray:
    """word id per flattened symbol position, from list offsets."""
    wid = np.zeros(total, dtype=np.int64)
    starts = offsets[1:-1]
    np.add.at(wid, starts[starts < total], 1)
    return np.cumsum(wid)


def _init_symbols(b: pa.Table) -> pa.Table:
    """(token, n) → (sym: list<string> of chars + EOW, n)."""
    words = b["token"].to_numpy(zero_copy_only=False)
    n = len(words)
    if n and any(_SEP in w for w in words):  # pair keys join on _SEP — must be out-of-band
        raise ValueError(
            f"token contains the reserved pair separator {_SEP!r}; "
            "strip control characters before bpe_train/bpe_encode"
        )
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n) + 1  # +EOW
    offsets = np.concatenate([[0], np.cumsum(lens)])
    flat = np.empty(int(offsets[-1]), dtype=object)
    pos = 0
    for w in words:  # vocabulary-sized table: O(distinct words), not corpus
        lw = len(w)
        flat[pos : pos + lw] = list(w)
        flat[pos + lw] = EOW
        pos += lw + 1
    sym = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.string())
    )
    return pa.table({"sym": sym, "n": b["n"]})


def _pair_partials(b: pa.Table) -> pa.Table:
    sym = b["sym"].combine_chunks() if isinstance(b["sym"], pa.ChunkedArray) else b["sym"]
    flat = np.asarray(sym.values, dtype=object)
    offsets = np.asarray(sym.offsets, dtype=np.int64)
    nwt = np.asarray(b["n"], dtype=np.int64)
    total = len(flat)
    if total < 2:
        return pa.table({"pair": pa.array([], pa.string()), "c_partial": pa.array([], pa.int64())})
    wid = _word_ids(offsets, total)
    same = wid[:-1] == wid[1:]
    pairs = (flat[:-1] + _SEP)[same] + flat[1:][same]
    w = nwt[wid[:-1][same]]
    uniq, inv = np.unique(pairs.astype(str), return_inverse=True)
    sums = group_sums_int64(inv, len(uniq), w)[0]
    return pa.table(
        {"pair": pa.array(uniq, pa.string()), "c_partial": pa.array(sums, pa.int64())}
    )


def _apply_merge(b: pa.Table, left: str, right: str, merged: str) -> pa.Table:
    sym = b["sym"].combine_chunks() if isinstance(b["sym"], pa.ChunkedArray) else b["sym"]
    flat = np.asarray(sym.values, dtype=object)
    offsets = np.asarray(sym.offsets, dtype=np.int64)
    total = len(flat)
    if total < 2:
        return b
    wid = _word_ids(offsets, total)
    hit = np.flatnonzero(
        (flat[:-1] == left) & (flat[1:] == right) & (wid[:-1] == wid[1:])
    )
    if left == right and len(hit) > 1:
        # leftmost-greedy on overlapping runs (aaa + merge aa): keep every
        # other hit within each run of consecutive positions
        run_break = np.r_[True, np.diff(hit) != 1]
        run_id = np.cumsum(run_break) - 1
        run_start = hit[run_break][run_id]
        keep = ((hit - run_start) % 2) == 0
        hit = hit[keep]
    if len(hit) == 0:
        return b
    out = flat.copy()
    out[hit] = merged
    delete = np.zeros(total, dtype=bool)
    delete[hit + 1] = True
    new_flat = out[~delete]
    # per-word deletion counts shrink the offsets
    del_per_word = np.zeros(len(offsets) - 1, dtype=np.int64)
    np.add.at(del_per_word, wid[hit + 1], 1)
    new_offsets = offsets - np.concatenate([[0], np.cumsum(del_per_word)])
    new_sym = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), pa.array(new_flat, pa.string())
    )
    return pa.table({"sym": new_sym, "n": b["n"]})


def bpe_train(word_counts: Dataset, n_merges: int, min_count: int = 2) -> pa.Table:
    """Learn ``n_merges`` BPE merges from a ``(token, n)`` word-frequency
    Dataset.  Returns ``(rank, left, right, merged, pair_count)`` — the merge
    table a tokenizer would apply.  Stops early when no pair reaches
    ``min_count`` (the vanishing-pairs regime where further merges are
    noise)."""
    from .topk import topk_rows

    words = word_counts.map_batches(_init_symbols, batch_format="pyarrow").materialize()
    # The vocabulary table is usually tiny relative to its upstream block
    # count (a groupby emits one block per partition); every merge round pays
    # per-block task latency × K rounds, so coalesce once up front to blocks
    # sized for the actual row count (measured 2.4× on the sf0.1 corpus,
    # whose vocab is 31 rows spread over 32 blocks).
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    target_blocks = max(2, min(cpus, words.count() // 32768 + 1))
    if words.num_blocks() > 2 * target_blocks:
        words = words.repartition(target_blocks).materialize()
    ranks, lefts, rights, mergeds, counts = [], [], [], [], []
    for rank in range(n_merges):
        pair_ds = (
            words.map_batches(_pair_partials, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("c_partial", alias_name="c"))
        )
        top = topk_rows(pair_ds, ["c", "pair"], [True, False], 1)
        if top.num_rows == 0:
            break
        best_c = int(top["c"][0].as_py())
        if best_c < min_count:
            break
        left, right = top["pair"][0].as_py().split(_SEP)
        merged = left + right
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        mergeds.append(merged)
        counts.append(best_c)
        words = words.map_batches(
            lambda b, lf=left, rt=right, mg=merged: _apply_merge(b, lf, rt, mg),
            batch_format="pyarrow",
        ).materialize()
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "merged": pa.array(mergeds, pa.string()),
            "pair_count": pa.array(counts, pa.int64()),
        }
    )


def bpe_encode(
    ds: Dataset,
    merges: "list[tuple[str, str]]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Apply a FIXED merge table (rank order, leftmost-greedy — the inference
    side of BPE) and return per-document ``(id_col, n_tokens, n_subwords)``.

    Stateless map-only stage: no shuffle at all.  Each batch contracts to its
    DISTINCT tokens first (``np.unique`` — the merge loop runs over unique
    words, not token occurrences), applies the merges with the same
    vectorized ``_apply_merge`` kernel training uses, and scatters subword
    lengths back to documents through the inverse index with exact int64
    grouped sums.  Because the merge list is a fixed input (not learned
    in-flight), the whole segmentation is SQL-expressible — sequential
    ``replace()`` over separator-joined characters — so the driver query is
    fully DuckDB-oracled, unlike learned-merge training."""
    from .vocab import tokenize_batch

    merge_list = [(lf, rt, lf + rt) for lf, rt in merges]

    def encode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_subwords": pa.array([], pa.int64()),
                }
            )
        toks = tokenize_batch(b[text_col], lower=True)
        import pyarrow.compute as pc

        doc_pos = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        tbl = _init_symbols(
            pa.table(
                {
                    "token": pa.array(uniq, pa.string()),
                    "n": pa.array(np.ones(len(uniq), dtype=np.int64)),
                }
            )
        )
        for lf, rt, mg in merge_list:
            tbl = _apply_merge(tbl, lf, rt, mg)
        sym = tbl["sym"].combine_chunks() if isinstance(tbl["sym"], pa.ChunkedArray) else tbl["sym"]
        lens = np.diff(np.asarray(sym.offsets, dtype=np.int64))
        per_doc = group_sums_int64(
            doc_pos, b.num_rows, lens[inv], np.ones(len(inv), dtype=np.int64)
        )
        keep = per_doc[1] > 0  # docs with ≥1 token (oracle trims empty docs)
        return pa.table(
            {
                id_col: pa.array(np.asarray(b[id_col], dtype=np.int64)[keep], pa.int64()),
                "n_tokens": pa.array(per_doc[1][keep], pa.int64()),
                "n_subwords": pa.array(per_doc[0][keep], pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")

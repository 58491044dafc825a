"""Cross-document token-n-gram operators: benchmark decontamination and
duplicate-span statistics.

Two classic large-corpus curation passes that the reference's per-mention
pipeline has no analog for but any 100-TB training-data build needs:

- ``decontaminate``: drop/flag training documents that share a token n-gram
  with a held-out benchmark set (the standard n-gram-overlap decontamination
  used by GPT-3/PaLM-style data builds).  The benchmark side is small by
  nature (eval sets are MBs), so its distinct gram-hash set broadcasts via
  ``ray.put`` and every training batch probes it map-side — zero shuffle on
  the big side.  Above ``broadcast_limit`` distinct grams the operator falls
  back to a partitioned inner join on the gram hash (same duality as the
  engine's other semi-joins).

- ``dup_span_stats``: per-document count of token n-grams that also occur in
  at least one OTHER document (the Lee-et-al "deduplicating training data"
  signal, at n-gram rather than suffix granularity).  Distinct (gram, doc)
  pairs are built map-side (documents never span batches, so per-batch dedup
  is global), one ``groupby(gram_hash)`` counts documents per gram, and the
  duplicated-gram set either broadcasts (small: only grams with df≥2) or
  joins back partitioned.

Grams travel as avalanched 64-bit hashes (``token_ngram_hashes``) — the
gram STRINGS never leave the tokenizer, so the shuffle carries 8 B/gram no
matter how long the window is.  The DuckDB oracles replay with literal gram
strings; a 64-bit collision would break parity, which at oracle scale
(≤ 10^5 grams) has probability < 10^-9 and at 100 TB only perturbs counts,
never correctness of the flagged set semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..functions.hashing import token_ngram_hashes
from .vocab import tokenize_batch

__all__ = ["decontaminate", "dup_span_stats"]

_BROADCAST_LIMIT = int(os.environ.get("GRAFT_GRAM_BROADCAST_LIMIT", 20_000_000))


def _doc_grams(
    b: pa.Table, id_col: str, text_col: str, n: int, lower: bool, distinct: bool
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, gram_hashes) for one batch; optionally distinct per doc."""
    if b.num_rows == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    toks = tokenize_batch(b[text_col], lower=lower)
    gh, row = token_ngram_hashes(toks, n)
    dids = np.asarray(b[id_col], dtype=np.int64)[row]
    if distinct and len(gh):
        order = np.lexsort((gh, dids))
        gh, dids = gh[order], dids[order]
        keep = np.concatenate([[True], (gh[1:] != gh[:-1]) | (dids[1:] != dids[:-1])])
        gh, dids = gh[keep], dids[keep]
    return dids, gh


def _doc_gram_table(dids: np.ndarray, gh: np.ndarray, id_col: str) -> pa.Table:
    return pa.table({id_col: pa.array(dids, pa.int64()), "gram_h": pa.array(gh.view(np.int64))})


def decontaminate(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    bench_mod: int = 13,
    lower: bool = True,
    broadcast_limit: int | None = None,
) -> Dataset:
    """Flag training docs sharing any token ``n``-gram with the benchmark set.

    The benchmark membership predicate here is ``doc_id % bench_mod == 0``
    (a deterministic stand-in for "rows of the eval table"); a real pipeline
    passes the eval table itself — only the gram-set build below changes.
    Output, one row per NON-benchmark doc: ``(doc_id, n_grams, n_hits,
    flagged)`` where ``n_hits`` counts gram occurrences (with multiplicity)
    that appear anywhere in the benchmark and ``flagged = n_hits > 0``.
    """
    limit = _BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit

    def bench_grams(b: pa.Table) -> pa.Table:
        mask = np.asarray(b[id_col], dtype=np.int64) % bench_mod == 0
        b = b.filter(pa.array(mask))
        _, gh = _doc_grams(b, id_col, text_col, n, lower, distinct=False)
        return pa.table({"gram_h": pa.array(np.unique(gh).view(np.int64))})

    # distinct benchmark grams (per-batch unique → one small groupby)
    bench = (
        ds.map_batches(bench_grams, batch_format="pyarrow")
        .groupby("gram_h")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["gram_h"])
        .materialize()
    )
    n_bench = bench.count()

    def train_filter(b: pa.Table) -> pa.Table:
        mask = np.asarray(b[id_col], dtype=np.int64) % bench_mod != 0
        return b.filter(pa.array(mask))

    train = ds.map_batches(train_filter, batch_format="pyarrow")

    if n_bench <= limit:
        tables = [t for t in ray.get(bench.to_arrow_refs()) if t.num_rows]
        gh_all = (
            np.concatenate([np.asarray(t["gram_h"], dtype=np.int64) for t in tables])
            if tables
            else np.zeros(0, dtype=np.int64)
        )
        bench_arr = np.sort(gh_all.view(np.uint64))
        bench_ref = ray.put(bench_arr)

        def probe(b: pa.Table) -> pa.Table:
            bset = ray.get(bench_ref)
            dids, gh = _doc_grams(b, id_col, text_col, n, lower, distinct=False)
            # map each gram's doc id back to its batch row (ids need not be sorted)
            ids = np.asarray(b[id_col], dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            pos = order[np.searchsorted(ids[order], dids)] if len(gh) else np.zeros(0, np.int64)
            if len(gh) and len(bset):
                idx = np.minimum(np.searchsorted(bset, gh), len(bset) - 1)
                hit = (bset[idx] == gh).astype(np.int64)
            else:
                hit = np.zeros(len(gh), dtype=np.int64)
            n_grams = np.bincount(pos, minlength=b.num_rows).astype(np.int64)
            n_hits = np.bincount(pos, weights=hit, minlength=b.num_rows).astype(np.int64)
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_grams": pa.array(n_grams),
                    "n_hits": pa.array(n_hits),
                    "flagged": pa.array(n_hits > 0),
                }
            )

        return train.map_batches(probe, batch_format="pyarrow")

    # join fallback: explode train grams (with multiplicity), inner-join the
    # benchmark gram set, count hits per doc, left-attach onto per-doc totals.
    from .clustering import clamped_partitions

    def explode(b: pa.Table) -> pa.Table:
        dids, gh = _doc_grams(b, id_col, text_col, n, lower, distinct=False)
        return _doc_gram_table(dids, gh, id_col)

    def totals(b: pa.Table) -> pa.Table:
        dids, gh = _doc_grams(b, id_col, text_col, n, lower, distinct=False)
        ids = np.asarray(b[id_col], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        pos = order[np.searchsorted(ids[order], dids)] if len(gh) else np.zeros(0, np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_grams": pa.array(np.bincount(pos, minlength=b.num_rows).astype(np.int64)),
            }
        )

    npart = clamped_partitions(max(n_bench, 1), 16)
    hit_rows = (
        train.map_batches(explode, batch_format="pyarrow")
        .join(bench, join_type="inner", num_partitions=npart, on=("gram_h",))
        .map_batches(
            lambda b: pa.table(
                {
                    id_col: b[id_col],
                    "n_grams": pa.nulls(b.num_rows, pa.int64()).fill_null(0),
                    "n_hits": pa.nulls(b.num_rows, pa.int64()).fill_null(1),
                }
            ),
            batch_format="pyarrow",
        )
    )
    tot_rows = train.map_batches(totals, batch_format="pyarrow").map_batches(
        lambda b: b.append_column("n_hits", pa.nulls(b.num_rows, pa.int64()).fill_null(0)),
        batch_format="pyarrow",
    )
    # second exchange is a groupby-SUM merge of the two row streams, not a
    # join — no empty-partition hazard, no second hash-join actor pool.
    merged = (
        tot_rows.union(hit_rows)
        .groupby(id_col)
        .aggregate(Sum("n_grams", alias_name="n_grams"), Sum("n_hits", alias_name="n_hits"))
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nh = pc.cast(b["n_hits"], pa.int64())
        return pa.table(
            {
                id_col: b[id_col],
                "n_grams": pc.cast(b["n_grams"], pa.int64()),
                "n_hits": nh,
                "flagged": pc.greater(nh, pa.scalar(0, pa.int64())),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def dup_span_stats(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    lower: bool = True,
    broadcast_limit: int | None = None,
) -> Dataset:
    """Per-doc duplicated-n-gram stats: ``(doc_id, n_grams, n_dup_grams,
    dup_frac)`` over DISTINCT grams per doc; a gram is duplicated when ≥ 2
    documents contain it.  ``dup_frac = n_dup_grams / n_grams`` (0.0 for
    docs with < n tokens) — an exact same-integer division, so the DuckDB
    oracle matches bitwise."""
    limit = _BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit

    def pairs(b: pa.Table) -> pa.Table:
        dids, gh = _doc_grams(b, id_col, text_col, n, lower, distinct=True)
        return _doc_gram_table(dids, gh, id_col)

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow")
    def keep_dups(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(b["n_docs"], pa.scalar(2, pa.int64()))).select(["gram_h"])

    dup = (
        pair_ds.groupby("gram_h")
        .aggregate(Count(alias_name="n_docs"))
        .map_batches(keep_dups, batch_format="pyarrow")
        .materialize()
    )
    n_dup = dup.count()

    if n_dup <= limit:
        tables = [t for t in ray.get(dup.to_arrow_refs()) if t.num_rows]
        gh_all = (
            np.concatenate([np.asarray(t["gram_h"], dtype=np.int64) for t in tables])
            if tables
            else np.zeros(0, dtype=np.int64)
        )
        dup_arr = np.sort(gh_all.view(np.uint64))
        dup_ref = ray.put(dup_arr)

        def score(b: pa.Table) -> pa.Table:
            dset = ray.get(dup_ref)
            dids, gh = _doc_grams(b, id_col, text_col, n, lower, distinct=True)
            ids = np.asarray(b[id_col], dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            pos = order[np.searchsorted(ids[order], dids)] if len(gh) else np.zeros(0, np.int64)
            if len(gh) and len(dset):
                idx = np.minimum(np.searchsorted(dset, gh), len(dset) - 1)
                is_dup = (dset[idx] == gh).astype(np.int64)
            else:
                is_dup = np.zeros(len(gh), dtype=np.int64)
            n_grams = np.bincount(pos, minlength=b.num_rows).astype(np.int64)
            n_dups = np.bincount(pos, weights=is_dup, minlength=b.num_rows).astype(np.int64)
            frac = np.divide(n_dups, n_grams, out=np.zeros(len(n_grams)), where=n_grams > 0)
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_grams": pa.array(n_grams),
                    "n_dup_grams": pa.array(n_dups),
                    "dup_frac": pa.array(frac, pa.float64()),
                }
            )

        return ds.map_batches(score, batch_format="pyarrow")

    # join fallback: pairs ⋈ dup-grams → per-doc dup counts, attached onto
    # per-doc totals (pairs recompute map-side rather than materializing the
    # full exploded pair set).
    from .clustering import clamped_partitions

    def totals(b: pa.Table) -> pa.Table:
        dids, gh = _doc_grams(b, id_col, text_col, n, lower, distinct=True)
        ids = np.asarray(b[id_col], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        pos = order[np.searchsorted(ids[order], dids)] if len(gh) else np.zeros(0, np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_grams": pa.array(np.bincount(pos, minlength=b.num_rows).astype(np.int64)),
            }
        )

    npart = clamped_partitions(max(n_dup, 1), 16)
    dup_rows = pair_ds.join(dup, join_type="inner", num_partitions=npart, on=("gram_h",)).map_batches(
        lambda b: pa.table(
            {
                id_col: b[id_col],
                "n_grams": pa.nulls(b.num_rows, pa.int64()).fill_null(0),
                "n_dup_grams": pa.nulls(b.num_rows, pa.int64()).fill_null(1),
            }
        ),
        batch_format="pyarrow",
    )
    tot_rows = ds.map_batches(totals, batch_format="pyarrow").map_batches(
        lambda b: b.append_column("n_dup_grams", pa.nulls(b.num_rows, pa.int64()).fill_null(0)),
        batch_format="pyarrow",
    )
    # merge the two streams with a groupby-SUM, not a second join (see
    # decontaminate: avoids the chained-join actor pileup and the
    # empty-partition hazard).
    joined = (
        tot_rows.union(dup_rows)
        .groupby(id_col)
        .aggregate(Sum("n_grams", alias_name="n_grams"), Sum("n_dup_grams", alias_name="n_dup_grams"))
    )

    def finish(b: pa.Table) -> pa.Table:
        nd = b["n_dup_grams"]
        ng = np.asarray(b["n_grams"], dtype=np.int64)
        ndv = np.asarray(nd, dtype=np.int64)
        frac = np.divide(ndv, ng, out=np.zeros(len(ng)), where=ng > 0)
        return pa.table(
            {
                id_col: b[id_col],
                "n_grams": b["n_grams"],
                "n_dup_grams": nd,
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")

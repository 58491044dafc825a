"""Blocking: MinHash/LSH band keys over normalized text → groupby shuffle.

Stage 1 of the north rule.  Each node (a distinct mention surface, or a
catalog entity name) is assigned ``num_bands`` LSH band keys from a seeded
MinHash signature over char n-grams, plus one exact-match key (hash of the
full normalized text) so byte-identical surfaces always share a block, plus —
optionally — a composite ``(conv-window, role, tool)`` context key for
mention-level co-occurrence blocking.

The downstream ``groupby(block_key)`` is the pipeline's SHUFFLE #1.  Skew
defenses, in order:

1. **Exact-duplicate contraction** happens *before* blocking (the pipeline
   blocks distinct ``norm_text`` values, not raw mentions) — the hot-block
   driver of transcript data is byte-identical repeated text, and it never
   reaches the shuffle.
2. **Salted splitting** for blocks that are still hot: a block with more than
   ``salt_cap`` nodes is split into ``ceil(n/salt_cap)`` salted sub-blocks
   (salt = deterministic hash of node id).  Pairs across sub-blocks of one
   band are dropped; similar surfaces collide in several independent bands, so
   band redundancy recovers most cross-salt pairs.  Truncation is *counted and
   reported* per stage (never silent) via the ``salted`` flag column.

The reference has no blocking at all — it brute-forces every mention against
the whole catalog through FAISS (``mix_blink/retriever/dense.py:86-99``);
blocking is what makes mention-mention/entity-entity pair generation tractable
at 10^12 turns.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    char_ngram_hashes,
    flat_utf8,
    hash_strings,
    lsh_band_keys,
    minhash_signatures,
)

_EXACT_TAG = np.uint64(0xE1AC7_0000)
_SALT_PRIME = np.uint64(0x9E3779B97F4A7C15)

__all__ = [
    "BlockingConfig",
    "block_keys_table",
    "add_salt",
    "composite_context_key",
    "sorted_neighborhood_pairs",
    "token_ngram_blocks",
    "meta_blocking_pairs",
]


@dataclass(frozen=True)
class BlockingConfig:
    num_perms: int = 64
    num_bands: int = 8          # r = num_perms / num_bands rows per band
    ngram: int = 3
    seed: int = 42
    salt_cap: int = 512         # max nodes per (exploded) block before salting
    include_exact_key: bool = True


def block_keys_table(
    batch: pa.Table,
    cfg: BlockingConfig,
    text_col: str = "norm_text",
    id_col: str = "node_id",
    carry_cols: tuple[str, ...] = (),
) -> pa.Table:
    """Flat-map body: one input row → ``num_bands (+1)`` block-key rows.

    Output: ``block_key:int64, {id_col}, {text_col}, band:int32`` (+ carried
    columns).  Runs inside ``map_batches(batch_format="pyarrow")``; the
    MinHash signature work is the same flat-buffer kernel path as dedup.
    """
    text = batch[text_col]
    data, offsets = flat_utf8(text)
    nrows = batch.num_rows
    grams, rows = char_ngram_hashes(data, offsets, n=cfg.ngram)
    sig = minhash_signatures(grams, rows, nrows, num_perms=cfg.num_perms, seed=cfg.seed)
    keys = lsh_band_keys(sig, num_bands=cfg.num_bands)  # (nrows, num_bands)

    n_keys = cfg.num_bands + (1 if cfg.include_exact_key else 0)
    all_keys = np.empty((nrows, n_keys), dtype=np.int64)
    all_keys[:, : cfg.num_bands] = keys
    band_ids = np.arange(cfg.num_bands, dtype=np.int32)
    if cfg.include_exact_key:
        exact = (hash_strings(data, offsets) * _SALT_PRIME + _EXACT_TAG).view(np.int64)
        all_keys[:, cfg.num_bands] = exact
        band_ids = np.concatenate([band_ids, np.array([-1], dtype=np.int32)])

    row_idx = np.repeat(np.arange(nrows, dtype=np.int64), n_keys)
    take = pa.array(row_idx)
    cols: dict[str, pa.Array] = {
        "block_key": pa.array(all_keys.reshape(-1)),
        id_col: pc.take(batch[id_col], take),
        text_col: pc.take(text, take),
        "band": pa.array(np.tile(band_ids, nrows)),
    }
    for c in carry_cols:
        cols[c] = pc.take(batch[c], take)
    return pa.table(cols)


def composite_context_key(batch: pa.Table, window: int = 8) -> pa.Array:
    """Deterministic int64 key of ``(conv_id bucket-window, role, tool)``.

    The north rule's context blocking key: mentions from the same
    conversation window / role / tool stream land in one block.  Computed as a
    hash mix of the three parts (no string concat allocation).
    """
    conv_h = hash_strings(*flat_utf8(batch["conv_id"]))
    role_h = hash_strings(*flat_utf8(batch["role"]))
    tool_h = hash_strings(*flat_utf8(batch["tool"]))
    win = (np.asarray(batch["turn_idx"], dtype=np.int64) // window).astype(np.uint64)
    mixed = ((conv_h * _SALT_PRIME + win) * _SALT_PRIME + role_h) * _SALT_PRIME + tool_h
    return pa.array(mixed.view(np.int64))


def add_salt(group: pa.Table, cfg: BlockingConfig, id_col: str = "node_id") -> pa.Table:
    """Split a hot block into salted sub-blocks of ≤ ``salt_cap`` nodes.

    Deterministic: salt derives from the node-id hash, not arrival order.
    Adds ``salt:int32`` and ``salted:bool`` columns.
    """
    n = group.num_rows
    if n <= cfg.salt_cap:
        return group.append_column("salt", pa.array(np.zeros(n, dtype=np.int32))).append_column(
            "salted", pa.array(np.zeros(n, dtype=bool))
        )
    n_salts = -(-n // cfg.salt_cap)  # ceil
    ids_h = hash_strings(*flat_utf8(group[id_col]))
    salt = ((ids_h * _SALT_PRIME) % np.uint64(n_salts)).astype(np.int32)
    return group.append_column("salt", pa.array(salt)).append_column(
        "salted", pa.array(np.ones(n, dtype=bool))
    )


def sorted_neighborhood_pairs(ds, sort_keys: list[str], window: int = 2):
    """Sorted-neighborhood blocking (Hernández–Stolfo): one range-shuffle
    sort, then each record pairs with its next ``window`` neighbors in sort
    order — including ACROSS block boundaries, which is the part a naive
    per-block pairing silently drops.

    Two-phase stitch in the ``prefix_scan`` style: after ``sort(...)``
    materializes range-ordered blocks, a tiny task per block returns its
    FIRST ``window`` rows; the driver hands block *i* the heads of blocks
    *i+1, i+2, …* until ``window`` stitch rows are gathered (blocks can hold
    fewer than ``window`` rows), and each block pairs locally over
    ``concat(block, stitch)``, keeping only pairs whose LEFT element lives in
    the original block (so no pair is emitted twice).  Driver traffic is
    O(n_blocks × window) rows; the corpus itself moves once, in the sort.

    Returns a Dataset of ``(a_<col>, b_<col>)`` rows for every column of
    ``ds``, in sort-adjacency order.  Deterministic given a total-order
    ``sort_keys`` (append a unique id key).
    """
    import ray
    import ray.data as rd

    ordered = ds.sort(sort_keys).materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def head(tbl: pa.Table) -> pa.Table:
        return tbl.slice(0, window)

    heads = ray.get([head.remote(r) for r in refs])

    def stitch_for(i: int) -> pa.Table:
        rows: list[pa.Table] = []
        need = window
        for h in heads[i + 1 :]:
            if need <= 0:
                break
            take = h.slice(0, need)
            rows.append(take)
            need -= take.num_rows
        if not rows:
            return heads[i].schema.empty_table() if heads else pa.table({})
        return pa.concat_tables(rows)

    @ray.remote
    def pair_block(tbl: pa.Table, stitch: pa.Table) -> pa.Table:
        own = tbl.num_rows
        full = pa.concat_tables([tbl, stitch]) if stitch.num_rows else tbl
        n = full.num_rows
        if own == 0 or n < 2:
            cols = {}
            for name in full.column_names:
                cols[f"a_{name}"] = full[name].slice(0, 0)
                cols[f"b_{name}"] = full[name].slice(0, 0)
            return pa.table(cols)
        a_idx, b_idx = [], []
        for off in range(1, window + 1):
            m = min(own, n - off)  # left element must be an own row
            if m <= 0:
                continue
            a_idx.append(np.arange(m, dtype=np.int64))
            b_idx.append(np.arange(m, dtype=np.int64) + off)
        ai = pa.array(np.concatenate(a_idx)) if a_idx else pa.array([], pa.int64())
        bi = pa.array(np.concatenate(b_idx)) if b_idx else pa.array([], pa.int64())
        cols = {}
        for name in full.column_names:
            cols[f"a_{name}"] = pc.take(full[name], ai)
            cols[f"b_{name}"] = pc.take(full[name], bi)
        return pa.table(cols)

    out_refs = [pair_block.remote(r, ray.put(stitch_for(i))) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def token_ngram_blocks(
    ds,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
):
    """Distinct ``(gram, id)`` membership pairs for word n-gram blocking
    keys (the token-blocking key generator meta-blocking prunes).  Grams are
    built with shifted views of the flat token buffer joined by one Arrow
    ``binary_join_element_wise`` (the :func:`~..stages.vocab.bigram_counts`
    pattern, no per-gram Python) and deduped inside the batch, so only
    distinct memberships reach the exchange.

    Grams travel as strings so the DuckDB oracle can replay them verbatim;
    the production-scale variant hashes grams to 8-byte u64 first
    (``functions/hashing.py`` ``token_ngram_hashes``, used by the
    decontamination stage) — same topology, 1/10 the bytes."""
    from .vocab import tokenize_batch

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()), id_col: pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = tokenize_batch(b[text_col], lower=lower)
        off = np.asarray(toks.offsets, dtype=np.int64)
        off = off - off[0]
        flat = pc.cast(toks.flatten(), pa.string())
        m = len(flat) - (n - 1)
        if m <= 0:
            return empty
        joined = pc.binary_join_element_wise(*[flat.slice(k, m) for k in range(n)], " ")
        starts = np.arange(m, dtype=np.int64)
        row = np.searchsorted(off, starts, side="right") - 1
        valid = (starts + n) <= off[row + 1]  # gram must not cross a row
        grams = joined.to_numpy(zero_copy_only=False)[valid]
        dids = np.asarray(b[id_col], dtype=np.int64)[row[valid]]
        order = np.lexsort((dids, grams))
        grams, dids = grams[order], dids[order]
        keep = np.concatenate([[True], (grams[1:] != grams[:-1]) | (dids[1:] != dids[:-1])])
        return pa.table({"gram": pa.array(grams[keep], pa.string()), id_col: pa.array(dids[keep])})

    return ds.map_batches(partial, batch_format="pyarrow")


def meta_blocking_pairs(
    ds,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_block: int = 2,
    max_block: int = 20,
    min_shared: int = 2,
    broadcast_threshold: int = 20_000_000,
):
    """Meta-blocking (Papadakis et al., TKDE'13): candidate pairs from word
    n-gram blocking keys, **weighted by Common Block Scheme (CBS)** — the
    number of blocking keys two records share — and pruned to
    ``shared_blocks ≥ min_shared``.  The weight prune is what turns a noisy
    block collection into a tractable candidate graph at web scale.

    Distributed shape (every step bounded):

    1. distinct (gram, id) memberships, deduped map-side
       (:func:`token_ngram_blocks`);
    2. block sizes via one ``groupby(gram).count``; keys outside
       ``[min_block, max_block]`` are dropped — size-1 blocks generate no
       pairs, oversized blocks are stop-grams (the classic block-purging
       step, applied BEFORE any pair is materialized);
    3. memberships filter to surviving keys — broadcast gram set below
       ``broadcast_threshold``, partitioned inner join above it;
    4. per-block pair emission via ``groupby(gram).map_groups`` — a block
       emits ≤ ``max_block²/2`` pairs by construction, so no hot key;
    5. CBS weight = one ``groupby(a, b).count`` over the emitted pairs,
       pruned to ``min_shared``.

    Returns a Dataset of ``(doc_a, doc_b, shared_blocks)`` with
    ``doc_a < doc_b``.  Complements MinHash-LSH banding (probabilistic,
    ``stages/dedup.py``) and sorted-neighborhood (order-based) as the
    third classic candidate generator; all three feed the same verify /
    cluster stages."""
    import ray
    from ray.data.aggregate import Count

    memberships = token_ngram_blocks(ds, n=n, id_col=id_col, text_col=text_col)
    sizes = memberships.groupby("gram").aggregate(Count(alias_name="block_size"))
    keys = sizes.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b["block_size"], min_block),
                pc.less_equal(b["block_size"], max_block),
            )
        ).select(["gram"]),
        batch_format="pyarrow",
    ).materialize()
    n_keys = keys.count()

    if n_keys <= broadcast_threshold:
        import pyarrow as _pa

        tabs = [t for t in ray.get(keys.to_arrow_refs()) if t.num_rows]
        gram_set = (
            pa.concat_tables(tabs)["gram"].combine_chunks()
            if tabs
            else _pa.array([], _pa.string())
        )
        gram_ref = ray.put(gram_set)

        def keep_blocked(b: pa.Table) -> pa.Table:
            gs = ray.get(gram_ref)
            return b.filter(pc.is_valid(pc.index_in(b["gram"], value_set=gs)))

        blocked = memberships.map_batches(keep_blocked, batch_format="pyarrow")
    else:
        from .clustering import clamped_partitions

        n_parts = clamped_partitions(n_keys, max(8, int(ray.cluster_resources().get("CPU", 8))))
        blocked = memberships.join(keys, join_type="inner", num_partitions=n_parts, on=("gram",))

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(g[id_col], dtype=np.int64))
        k = len(ids)
        if k < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(k, k=1)
        return pa.table({"doc_a": pa.array(ids[ai]), "doc_b": pa.array(ids[bi])})

    # Bucketed-run exchange (stages/dedup.py grouped_run_pairs): keys hash to
    # a BOUNDED set of buckets so per-key Python fires only for surviving
    # blocks, not once per gram via groupby(gram).map_groups.  Surviving
    # membership rows are ≤ n_keys × max_block by the purge step, which
    # sizes the buckets without another count pass.
    from .dedup import _auto_buckets, grouped_run_pairs

    pairs = grouped_run_pairs(
        blocked,
        "gram",
        emit_pairs,
        n_buckets=_auto_buckets(n_keys * max_block),
    )
    # CBS weight through the bucketed pair exchange (stages/dedup.py
    # pair_stat): Ray's sort-based aggregate on the TWO-column pair key was
    # the dominant stage of the sf0.1 profile — same fix as distinct_pairs.
    from .dedup import pair_stat

    weighted = pair_stat(
        pairs, "count", out_col="shared_blocks", a_col="doc_a", b_col="doc_b"
    )
    return weighted.map_batches(
        lambda b: b.filter(pc.greater_equal(b["shared_blocks"], min_shared)),
        batch_format="pyarrow",
    )

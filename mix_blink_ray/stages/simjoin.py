"""Exact set-similarity join via prefix filtering (the PPJoin family —
Xiao et al. 2008, WWW; prefix + length filters, exact verify).

The probabilistic near-dup path (MinHash/LSH, ``stages/dedup.py``) trades
recall for bounded work; some pipelines need the EXACT answer — every pair
with token-set Jaccard ≥ t, no misses.  All-pairs comparison is O(n²); the
prefix-filter theorem cuts it without losing a single pair: order every
document's distinct tokens by GLOBAL rarity (df ascending, token ascending —
one fixed total order), and if J(A,B) ≥ t then, with
``p(L) = L − ⌈t·L⌉ + 1``, the first ``p(|A|)`` tokens of A and the first
``p(|B|)`` tokens of B must share at least one token.  So it suffices to
emit only each doc's p rarest tokens and look for collisions — rare tokens
by construction, so candidate groups stay small.

Ray shape: one corpus pass builds the df table (map-side distinct (token,
doc) contraction + groupby); the (token → rarity rank) order broadcasts once
below ``max_broadcast_vocab``, and above it ranks are assigned WITHOUT any
driver table — the df Dataset range-sorts by (df, token), a two-phase
prefix scan (``stages/scan.py``) zips each token with its global position,
and ranks reach the membership rows by a partitioned join (the 100-TB
path: shuffle ∝ membership rows, nothing vocabulary-sized ever leaves the
cluster); prefix rows shuffle through ONE bucketed exchange
(``grouped_run_pairs``);
candidates pass the length filter (J ≥ t ⇒ t·max(L) ≤ min(L)) before the
exact verify, which fetches texts onto the (small) pair set via partitioned
joins and computes exact STRING token-set Jaccard (no hashing — the
exactness claim tolerates no collisions).  Completeness (zero misses vs the
brute-force all-pairs join) is asserted by the parity tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

__all__ = ["ppjoin_pairs", "containment_join", "edit1_join"]


def _distinct_row_tokens(b: pa.Table, id_col: str, text_col: str):
    """(row_pos, doc_id_per_row, token) with per-doc distinct tokens."""
    from .vocab import tokenize_batch

    toks = tokenize_batch(b[text_col], lower=True)
    rows = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(str)
    nonempty = flat != ""
    rows, flat = rows[nonempty], flat[nonempty]
    order = np.lexsort((flat, rows))
    rows, flat = rows[order], flat[order]
    keep = np.r_[True, (rows[1:] != rows[:-1]) | (flat[1:] != flat[:-1])]
    return rows[keep], flat[keep]


def _prefix_schema(id_col: str) -> pa.Table:
    return pa.table(
        {
            "token": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "set_len": pa.array([], pa.int64()),
        }
    )


def _prefix_rows_broadcast(docs: Dataset, df_ds: Dataset, t: float, id_col: str, text_col: str):
    """Prefix rows via a broadcast (token → rarity rank) lookup.

    Rarity rank = position in (df asc, token asc); the vocab broadcasts in
    LEXICOGRAPHIC order with each token's rank alongside, so batch lookup is
    one searchsorted.  Returns ``None`` when the fixed-width unicode array
    would exceed 8 GiB (rows × LONGEST-token chars × 4 B — one pathological
    blob token amplifies the whole broadcast); the caller falls back to the
    distributed rank-join path, which never widens tokens."""
    df = df_ds.to_pandas().sort_values(["df", "token"], kind="stable").reset_index(drop=True)
    tokens_by_rarity = df["token"].to_numpy().astype(str)
    if tokens_by_rarity.nbytes > 8 << 30:
        return None
    lex = np.argsort(tokens_by_rarity, kind="stable")
    vocab_sorted = tokens_by_rarity[lex]
    rank_of_sorted = lex.astype(np.int64)
    vocab_ref = ray.put((vocab_sorted, rank_of_sorted))
    empty = _prefix_schema(id_col)

    def prefix_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        vs, vr = ray.get(vocab_ref)
        rows, toks = _distinct_row_tokens(b, id_col, text_col)
        if len(rows) == 0:
            return empty
        pos_in_vocab = np.searchsorted(vs, toks)
        ranks = vr[pos_in_vocab]
        order = np.lexsort((ranks, rows))
        rows, toks, ranks = rows[order], toks[order], ranks[order]
        starts = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
        lens = np.diff(np.r_[starts, len(rows)])
        l_of = np.repeat(lens, lens)
        pos = np.arange(len(rows)) - np.repeat(starts, lens)
        p = l_of - np.ceil(t * l_of).astype(np.int64) + 1
        keep = pos < p
        ids = np.asarray(b[id_col], dtype=np.int64)[rows[keep]]
        return pa.table(
            {
                "token": pa.array(toks[keep], pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "set_len": pa.array(l_of[keep], pa.int64()),
            }
        )

    return docs.map_batches(prefix_rows, batch_format="pyarrow").materialize()


def _prefix_rows_distributed(docs: Dataset, df_ds: Dataset, t: float, id_col: str, text_col: str):
    """Prefix rows with NO driver vocabulary table — the 100-TB path.

    Rank assignment is fully distributed: the df Dataset range-sorts by
    (df, token) and the two-phase prefix scan (``stages/scan.py``) zips each
    token with its global position (the SAME total order the broadcast path
    uses, so both paths emit identical prefix rows).  Ranks reach the
    distinct (doc, token) membership rows by ONE partitioned inner join
    (shuffle ∝ membership rows), and per-doc prefix selection runs through a
    bucketed exchange — hash(doc) buckets co-locate a doc's rows, one
    in-bucket lexsort by (doc, rank), vectorized run boundaries, keep
    ``pos < p(L)`` — no per-doc Python (the ``grouped_run_pairs`` shape,
    fully vectorized because selection needs no per-run callback)."""
    from .clustering import clamped_partitions
    from .dedup import _auto_buckets
    from .scan import prefix_scan
    from ..functions.hashing import _SEED_MIX

    ranked = prefix_scan(df_ds, ["df", "token"], "df", out_col="_cum", row_col="_rownum")
    ranks = ranked.map_batches(
        lambda b: pa.table(
            {"token": b["token"], "rank": pc.subtract(b["_rownum"], pa.scalar(1, pa.int64()))}
        ),
        batch_format="pyarrow",
    )

    def membership_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()), id_col: pa.array([], pa.int64())})
        rows, toks = _distinct_row_tokens(b, id_col, text_col)
        ids = np.asarray(b[id_col], dtype=np.int64)[rows]
        return pa.table({"token": pa.array(toks, pa.string()), id_col: pa.array(ids, pa.int64())})

    memberships = docs.map_batches(membership_rows, batch_format="pyarrow").materialize()
    n_mem = memberships.count()
    n_parts = clamped_partitions(
        max(n_mem, 1), max(8, int(ray.cluster_resources().get("CPU", 8)))
    )
    with_rank = memberships.join(ranks, join_type="inner", num_partitions=n_parts, on=("token",))

    n_buckets = _auto_buckets(n_mem)
    empty = _prefix_schema(id_col)

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.asarray(b[id_col], dtype=np.int64).view(np.uint64) * _SEED_MIX
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def bucket_prefix(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        if g.num_rows == 0:
            return empty
        ids = np.asarray(g[id_col], dtype=np.int64)
        rnk = np.asarray(g["rank"], dtype=np.int64)
        toks = g["token"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((rnk, ids))
        ids, toks = ids[order], toks[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        lens = np.diff(np.r_[starts, len(ids)])
        l_of = np.repeat(lens, lens)
        pos = np.arange(len(ids)) - np.repeat(starts, lens)
        p = l_of - np.ceil(t * l_of).astype(np.int64) + 1
        keep = pos < p
        return pa.table(
            {
                "token": pa.array(toks[keep], pa.string()),
                id_col: pa.array(ids[keep], pa.int64()),
                "set_len": pa.array(l_of[keep], pa.int64()),
            }
        )

    return (
        with_rank.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_prefix, batch_format="pyarrow")
        .materialize()
    )


def _attach_pair_payloads(
    pairs: Dataset,
    src: Dataset,
    id_col: str,
    val_col: str,
    out_a: str,
    out_b: str,
    n_parts: int,
    broadcast_limit: int = 2_000_000,
    broadcast_bytes: int = 2 << 30,
) -> Dataset:
    """Attach ``src[val_col]`` onto both sides of a pair set — the verify
    stages' payload fetch.  Broadcast/join duality (the q5 sorted-lut
    convention): a corpus within ``broadcast_limit`` rows AND
    ``broadcast_bytes`` payload bytes ships ONCE via ``ray.put`` and
    attaches with two ``index_in`` lookups per batch (no shuffle — two Ray
    hash joins cost seconds of fixed shuffle-actor spin-up that dwarf the
    pair set at bench scale); anything larger falls back to the two
    partitioned joins (shuffle ∝ pairs + corpus — the 100-TB path).  The
    broadcast path RAISES on a pair id missing from ``src`` (pairs derive
    from src by construction, so a miss is a bug upstream); the join path
    keeps the pre-existing inner-join semantics."""
    stats = src.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "nb": pa.array([b[val_col].nbytes], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_src, nb_src = int(stats["n"].sum()), int(stats["nb"].sum())

    sel = src.map_batches(
        lambda b: pa.table({"_k": b[id_col], "_v": b[val_col]}), batch_format="pyarrow"
    )
    if n_src <= broadcast_limit and nb_src <= broadcast_bytes:
        tabs = [t_ for t_ in ray.get(sel.to_arrow_refs()) if t_.num_rows]
        lut = (
            pa.concat_tables(tabs)
            if tabs
            else pa.table({"_k": pa.array([], pa.int64()), "_v": pa.array([], pa.string())})
        )
        ref = ray.put((lut["_k"].combine_chunks(), lut["_v"].combine_chunks()))

        def attach(b: pa.Table) -> pa.Table:
            keys, vals = ray.get(ref)
            pa_pos = pc.index_in(b["a_id"], value_set=keys)
            pb_pos = pc.index_in(b["b_id"], value_set=keys)
            if b.num_rows and (pc.any(pc.is_null(pa_pos)).as_py() or pc.any(pc.is_null(pb_pos)).as_py()):
                raise ValueError("_attach_pair_payloads: pair id missing from source table")
            return b.append_column(out_a, pc.take(vals, pa_pos)).append_column(
                out_b, pc.take(vals, pb_pos)
            )

        return pairs.map_batches(attach, batch_format="pyarrow")

    a_side = sel.map_batches(
        lambda b: pa.table({"a_id": b["_k"], out_a: b["_v"]}), batch_format="pyarrow"
    )
    b_side = sel.map_batches(
        lambda b: pa.table({"b_id": b["_k"], out_b: b["_v"]}), batch_format="pyarrow"
    )
    return pairs.join(a_side, join_type="inner", num_partitions=n_parts, on=("a_id",)).join(
        b_side, join_type="inner", num_partitions=n_parts, on=("b_id",)
    )


def ppjoin_pairs(
    docs: Dataset,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_vocab: int = 20_000_000,
    hot_token_cap: int = 4096,
    payload_broadcast_limit: int = 2_000_000,
) -> Dataset:
    """All pairs with exact token-set Jaccard ≥ ``threshold`` —
    ``(a_id, b_id, jaccard)``, ``a_id < b_id``, jaccard rounded to 1e-6.

    Vocabularies up to ``max_broadcast_vocab`` broadcast the rarity order
    (one ``ray.put``, searchsorted lookup per batch); above it ranks are
    assigned distributedly (prefix scan + partitioned join — no driver
    table, see :func:`_prefix_rows_distributed`), so the operator no longer
    refuses large corpora.  Raises when a prefix token collides across more
    than ``hot_token_cap`` documents (truncating would silently break the
    zero-miss guarantee — lower the threshold's prefix cost by raising the
    cap, or pre-drop stopword-like tokens, explicitly)."""
    from .clustering import clamped_partitions
    from .dedup import _auto_buckets, distinct_pairs, grouped_run_pairs
    from .vocab import doc_frequencies

    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {t}")

    df_ds = doc_frequencies(docs, id_col=id_col, text_col=text_col).materialize()
    n_prefix_rows = None
    if df_ds.count() <= max_broadcast_vocab:
        # None when the fixed-width broadcast would blow past 8 GiB
        n_prefix_rows = _prefix_rows_broadcast(docs, df_ds, t, id_col, text_col)
    if n_prefix_rows is None:
        n_prefix_rows = _prefix_rows_distributed(docs, df_ds, t, id_col, text_col)

    def in_token_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        ids = np.asarray(group[id_col], dtype=np.int64)
        lens = np.asarray(group["set_len"], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, lens = ids[order], lens[order]
        first = np.r_[True, ids[1:] != ids[:-1]]
        ids, lens = ids[first], lens[first]
        if len(ids) < 2:
            return empty
        if len(ids) > hot_token_cap:
            raise ValueError(
                f"prefix token shared by {len(ids)} docs exceeds hot_token_cap="
                f"{hot_token_cap}; truncation would break the zero-miss guarantee"
            )
        iu, ju = np.triu_indices(len(ids), k=1)
        la, lb = lens[iu], lens[ju]
        # length filter: J >= t  =>  t * max(L) <= min(L)
        keep = np.minimum(la, lb).astype(np.float64) >= t * np.maximum(la, lb) - 1e-9
        return pa.table({"a_id": pa.array(ids[iu][keep]), "b_id": pa.array(ids[ju][keep])})

    pairs = distinct_pairs(
        grouped_run_pairs(
            n_prefix_rows,
            "token",
            in_token_pairs,
            n_buckets=_auto_buckets(n_prefix_rows.count()),
        )
    ).materialize()

    empty_result = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if pairs.count() == 0:
        import ray.data as rd_

        return rd_.from_arrow(empty_result)

    # verify parallelism scales with the box: the exact-Jaccard verify is
    # the CPU-heavy stage (string tokenization per pair side), and 8 fixed
    # partitions left a 32-CPU node ¾ idle (measured 15 s/task at sf0.1)
    n_parts = clamped_partitions(
        max(pairs.count(), 1), max(8, int(ray.cluster_resources().get("CPU", 8)))
    )
    joined = _attach_pair_payloads(
        pairs,
        docs,
        id_col,
        text_col,
        "a_text",
        "b_text",
        n_parts,
        broadcast_limit=payload_broadcast_limit,
    )

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty_result

        def row_sets(col):
            t2 = pa.table({"i": pa.array(np.arange(n, dtype=np.int64)), "x": col})
            return _distinct_row_tokens(
                t2.rename_columns(["doc_id", "text"]), "doc_id", "text"
            )

        ra, ta = row_sets(batch["a_text"])
        rb, tb = row_sets(batch["b_text"])
        na = np.bincount(ra, minlength=n)
        nb = np.bincount(rb, minlength=n)
        rows = np.concatenate([ra, rb])
        toks = np.concatenate([ta, tb])
        order = np.lexsort((toks, rows))
        rows, toks = rows[order], toks[order]
        dup = (rows[1:] == rows[:-1]) & (toks[1:] == toks[:-1])
        inter = np.bincount(rows[1:][dup], minlength=n)
        union = np.maximum(na + nb - inter, 1)
        jac = inter.astype(np.float64) / union
        out = pa.table(
            {
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                # half-away-from-zero (DuckDB round()), NOT np.round's
                # banker's rounding — the queries._round_col convention
                "jaccard": pa.array(np.floor(jac * 1_000_000 + 0.5) / 1_000_000.0),
            }
        )
        # no epsilon: both sides (and the SQL oracle) compute the identical
        # int/int float64 division, so >= t is bit-deterministic
        return out.filter(pa.array(jac >= t))

    return joined.map_batches(verify, batch_format="pyarrow")


def containment_join(
    docs: Dataset,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_vocab: int = 20_000_000,
    hot_pair_cap: int = 1 << 22,
    payload_broadcast_limit: int = 2_000_000,
) -> Dataset:
    """All DIRECTED pairs (a, b), a ≠ b, with exact token-set CONTAINMENT
    |A ∩ B| / |A| ≥ ``threshold`` — ``(a_id, b_id, containment)``.  The
    asymmetric sibling of :func:`ppjoin_pairs`: quote detection, benchmark
    decontamination, subset joins (``threshold=1`` is the classic
    set-containment join).

    Prefix theorem, containment form: |A∩B| ≥ ⌈t·|A|⌉ forces at least one
    of A's first ``p(|A|) = |A| − ⌈t·|A|⌉ + 1`` tokens under the global
    rarity order into B — the SAME ``p`` as the Jaccard prefix, so the
    broadcast / distributed prefix-row stages are reused verbatim.  The
    right side cannot prune (the witness token may sit anywhere in B), so B
    emits ALL its distinct tokens — emission ∝ membership rows, the honest
    asymmetric-join floor.  Candidates per token = prefix(A) × full(B)
    through ONE bucketed exchange; the length filter |B| ≥ t·|A| runs
    in-group; exact verify computes |A∩B| / |A| on the pair set.  A token
    whose candidate cross-product exceeds ``hot_pair_cap`` RAISES (house
    rule: truncation would silently break the zero-miss claim)."""
    from .clustering import clamped_partitions
    from .dedup import _auto_buckets, distinct_pairs, grouped_run_pairs
    from .vocab import doc_frequencies

    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {t}")

    df_ds = doc_frequencies(docs, id_col=id_col, text_col=text_col).materialize()
    n_prefix = None
    if df_ds.count() <= max_broadcast_vocab:
        n_prefix = _prefix_rows_broadcast(docs, df_ds, t, id_col, text_col)
    if n_prefix is None:
        n_prefix = _prefix_rows_distributed(docs, df_ds, t, id_col, text_col)

    role_schema = pa.table(
        {
            "token": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "set_len": pa.array([], pa.int64()),
            "role": pa.array([], pa.int64()),
        }
    )

    def add_role(role: int):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return role_schema
            return b.append_column("role", pa.array(np.full(b.num_rows, role, np.int64)))

        return fn

    def full_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return role_schema
        rows, toks = _distinct_row_tokens(b, id_col, text_col)
        if len(rows) == 0:
            return role_schema
        starts = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
        lens = np.diff(np.r_[starts, len(rows)])
        l_of = np.repeat(lens, lens)
        ids = np.asarray(b[id_col], dtype=np.int64)[rows]
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "set_len": pa.array(l_of, pa.int64()),
                "role": pa.array(np.ones(len(rows), np.int64)),
            }
        )

    rows_ds = (
        n_prefix.map_batches(add_role(0), batch_format="pyarrow")
        .union(docs.map_batches(full_rows, batch_format="pyarrow"))
        .materialize()
    )

    def in_token_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        n = group.num_rows
        if n < 2:
            return empty
        ids = np.asarray(group[id_col], dtype=np.int64)
        lens = np.asarray(group["set_len"], dtype=np.int64)
        roles = np.asarray(group["role"], dtype=np.int64)
        order = np.lexsort((roles, ids))
        ids, lens, roles = ids[order], lens[order], roles[order]
        keep = np.r_[True, (ids[1:] != ids[:-1]) | (roles[1:] != roles[:-1])]
        ids, lens, roles = ids[keep], lens[keep], roles[keep]
        pi = np.flatnonzero(roles == 0)
        fi = np.flatnonzero(roles == 1)
        if len(pi) == 0 or len(fi) == 0:
            return empty
        if len(pi) * len(fi) > hot_pair_cap:
            raise ValueError(
                f"containment_join: token candidate cross-product "
                f"{len(pi)}x{len(fi)} exceeds hot_pair_cap={hot_pair_cap}; "
                "truncation would break the zero-miss guarantee"
            )
        a = np.repeat(ids[pi], len(fi))
        la = np.repeat(lens[pi], len(fi))
        b = np.tile(ids[fi], len(pi))
        lb = np.tile(lens[fi], len(pi))
        # length filter: |A∩B| <= |B| and >= ceil(t|A|)  =>  |B| >= t·|A|
        keep2 = (a != b) & (lb.astype(np.float64) >= t * la - 1e-9)
        return pa.table({"a_id": pa.array(a[keep2]), "b_id": pa.array(b[keep2])})

    pairs = distinct_pairs(
        grouped_run_pairs(
            rows_ds, "token", in_token_pairs, n_buckets=_auto_buckets(rows_ds.count())
        )
    ).materialize()

    empty_result = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "containment": pa.array([], pa.float64()),
        }
    )
    if pairs.count() == 0:
        import ray.data as rd_

        return rd_.from_arrow(empty_result)

    n_parts = clamped_partitions(
        max(pairs.count(), 1), max(8, int(ray.cluster_resources().get("CPU", 8)))
    )
    joined = _attach_pair_payloads(
        pairs,
        docs,
        id_col,
        text_col,
        "a_text",
        "b_text",
        n_parts,
        broadcast_limit=payload_broadcast_limit,
    )

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty_result

        def row_sets(col):
            t2 = pa.table({"i": pa.array(np.arange(n, dtype=np.int64)), "x": col})
            return _distinct_row_tokens(
                t2.rename_columns(["doc_id", "text"]), "doc_id", "text"
            )

        ra, ta = row_sets(batch["a_text"])
        rb, tb = row_sets(batch["b_text"])
        na = np.maximum(np.bincount(ra, minlength=n), 1)
        rows = np.concatenate([ra, rb])
        toks = np.concatenate([ta, tb])
        order = np.lexsort((toks, rows))
        rows, toks = rows[order], toks[order]
        dup = (rows[1:] == rows[:-1]) & (toks[1:] == toks[:-1])
        inter = np.bincount(rows[1:][dup], minlength=n)
        c = inter.astype(np.float64) / na
        out = pa.table(
            {
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "containment": pa.array(np.floor(c * 1_000_000 + 0.5) / 1_000_000.0),
            }
        )
        # same int/int float64 division on both sides — >= t is bit-deterministic
        return out.filter(pa.array(c >= t))

    return joined.map_batches(verify, batch_format="pyarrow")


_POLY_P = np.uint64(1099511628211)  # FNV prime — odd, so invertible mod 2^64
_POLY_PINV = np.uint64(pow(int(_POLY_P), -1, 1 << 64))
_LEN_MIX = np.uint64(0x9E3779B97F4A7C15)


def _deletion_hashes(mat: np.ndarray, lens: np.ndarray):
    """64-bit hashes of every single-character deletion variant of each row,
    plus the row's own hash — all in O(n·L) vectorized ops, NO string
    materialization.

    Row bytes hash polynomially: H = Σ_{j<len} c_j·P^j (mod 2^64).  Deleting
    position d shifts the suffix down one power, and P is odd hence
    invertible mod 2^64, so del(d) = prefix(d) + (H − prefix(d+1))·P⁻¹ —
    one vectorized expression over the whole (n, L) grid.  String length is
    mixed in (identical strings ⇒ identical hash; different-length
    coincidences are cut down), then splitmix64 finalizes.  A 64-bit
    collision only ever ADDS a candidate — the exact verify rejects it — so
    correctness never depends on hash injectivity.

    Returns ``(self_hash: (n,), del_hash: (n, L), valid: (n, L) bool)``.
    """
    n, L = mat.shape
    from .sketches import splitmix64

    powers = np.empty(L + 1, dtype=np.uint64)
    powers[0] = np.uint64(1)
    # the scalar multiply wraps mod 2^64 BY DESIGN (polynomial hashing in
    # the uint64 ring); silence numpy's scalar-overflow RuntimeWarning so
    # filterwarnings=error configurations don't crash the join
    with np.errstate(over="ignore"):
        for j in range(L):
            powers[j + 1] = powers[j] * _POLY_P
    terms = mat.astype(np.uint64) * powers[:L][None, :]
    prefix = np.zeros((n, L + 1), dtype=np.uint64)
    np.cumsum(terms, axis=1, dtype=np.uint64, out=prefix[:, 1:])
    H = prefix[np.arange(n), lens]
    d = np.arange(L)[None, :]
    valid = d < lens[:, None]
    del_h = prefix[:, :L] + (H[:, None] - prefix[:, 1 : L + 1]) * _POLY_PINV
    self_hash = splitmix64(H + lens.astype(np.uint64) * _LEN_MIX)
    del_hash = splitmix64(del_h + (lens[:, None] - 1).astype(np.uint64) * _LEN_MIX)
    return self_hash, del_hash, valid


def edit1_join(
    ds: Dataset,
    key_col: str,
    id_col: str,
    max_len: int = 64,
    hot_variant_cap: int = 4096,
    payload_broadcast_limit: int = 2_000_000,
) -> Dataset:
    """Exact edit-distance-≤1 self-join via deletion neighborhoods (the
    FastSS family, Bocek et al. 2007): ``(a_id, b_id, dist)`` for every pair
    of rows whose ``key_col`` strings are within ONE insert/delete/substitute
    — zero misses, verified by the exact vectorized Levenshtein DP.

    Distance is BYTE-level over UTF-8 (the repo-wide key convention —
    identical to character distance for ASCII keys; a non-ASCII corpus where
    one character is several bytes needs a codepoint transcode first, or
    char-level d=1 pairs like 'café'/'cafe' are missed and DuckDB's
    char-level ``levenshtein`` oracle diverges).  Null keys raise.

    Mechanics: d(s,t) ≤ 1 ⇒ the sets {s} ∪ deletions(s) and
    {t} ∪ deletions(t) intersect (equal strings share s; a substitution at
    position i shares the common deletion at i; an insertion shares the
    shorter string itself).  Each row therefore emits len+1 variant HASHES
    (never variant strings — an O(1)-per-variant rolling-hash trick, see
    :func:`_deletion_hashes`), collisions route through the same bucketed
    exchange as the other pair generators, the candidate pairs fetch their
    keys via partitioned joins, and ``levenshtein_pairs`` keeps exactly
    d ≤ 1.  Emission volume is rows × (len+1) — the documented FastSS index
    cost; keys longer than ``max_len`` raise rather than silently truncate
    (a truncated key could fabricate or miss matches)."""
    from ..functions.strings import levenshtein_pairs, pad_codes
    from .clustering import cpu_scaled_partitions
    from .dedup import _auto_buckets, distinct_pairs, grouped_run_pairs

    def variant_rows(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vh": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        col = b[key_col]
        if col.null_count > 0:
            raise ValueError(
                f"{key_col} contains nulls; SQL levenshtein(NULL, x) is NULL "
                "(pair excluded) while a silent empty-string reading would "
                "fabricate pairs — filter or fill nulls explicitly first"
            )
        lens_raw = pc.binary_length(pc.cast(col, pa.binary()))
        if pc.max(lens_raw).as_py() > max_len:
            raise ValueError(
                f"{key_col} exceeds max_len={max_len}; raise it explicitly "
                "(truncation would break the zero-miss guarantee)"
            )
        mat, lens = pad_codes(b[key_col], max_len=max_len)
        self_h, del_h, valid = _deletion_hashes(mat, lens)
        ids = np.asarray(b[id_col], dtype=np.int64)
        rows_v, cols_v = np.nonzero(valid)
        vh = np.concatenate([self_h, del_h[rows_v, cols_v]]).view(np.int64)
        vid = np.concatenate([ids, ids[rows_v]])
        return pa.table({"vh": pa.array(vh), id_col: pa.array(vid, pa.int64())})

    def in_bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        ids = np.unique(np.asarray(group[id_col], dtype=np.int64))
        if len(ids) < 2:
            return empty
        if len(ids) > hot_variant_cap:
            raise ValueError(
                f"variant hash shared by {len(ids)} rows exceeds hot_variant_cap="
                f"{hot_variant_cap}; truncation would break the zero-miss guarantee"
            )
        iu, ju = np.triu_indices(len(ids), k=1)
        return pa.table({"a_id": pa.array(ids[iu]), "b_id": pa.array(ids[ju])})

    variants = ds.map_batches(variant_rows, batch_format="pyarrow").materialize()
    pairs = distinct_pairs(
        grouped_run_pairs(
            variants, "vh", in_bucket_pairs, n_buckets=_auto_buckets(variants.count())
        )
    ).materialize()

    empty_result = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )
    if pairs.count() == 0:
        import ray.data as rd_

        return rd_.from_arrow(empty_result)

    n_parts = cpu_scaled_partitions(pairs.count())
    joined = _attach_pair_payloads(
        pairs,
        ds,
        id_col,
        key_col,
        "a_key",
        "b_key",
        n_parts,
        broadcast_limit=payload_broadcast_limit,
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_result
        am, la = pad_codes(batch["a_key"], max_len=max_len)
        bm, lb = pad_codes(batch["b_key"], max_len=max_len)
        dist = levenshtein_pairs(am, la, bm, lb)
        out = pa.table(
            {"a_id": batch["a_id"], "b_id": batch["b_id"], "dist": pa.array(dist)}
        )
        return out.filter(pc.less_equal(out["dist"], pa.scalar(1, pa.int64())))

    return joined.map_batches(verify, batch_format="pyarrow")

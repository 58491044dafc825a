"""Evaluation: reference recall@k / MRR formulas + pairwise P/R/F1 gates.

Recall/MRR reproduce the reference exactly (``mix_blink/evaluation/
eval.py:12-52``): per mention, ``best_rank`` = min rank of ANY gold id in the
top-k candidate list (multi-label any-gold-match, ``eval.py:27-33``);
``R@k = tp_k / true``; ``MRR = Σ 1/best_rank / true`` (mentions with no gold
in the list contribute 0).  Computed as a vectorized map over exploded Arrow
list columns + a global aggregate — no per-row Python.

Pairwise P/R/F1 implements the FIXTURES.md §4 contract: a labeled pair is a
match iff the two mentions' gold id sets intersect on a non-NIL id; a
predicted pair holds iff the two mentions share a predicted cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import flat_utf8, hash_strings
from ..sources.synth import NIL_ID

__all__ = [
    "rank_stats_batch",
    "recall_mrr",
    "pairwise_prf",
    "pairwise_prf_counts",
    "pairwise_prf_distributed",
    "labeled_pairs_from_gold",
]

_ROW_MIX = np.uint64(0xC2B2AE3D27D4EB4F)


def _explode(list_arr: pa.ListArray | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    off = np.asarray(list_arr.offsets, dtype=np.int64)
    row = np.repeat(np.arange(len(list_arr), dtype=np.int64), np.diff(off))
    vals = list_arr.flatten()
    return vals, row


def rank_stats_batch(batch: pa.Table, ks: tuple[int, ...] = (1, 10, 50, 100)) -> pa.Table:
    """map_batches body: per-batch partial counters for recall@k / MRR.

    Input needs ``candidates`` (list<string>, score-ordered) and ``gold_ids``
    (list<string>).  Emits ONE row of partial sums — the groupby-free
    pre-aggregation pattern (partials merged by a tiny final sum).
    """
    n = batch.num_rows
    c_val, c_row = _explode(batch["candidates"])
    g_val, g_row = _explode(batch["gold_ids"])
    c_key = hash_strings(*flat_utf8(c_val)) + c_row.astype(np.uint64) * _ROW_MIX
    g_key = hash_strings(*flat_utf8(g_val)) + g_row.astype(np.uint64) * _ROW_MIX
    is_gold = np.isin(c_key, g_key)

    pos_in_row = np.arange(len(c_row), dtype=np.int64) - np.searchsorted(c_row, c_row)
    best_rank = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    if len(c_row):
        hit_rows = c_row[is_gold]
        hit_ranks = pos_in_row[is_gold] + 1  # 1-based rank (reference eval.py:29)
        np.minimum.at(best_rank, hit_rows, hit_ranks)

    cols: dict[str, pa.Array] = {"true": pa.array([n], pa.int64())}
    for k in ks:
        cols[f"tp_{k}"] = pa.array([int((best_rank <= k).sum())], pa.int64())
    rr = np.where(best_rank < np.iinfo(np.int64).max, 1.0 / best_rank, 0.0)
    cols["reciprocal_rank"] = pa.array([float(rr.sum())], pa.float64())
    return pa.table(cols)


def recall_mrr(partials, ks: tuple[int, ...] = (1, 10, 50, 100)) -> dict[str, float]:
    """Merge partial counter rows (Dataset or pa.Table) → final metrics
    (reference formulas ``eval.py:45-59``)."""
    if hasattr(partials, "to_pandas"):
        df = partials.to_pandas()
    else:
        df = partials
    true = float(df["true"].sum())
    out = {"true": true}
    for k in ks:
        out[f"recall@{k}"] = float(df[f"tp_{k}"].sum()) / max(true, 1.0)
    out["mrr"] = float(df["reciprocal_rank"].sum()) / max(true, 1.0)
    return out


def labeled_pairs_from_gold(
    mentions_gold: pa.Table, block_of: dict[str, set[int]] | None = None
) -> pa.Table:
    """FIXTURES.md §4 labeled pairs.  ``block_of``: mention_uid → set of block
    keys; pairs are enumerated only among mentions sharing ≥ 1 key (None ⇒
    all pairs — quadratic, tests only).  ``is_match`` iff gold sets intersect
    non-NIL."""
    import itertools
    from collections import defaultdict

    uids = mentions_gold["mention_uid"].to_pylist()
    golds = [set(g) - {NIL_ID} for g in mentions_gold["gold_ids"].to_pylist()]
    by_uid = dict(zip(uids, range(len(uids))))

    pair_set: set[tuple[int, int]] = set()
    if block_of is None:
        pair_set = {(i, j) for i, j in itertools.combinations(range(len(uids)), 2)}
    else:
        buckets: dict[int, list[int]] = defaultdict(list)
        for uid, keys in block_of.items():
            if uid in by_uid:
                for k in keys:
                    buckets[k].append(by_uid[uid])
        for members in buckets.values():
            for i, j in itertools.combinations(sorted(set(members)), 2):
                pair_set.add((i, j) if i < j else (j, i))

    a, b, m = [], [], []
    for i, j in sorted(pair_set):
        a.append(uids[i])
        b.append(uids[j])
        m.append(bool(golds[i] & golds[j]))
    return pa.table(
        {
            "a_uid": pa.array(a, pa.string()),
            "b_uid": pa.array(b, pa.string()),
            "is_match": pa.array(m, pa.bool_()),
        }
    )


def pairwise_prf_counts(
    gold_sets: list[frozenset], clusters: list[str | None]
) -> dict[str, float]:
    """EXACT all-pairs pairwise P/R/F1 without enumerating pairs — O(n + V²)
    where V = #distinct gold-set values (pair enumeration is O(n²): 16k
    mentions already mean 10⁸ pairs).

    A pair matches iff its two (non-NIL) gold sets intersect; a pair is
    predicted iff both mentions share a non-None cluster.  Counting:

    - ``gold_pairs``  = Σ over distinct set-value pairs (F, G), F∩G≠∅ of
      m_F·m_G (F≠G) or C(m_F,2) (F=G),
    - ``pred_pairs``  = Σ_c C(n_c, 2),
    - ``tp``          = the same set-value computation restricted per cluster
      (clusters contain few distinct gold-set values),
    - FP = pred−TP, FN = gold−TP.
    """
    from collections import Counter, defaultdict

    gold_sets = [frozenset(g) for g in gold_sets]
    gold_counter = Counter(gold_sets)
    by_cluster: dict[str, Counter] = defaultdict(Counter)
    for gs, c in zip(gold_sets, clusters):
        if c is not None:
            by_cluster[c][gs] += 1
    return _prf_from_counters(gold_counter, by_cluster)


def _intersecting_pairs(counter) -> int:
    vals = [(f, m) for f, m in counter.items() if f]
    total = 0
    for i, (f, mf) in enumerate(vals):
        total += mf * (mf - 1) // 2  # same-set pairs always intersect
        for g, mg in vals[i + 1 :]:
            if f & g:
                total += mf * mg
    return total


def _prf_from_counters(gold_counter, by_cluster) -> dict[str, float]:
    """The V²-sized core shared by the local and distributed paths."""
    gold_pairs = _intersecting_pairs(gold_counter)
    tp = 0
    pred_pairs = 0
    for c, counter in by_cluster.items():
        n = sum(counter.values())
        pred_pairs += n * (n - 1) // 2
        tp += _intersecting_pairs(counter)
    fp = pred_pairs - tp
    fn = gold_pairs - tp
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    f1 = 2 * p * r / max(p + r, 1e-12)
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


_GOLD_SEP = "\x1f"
_NO_CLUSTER = "\x00:none"


def gold_key_batch(batch: pa.Table, gold_col: str = "gold_ids") -> pa.Table:
    """map_batches body: canonicalize each row's gold id set to a sortable
    string key (non-NIL ids, sorted, ``\\x1f``-joined; '' for NIL-only rows).
    Keys are what lets the contingency groupby avoid list-typed shuffle
    columns."""
    import pandas as pd

    col = batch[gold_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.asarray(col.offsets, dtype=np.int64)
    rows = np.repeat(np.arange(len(col), dtype=np.int64), np.diff(off))
    vals = np.asarray(col.flatten().to_pylist(), dtype=object)
    mask = vals != NIL_ID
    keys = np.full(len(col), "", dtype=object)
    if mask.any():
        df = pd.DataFrame({"r": rows[mask], "v": vals[mask]})
        agg = df.sort_values(["r", "v"], kind="stable").groupby("r")["v"].agg(_GOLD_SEP.join)
        keys[agg.index.to_numpy()] = agg.to_numpy()
    return pa.table(
        {"mention_uid": batch["mention_uid"], "gold_key": pa.array(keys, pa.string())}
    )


def pairwise_prf_distributed(mentions, gold, num_partitions: int = 8) -> dict[str, float]:
    """EXACT pairwise P/R/F1 without a driver-side mention pull (round-1
    VERDICT §wrong #3 fix): identical math to :func:`pairwise_prf_counts`,
    but the mention-sized work is a distributed contingency count —
    ``join(gold, mentions) → groupby(cluster, gold_key).count()`` — and the
    driver touches only the (cluster, gold-set-value) table, whose size is
    bounded by #clusters × #distinct gold sets per cluster (≪ mentions).

    ``mentions``: Dataset with mention_uid / pred_id / cluster_id.
    ``gold``: Dataset with mention_uid / gold_ids (list<string>).
    """
    from collections import Counter, defaultdict

    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ..stages.clustering import clamped_partitions

    gk = gold.map_batches(gold_key_batch, batch_format="pyarrow")
    m = mentions.select_columns(["mention_uid", "pred_id", "cluster_id"])
    n_parts = clamped_partitions(max(gk.count(), 1), num_partitions)
    # LEFT join from gold: a gold mention absent from the linkage output must
    # still count in the gold-pairs denominator (as an unclustered singleton)
    # — an inner join would silently inflate recall.
    joined = gk.join(m, join_type="left_outer", num_partitions=n_parts, on=("mention_uid",))

    def eff_cluster(b: pa.Table) -> pa.Table:
        # A mention participates in predicted pairs iff its prediction is a
        # real (non-NIL) entity — same rule as the local path's `clusters`.
        valid = pc.and_(pc.is_valid(b["pred_id"]), pc.not_equal(b["pred_id"], NIL_ID))
        cl = pc.if_else(valid, b["cluster_id"], pa.scalar(_NO_CLUSTER))
        return pa.table({"cluster": pc.fill_null(cl, _NO_CLUSTER), "gold_key": b["gold_key"]})

    cont = (
        joined.map_batches(eff_cluster, batch_format="pyarrow")
        .groupby(["cluster", "gold_key"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    gold_counter: Counter = Counter()
    by_cluster: dict[str, Counter] = defaultdict(Counter)
    for cluster, key, n in cont.itertuples(index=False):
        gs = frozenset(key.split(_GOLD_SEP)) if key else frozenset()
        gold_counter[gs] += int(n)
        if cluster != _NO_CLUSTER:
            by_cluster[cluster][gs] += int(n)
    return _prf_from_counters(gold_counter, by_cluster)


def pairwise_prf(labeled: pa.Table, cluster_of: dict[str, str | None]) -> dict[str, float]:
    """P/R/F1 of predicted co-clustering over the labeled pairs.

    ``cluster_of``: mention_uid → cluster id (None/missing ⇒ singleton).
    """
    a = labeled["a_uid"].to_pylist()
    b = labeled["b_uid"].to_pylist()
    m = np.asarray(labeled["is_match"].to_pylist(), dtype=bool)
    ca = np.array([cluster_of.get(x) for x in a], dtype=object)
    cb = np.array([cluster_of.get(x) for x in b], dtype=object)
    same = np.array(
        [x is not None and x == y for x, y in zip(ca, cb)], dtype=bool
    )
    tp = int((same & m).sum())
    fp = int((same & ~m).sum())
    fn = int((~same & m).sum())
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    f1 = 2 * p * r / max(p + r, 1e-12)
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}

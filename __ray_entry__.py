"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from mix_blink_ray.evaluation.metrics import (
    pairwise_prf_distributed,
    rank_stats_batch,
    recall_mrr,
)
from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage
from mix_blink_ray.pipelines.queries import ORACLE_SQL, QUERIES
from mix_blink_ray.sources.synth import NIL_ID, config_for_scale, generate_cached
from mix_blink_ray.stages.scoring import split_candidates_hard_negatives

# Deterministic synthetic transcript corpus scale per testdata sf tier
# (the linkage pipeline's own input — BASELINE.json input_hint shape).
_SF_TO_TURNS = {"0.001": 3_000, "0.01": 16_000, "0.1": 8_000_000}


def _synth_paths(sf_dir: str) -> dict[str, str]:
    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    sf = m.group(1) if m else "0.001"
    n_turns = int(os.environ.get("GRAFT_BENCH_TURNS", 0)) or _SF_TO_TURNS.get(sf, 3_000)
    return generate_cached(config_for_scale(n_turns))


def _linkage_result(sf_dir: str):
    paths = _synth_paths(sf_dir)
    transcripts = rd.read_parquet(paths["transcripts"])
    catalog = pq.read_table(paths["catalog"])
    return run_linkage(transcripts, catalog, LinkageConfig()), paths


def linkage_clusters(sf_dir: str):
    """Flagship three-stage pipeline (blocking → scoring → clustering)."""
    res, _ = _linkage_result(sf_dir)
    return res.mentions.select_columns(
        ["mention_uid", "conv_id", "turn_idx", "surface", "norm_text", "pred_id", "cluster_id"]
    )


GOLD_BROADCAST_THRESHOLD = 5_000_000  # gold rows ≤ this → broadcast; else hash join


def _attach_lists(mentions, surf_preds, gold_path: str, gold_broadcast_threshold: int | None = None):
    """Attach ``candidates`` (per surface) and ``gold_ids`` (per mention) to
    mention rows.

    The surface side is the contracted distinct-surface table — small by
    construction — so it stays a broadcast lookup.  The GOLD side grows with
    mentions, so above ``gold_broadcast_threshold`` rows it switches to a
    partitioned hash join on ``mention_uid`` with the list column serialized
    to a join-safe string blob (Arrow's hash join can't carry list-typed
    payload columns) and re-split after the join — mirroring the linkage
    pipeline's ``broadcast_threshold`` fallback.  Both attaches are the
    vectorized keyed list-attach (one ``pc.index_in`` + ListArray take per
    batch — no per-row Python on the mention-sized path)."""
    from mix_blink_ray.stages.attach import attach_list_column

    threshold = GOLD_BROADCAST_THRESHOLD if gold_broadcast_threshold is None else gold_broadcast_threshold
    # Gold attaches FIRST (the join fallback can't carry the list-typed
    # candidates column through acero); candidates broadcast-attach after.
    with_gold = attach_list_column(
        mentions, gold_path, "mention_uid", "gold_ids", broadcast_threshold=threshold
    )
    return attach_list_column(with_gold, surf_preds, "norm_text", "candidates")


def linkage_candidates(sf_dir: str):
    """Per-mention top-k candidates + gold-excluded hard negatives
    (reference get_candidates semantics, keyed not positional)."""
    res, paths = _linkage_result(sf_dir)
    m = res.mentions.select_columns(["mention_uid", "norm_text"])
    joined = _attach_lists(m, res.surface_preds, paths["mentions_gold"])
    return joined.map_batches(
        lambda b: split_candidates_hard_negatives(b, top_k=10), batch_format="pyarrow"
    ).select_columns(["mention_uid", "candidates", "hard_negatives"])


def linkage_eval(sf_dir: str):
    """Pairwise P/R/F1 + R@1/10/50/100 + MRR vs the synthetic gold (reference
    evaluation formulas and k=100 candidate pool, eval.py:23-59)."""
    from mix_blink_ray.stages.scoring import ScoringConfig, SurfaceScorer, build_catalog_index

    res, paths = _linkage_result(sf_dir)
    catalog = pq.read_table(paths["catalog"])

    # Reference eval retrieves top-100 (eval.py:23); rescore the distinct
    # surfaces at k=100 (clamped to |catalog| like dense.py:89-91).
    # GRAFT_NIL_SENTINEL=1 turns on the reference's ranked-NIL mode
    # (sentinel catalog row, dictionary.py:67-72): NIL-only mentions are
    # then INCLUDED in R@k/MRR because NIL itself is rankable.
    import ray

    nil_sentinel = os.environ.get("GRAFT_NIL_SENTINEL", "") == "1"
    eval_cfg = ScoringConfig(top_k=100, extra_k=0, nil_sentinel=nil_sentinel)
    idx_ref = ray.put(build_catalog_index(catalog, cfg=eval_cfg))

    def score100(b: pa.Table) -> pa.Table:
        from mix_blink_ray.pipelines.linkage import _cached_scorer

        scorer = _cached_scorer("eval100", lambda: SurfaceScorer(idx_ref, eval_cfg))
        return scorer(b.select(["norm_text"]))

    surf100 = res.surface_preds.select_columns(["norm_text"]).map_batches(
        score100, batch_format="pyarrow", batch_size=1024
    )
    m = res.mentions.select_columns(["mention_uid", "norm_text", "pred_id", "cluster_id"])
    joined = _attach_lists(m, surf100, paths["mentions_gold"])

    def non_nil_rank_stats(b: pa.Table) -> pa.Table:
        # R@k/MRR scope: with the NIL sentinel ON, every mention is rankable
        # (NIL is a catalog row) — reference parity.  With it OFF (default)
        # the engine thresholds, so NIL-only mentions are unrankable by
        # design and are excluded.
        if eval_cfg.nil_sentinel:
            return rank_stats_batch(b, ks=(1, 10, 50, 100))
        # vectorized "any gold != NIL" per row: flatten + parent-index bincount
        import numpy as np
        import pyarrow.compute as pc

        gold = b["gold_ids"]
        gold = gold.combine_chunks() if isinstance(gold, pa.ChunkedArray) else gold
        parents = pc.list_parent_indices(gold).to_numpy(zero_copy_only=False)
        ne = pc.fill_null(pc.not_equal(pc.list_flatten(gold), NIL_ID), False).to_numpy(
            zero_copy_only=False
        )
        has_real = pa.array(np.bincount(parents[ne], minlength=b.num_rows) > 0)
        return rank_stats_batch(b.filter(has_real), ks=(1, 10, 50, 100))

    partials = joined.map_batches(non_nil_rank_stats, batch_format="pyarrow")
    rk = recall_mrr(partials, ks=(1, 10, 50, 100))

    # Count-based exact pairwise metrics, computed distributedly: the
    # mention-sized work is a contingency groupby(cluster, gold_key); only
    # the tiny contingency table reaches the driver (pair enumeration is
    # O(n²), and a full-mention to_pandas() would not survive 100× scale).
    gold_ds = rd.read_parquet(paths["mentions_gold"], columns=["mention_uid", "gold_ids"])
    prf = pairwise_prf_distributed(res.mentions, gold_ds)
    return pa.table(
        {
            "metric": pa.array(
                [
                    "pairwise_precision", "pairwise_recall", "pairwise_f1",
                    "recall@1", "recall@10", "recall@50", "recall@100", "mrr",
                ],
                pa.string(),
            ),
            "value": pa.array(
                [
                    round(prf["precision"], 6),
                    round(prf["recall"], 6),
                    round(prf["f1"], 6),
                    round(rk["recall@1"], 6),
                    round(rk["recall@10"], 6),
                    round(rk["recall@50"], 6),
                    round(rk["recall@100"], 6),
                    round(rk["mrr"], 6),
                ],
                pa.float64(),
            ),
        }
    )


def linkage_predictions(sf_dir: str):
    """Top-5 prediction report — the engine analog of the reference's
    ``predict`` output (``mix_blink/prediction/predict.py:13-55``): per
    mention, ranked candidates with ``name``, ``id``, similarity rounded to 4
    (``:46`` M13), description truncated to 300 chars (``:47`` M12), and the
    mention surface slice (``:39`` M11) — flattened to one row per
    (mention, rank), keyed not nested."""
    import numpy as np
    import ray

    res, paths = _linkage_result(sf_dir)
    catalog = pq.read_table(paths["catalog"])
    cat_df = catalog.to_pandas().set_index("entity_id")
    desc = {
        i: (d if d else f"{n} is an entity in this dictionary.")[:300]
        for i, n, d in zip(cat_df.index, cat_df["name"], cat_df["description"])
    }
    name_of = dict(zip(cat_df.index, cat_df["name"]))
    lut_ref = ray.put((name_of, desc))

    surf = res.surface_preds.select_columns(["norm_text", "candidates", "candidate_scores"])

    def explode_top5(b: pa.Table) -> pa.Table:
        # Vectorized explode: slice each list to 5, flatten, derive row ids
        # and 1-based ranks from the offsets; entity name/description attach
        # via one index_in against the broadcast catalog arrays.
        import numpy as np
        import pyarrow.compute as pc

        names, descs = ray.get(lut_ref)
        cand = pc.list_slice(b["candidates"], 0, 5)
        scores = pc.list_slice(b["candidate_scores"], 0, 5)
        cand = cand.combine_chunks() if isinstance(cand, pa.ChunkedArray) else cand
        scores = scores.combine_chunks() if isinstance(scores, pa.ChunkedArray) else scores
        off = np.asarray(cand.offsets, dtype=np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64), np.diff(off))
        rank = (np.arange(len(row), dtype=np.int64) - np.repeat(off[:-1] - off[0], np.diff(off)) + 1).astype(np.int32)
        ids = cand.flatten()
        sims_raw = pc.cast(scores.flatten(), pa.float64())
        # M13: round to 4, half-to-even — Python round() semantics, matching
        # the reference's round(float(d), 4) (predict.py:46)
        sims = pc.divide(
            pc.cast(pc.round(pc.multiply(sims_raw, pa.scalar(10000.0)), round_mode="half_to_even"), pa.int64()),
            pa.scalar(10000.0),
        )
        id_keys = pa.array(list(names.keys()), pa.string())
        name_vals = pa.array([names[k] for k in names.keys()], pa.string())
        desc_vals = pa.array([descs.get(k, "") for k in names.keys()], pa.string())
        pos = pc.index_in(ids, value_set=id_keys)
        return pa.table(
            {
                "norm_text": pc.take(b["norm_text"], pa.array(row)),
                "rank": pa.array(rank, pa.int32()),
                "entity_id": pc.cast(ids, pa.string()),
                "entity_name": pc.fill_null(pc.take(name_vals, pos), ""),
                "similarity": sims,
                "description": pc.fill_null(pc.take(desc_vals, pos), ""),
            }
        )

    return surf.map_batches(explode_top5, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline at the smallest scale; driver checks rows ≥ 0 and a
    stable schema."""
    return linkage_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = dict(QUERIES)
    out["linkage_clusters"] = linkage_clusters
    out["linkage_candidates"] = linkage_candidates
    out["linkage_eval"] = linkage_eval
    out["linkage_predictions"] = linkage_predictions
    return out


def oracle_sql() -> dict[str, str]:
    """SQL-expressible subset; the rest (heuristics, sketches, seeded LSH,
    iterative clustering) are rows-only by design."""
    return dict(ORACLE_SQL)

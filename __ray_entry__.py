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
    labeled_pairs_from_gold,
    pairwise_prf,
    pairwise_prf_counts,
    rank_stats_batch,
    recall_mrr,
)
from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage
from mix_blink_ray.pipelines.queries import ORACLE_SQL, QUERIES
from mix_blink_ray.sources.synth import NIL_ID, SynthConfig, config_for_scale, generate_cached
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


def _attach_lists(mentions, surf_preds, gold_path: str):
    """Attach ``candidates`` (per surface) and ``gold_ids`` (per mention) to
    mention rows via broadcast lookups — Arrow's hash join can't carry
    list-typed payload columns (acero limitation), and both sides here are
    keyed lookups anyway (surface table is contracted/small; gold is the
    eval-only truth table)."""
    import ray

    surf_df = surf_preds.select_columns(["norm_text", "candidates"]).to_pandas().set_index("norm_text")["candidates"]
    gold_df = pq.read_table(gold_path, columns=["mention_uid", "gold_ids"]).to_pandas().set_index("mention_uid")["gold_ids"]
    surf_ref, gold_ref = ray.put(surf_df), ray.put(gold_df)

    def attach(b: pa.Table) -> pa.Table:
        import ray as _r

        sd, gd = _r.get(surf_ref), _r.get(gold_ref)
        cands = sd.loc[b["norm_text"].to_pylist()].tolist()
        golds = gd.reindex(b["mention_uid"].to_pylist()).map(
            lambda v: list(v) if v is not None and not isinstance(v, float) else []
        ).tolist()
        return b.append_column("candidates", pa.array([list(c) for c in cands], pa.list_(pa.string()))).append_column(
            "gold_ids", pa.array(golds, pa.list_(pa.string()))
        )

    return mentions.map_batches(attach, batch_format="pyarrow")


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
    """Pairwise P/R/F1 + R@k + MRR vs the synthetic gold (reference
    evaluation formulas, eval.py:24-59)."""
    res, paths = _linkage_result(sf_dir)
    gold_tbl = pq.read_table(paths["mentions_gold"])
    m = res.mentions.select_columns(["mention_uid", "norm_text", "pred_id", "cluster_id"])
    joined = _attach_lists(m, res.surface_preds, paths["mentions_gold"])

    def non_nil_rank_stats(b: pa.Table) -> pa.Table:
        # R@k/MRR over mentions with ≥1 in-catalog gold: the reference scores
        # NIL via a sentinel *catalog row* (dictionary.py:67-72); this engine
        # thresholds instead, so NIL-only mentions are unrankable by design.
        has_real = pa.array(
            [any(g != NIL_ID for g in row) for row in b["gold_ids"].to_pylist()], pa.bool_()
        )
        return rank_stats_batch(b.filter(has_real), ks=(1, 10))

    partials = joined.map_batches(non_nil_rank_stats, batch_format="pyarrow")
    rk = recall_mrr(partials, ks=(1, 10))

    # Count-based exact pairwise metrics (pair enumeration is O(n²) and
    # times out beyond a few thousand mentions).
    mdf = res.mentions.to_pandas().set_index("mention_uid")
    gdf = gold_tbl.to_pandas()
    gold_sets = [frozenset(g) - {NIL_ID} for g in gdf["gold_ids"]]
    cl = mdf["cluster_id"].reindex(gdf["mention_uid"]).to_numpy(dtype=object)
    pr = mdf["pred_id"].reindex(gdf["mention_uid"]).to_numpy(dtype=object)
    clusters = [
        c if (isinstance(p, str) and p != NIL_ID) else None for c, p in zip(cl, pr)
    ]
    prf = pairwise_prf_counts(gold_sets, clusters)
    return pa.table(
        {
            "metric": pa.array(
                ["pairwise_precision", "pairwise_recall", "pairwise_f1", "recall@1", "recall@10", "mrr"],
                pa.string(),
            ),
            "value": pa.array(
                [
                    round(prf["precision"], 6),
                    round(prf["recall"], 6),
                    round(prf["f1"], 6),
                    round(rk["recall@1"], 6),
                    round(rk["recall@10"], 6),
                    round(rk["mrr"], 6),
                ],
                pa.float64(),
            ),
        }
    )


def entry() -> Any:
    """Flagship pipeline at the smallest scale; driver checks rows ≥ 0 and a
    stable schema."""
    return linkage_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = dict(QUERIES)
    out["linkage_clusters"] = linkage_clusters
    out["linkage_candidates"] = linkage_candidates
    out["linkage_eval"] = linkage_eval
    return out


def oracle_sql() -> dict[str, str]:
    """SQL-expressible subset; the rest (heuristics, sketches, seeded LSH,
    iterative clustering) are rows-only by design."""
    return dict(ORACLE_SQL)

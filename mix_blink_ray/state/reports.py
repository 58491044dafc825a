"""User-facing report artifacts — the engine analog of the reference's
``predicts.jsonl`` / ``eval_results.json`` outputs (``mix_blink/cli/
eval.py:118-133``):

- :func:`predict_report` — one nested row per mention:
  ``{"pid", "text", "mention", "gold": ["Name(id)", ...],
     "predict": [{"name", "id", "similarity", "description"}, ...]}``
  (``mix_blink/prediction/predict.py:34-52``: similarity rounded to 4,
  description truncated to 300 chars, gold rendered ``Name(id)``).
- :func:`write_predicts_jsonl` — ``Dataset.write_json`` to a sharded
  directory of JSONL part files (the resumable at-scale layout; the
  reference writes one file).
- :func:`write_eval_results_json` — the raw counter dict the reference
  dumps (``true``, ``tp_k``, ``reciprocal_rank``), pretty-printed.

The entity lookup tables (name, truncated description) are catalog-sized and
broadcast once via ``ray.put``; gold is broadcast below
``GOLD_BROADCAST_THRESHOLD`` mentions (the keyed-join fallback lives in
``__ray_entry__._attach_lists`` for the eval path).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset

__all__ = ["predict_report", "write_predicts_jsonl", "write_eval_results_json", "merge_rank_counters"]


def predict_report(
    res,
    catalog: pa.Table,
    gold: pa.Table | None = None,
    top_k: int = 5,
    gold_broadcast_threshold: int = 5_000_000,
) -> Dataset:
    """Build the nested per-mention prediction report from a LinkageResult.

    ``text`` carries the mention's source surface (the engine never re-ships
    full turn text through the pipeline; ``pid`` keys back to the turn).
    Fully vectorized: candidate lists slice + explode on Arrow offsets, one
    ``index_in`` against the broadcast catalog arrays, and the nested
    ``predict`` column is rebuilt as list<struct> from the same offsets.
    Gold (mention-sized) attaches via :func:`..stages.attach.attach_list_column`
    (broadcast below the threshold, keyed blob-join above)."""
    import pyarrow.compute as pc
    import ray

    from ..stages.attach import attach_list_column

    cat_df = catalog.to_pandas()
    id_keys = pa.array(cat_df["entity_id"], pa.string())
    name_vals = pa.array(cat_df["name"], pa.string())
    desc_vals = pa.array(
        [
            (d if d else f"{n} is an entity in this dictionary.")[:300]
            for n, d in zip(cat_df["name"], cat_df["description"])
        ],
        pa.string(),
    )
    surf_df = (
        res.surface_preds.select_columns(["norm_text", "candidates", "candidate_scores"])
        .to_pandas()
        .set_index("norm_text")
    )
    lut_ref = ray.put((id_keys, name_vals, desc_vals, surf_df))

    mentions = res.mentions.select_columns(["mention_uid", "norm_text", "surface"])
    if gold is not None:
        mentions = attach_list_column(
            mentions, gold.select(["mention_uid", "gold_ids"]), "mention_uid", "gold_ids",
            broadcast_threshold=gold_broadcast_threshold,
        )

    def build(b: pa.Table) -> pa.Table:
        keys, nm, dc, sd = ray.get(lut_ref)
        texts = b["norm_text"].to_pylist()
        cand = pc.list_slice(pa.array(sd["candidates"].loc[texts].tolist(), pa.list_(pa.string())), 0, top_k)
        scores = pc.list_slice(pa.array(sd["candidate_scores"].loc[texts].tolist(), pa.list_(pa.float64())), 0, top_k)
        off = np.asarray(cand.offsets, dtype=np.int32)
        ids = cand.flatten()
        pos = pc.index_in(ids, value_set=keys)
        sims = pc.divide(
            pc.cast(
                pc.round(pc.multiply(scores.flatten(), pa.scalar(10000.0)), round_mode="half_to_even"),
                pa.int64(),
            ),
            pa.scalar(10000.0),
        )  # Python round() semantics (reference predict.py:46)
        def _flat(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        struct = pa.StructArray.from_arrays(
            [
                _flat(pc.fill_null(pc.take(nm, pos), "")),
                _flat(pc.cast(ids, pa.string())),
                _flat(pc.cast(sims, pa.float64())),
                _flat(pc.fill_null(pc.take(dc, pos), "")),
            ],
            ["name", "id", "similarity", "description"],
        )
        predict_col = pa.ListArray.from_arrays(pa.array(off), struct)

        if "gold_ids" in b.column_names:
            gcol = b["gold_ids"]
            gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
            g_off = np.asarray(gcol.offsets, dtype=np.int32)
            g_ids = pc.cast(gcol.flatten(), pa.string())
            g_pos = pc.index_in(g_ids, value_set=keys)
            g_names = pc.if_else(pc.is_null(g_pos), g_ids, pc.take(nm, g_pos))  # unknown id → the id itself
            n_el = len(g_ids)
            rendered = pc.binary_join_element_wise(
                g_names, pa.array(["("] * n_el, pa.string()), g_ids, pa.array([")"] * n_el, pa.string()), ""
            )
            gold_col = pa.ListArray.from_arrays(pa.array(g_off), rendered.combine_chunks() if isinstance(rendered, pa.ChunkedArray) else rendered)
        else:
            gold_col = pa.array([[]] * b.num_rows, pa.list_(pa.string()))

        return pa.table(
            {
                "pid": b["mention_uid"],
                "text": b["surface"],
                "mention": b["surface"],
                "gold": gold_col,
                "predict": predict_col,
            }
        )

    return mentions.map_batches(build, batch_format="pyarrow")


def write_predicts_jsonl(report: Dataset, out_dir: str) -> str:
    """Sharded JSONL directory (one part file per block — resumable layout,
    never one giant file)."""
    path = os.path.join(out_dir, "predicts_jsonl")
    report.write_json(path)
    return path


def merge_rank_counters(partials) -> dict[str, float]:
    """Merge rank_stats_batch partial rows into the reference's raw counter
    dict (``evaluate`` output keys: true, tp_k, reciprocal_rank)."""
    df = partials.to_pandas() if hasattr(partials, "to_pandas") else partials
    out: dict[str, float] = {}
    for c in df.columns:
        s = df[c].sum()
        out[c] = float(s) if isinstance(s, (float, np.floating)) else int(s)
    return out


def write_eval_results_json(counters: dict, out_dir: str) -> str:
    """``eval_results.json`` exactly as the reference dumps it
    (``cli/eval.py:118-119``: ensure_ascii=False, indent=4)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "eval_results.json")
    with open(path, "w") as f:
        json.dump(counters, f, ensure_ascii=False, indent=4)
    return path

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


def predict_report(res, catalog: pa.Table, gold: pa.Table | None = None, top_k: int = 5) -> Dataset:
    """Build the nested per-mention prediction report from a LinkageResult.

    ``text`` carries the mention's source surface (the engine never re-ships
    full turn text through the pipeline; ``pid`` keys back to the turn).
    """
    import ray

    cat_df = catalog.to_pandas().set_index("entity_id")
    desc = {
        i: (d if d else f"{n} is an entity in this dictionary.")[:300]
        for i, n, d in zip(cat_df.index, cat_df["name"], cat_df["description"])
    }
    names = dict(zip(cat_df.index, cat_df["name"]))
    surf_df = (
        res.surface_preds.select_columns(["norm_text", "candidates", "candidate_scores"])
        .to_pandas()
        .set_index("norm_text")
    )
    gold_lut = (
        gold.to_pandas().set_index("mention_uid")["gold_ids"] if gold is not None else None
    )
    lut_ref = ray.put((names, desc, surf_df, gold_lut))

    def build(b: pa.Table) -> pa.Table:
        nm, dc, sd, gl = ray.get(lut_ref)
        rows = []
        cands = sd["candidates"].loc[b["norm_text"].to_pylist()].tolist()
        scores = sd["candidate_scores"].loc[b["norm_text"].to_pylist()].tolist()
        uids = b["mention_uid"].to_pylist()
        surfaces = b["surface"].to_pylist()
        golds = (
            gl.reindex(uids).map(lambda v: list(v) if v is not None and not isinstance(v, float) else []).tolist()
            if gl is not None
            else [[] for _ in uids]
        )
        for uid, surface, cl, sl, gs in zip(uids, surfaces, cands, scores, golds):
            predict = [
                {
                    "name": nm.get(cid, ""),
                    "id": cid,
                    "similarity": round(float(sc), 4),
                    "description": dc.get(cid, ""),
                }
                for cid, sc in zip(list(cl)[:top_k], list(sl)[:top_k])
            ]
            rows.append(
                {
                    "pid": uid,
                    "text": surface,
                    "mention": surface,
                    "gold": [f"{nm.get(g, g)}({g})" for g in gs],
                    "predict": predict,  # nested list<struct> → native JSON on write
                }
            )
        schema = pa.schema(
            [
                ("pid", pa.string()),
                ("text", pa.string()),
                ("mention", pa.string()),
                ("gold", pa.list_(pa.string())),
                (
                    "predict",
                    pa.list_(
                        pa.struct(
                            [
                                ("name", pa.string()),
                                ("id", pa.string()),
                                ("similarity", pa.float64()),
                                ("description", pa.string()),
                            ]
                        )
                    ),
                ),
            ]
        )
        return pa.Table.from_pylist(rows, schema=schema)

    return res.mentions.select_columns(["mention_uid", "norm_text", "surface"]).map_batches(
        build, batch_format="pyarrow"
    )


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

"""Resumability: work_dir stage checkpoints + sharded manifests survive
interruption and skip completed work (BASELINE.md resumability criterion)."""

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage
from mix_blink_ray.state.manifest import (
    ShardedStageWriter,
    completed_shards,
    input_fingerprint,
    shard_of,
)


def test_workdir_resume_identical(synth_small, tmp_path):
    """Interrupted run: later stages missing → rerun completes using the
    finished stages; output identical to a fresh run."""
    work = str(tmp_path / "work")
    tr = rd.from_arrow(synth_small["transcripts"])
    cfg = LinkageConfig(work_dir=work)
    full = run_linkage(tr, synth_small["catalog"], cfg).mentions.to_pandas()

    # Simulate a crash after the first stage: drop everything but `mentions`.
    for name in os.listdir(work):
        if name != "mentions":
            shutil.rmtree(os.path.join(work, name))
    resumed = run_linkage(
        rd.from_arrow(synth_small["transcripts"]), synth_small["catalog"], cfg
    ).mentions.to_pandas()
    cols = ["mention_uid", "pred_id", "cluster_id"]
    pd.testing.assert_frame_equal(
        full[cols].sort_values("mention_uid").reset_index(drop=True),
        resumed[cols].sort_values("mention_uid").reset_index(drop=True),
    )


def test_partial_stage_dir_is_recomputed(synth_small, tmp_path):
    """A stage dir left as .tmp (crash mid-write) must not be mistaken for a
    completed checkpoint."""
    work = str(tmp_path / "work")
    cfg = LinkageConfig(work_dir=work)
    tr = rd.from_arrow(synth_small["transcripts"])
    run_linkage(tr, synth_small["catalog"], cfg)
    # A .tmp dir from a crashed write
    os.makedirs(os.path.join(work, "bogus.tmp"), exist_ok=True)
    out = run_linkage(
        rd.from_arrow(synth_small["transcripts"]), synth_small["catalog"], cfg
    ).mentions.to_pandas()
    assert len(out) > 0


def test_sharded_manifest_roundtrip(tmp_path):
    out = str(tmp_path / "stage")
    w = ShardedStageWriter(out)
    t1 = pa.table({"conv_id": pa.array(["a", "b"]), "x": pa.array([1, 2])})
    t2 = pa.table({"conv_id": pa.array(["c"]), "x": pa.array([3])})
    fp1 = input_fingerprint(t1, ("conv_id",))
    fp2 = input_fingerprint(t2, ("conv_id",))
    w.write_shard(0, t1, fp1, metrics={"rows_in": 2})
    w.write_shard(1, t2, fp2)

    done = completed_shards(out, {0: fp1, 1: fp2})
    assert done == {0, 1}
    # stale fingerprint → shard not considered complete
    assert completed_shards(out, {0: "deadbeef", 1: fp2}) == {1}
    # manifest carries metrics + rows
    meta = json.load(open(os.path.join(out, "_manifest", "shard=0.json")))
    assert meta["rows"] == 2
    assert meta["metrics"]["rows_in"] == 2
    merged = w.read_all()
    assert merged.num_rows == 3


def test_shard_of_deterministic():
    col = pa.array([f"conv-{i}" for i in range(100)])
    a = shard_of(col, 8)
    b = shard_of(col, 8)
    assert (a == b).all()
    assert set(a.tolist()) <= set(range(8))
    assert len(set(a.tolist())) > 1


def test_fingerprint_order_insensitive():
    t1 = pa.table({"k": pa.array(["a", "b", "c"])})
    t2 = pa.table({"k": pa.array(["c", "a", "b"])})
    t3 = pa.table({"k": pa.array(["a", "b", "d"])})
    assert input_fingerprint(t1, ("k",)) == input_fingerprint(t2, ("k",))
    assert input_fingerprint(t1, ("k",)) != input_fingerprint(t3, ("k",))


def test_predict_report_and_eval_artifacts(synth_small, tmp_path):
    """Reference report parity (cli/eval.py:118-133, predict.py:34-52):
    predicts JSONL rows carry pid/text/mention/gold/predict with similarity
    rounded to 4 and description <= 300 chars; eval_results.json is valid."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage
    from mix_blink_ray.state.reports import (
        predict_report,
        write_eval_results_json,
        write_predicts_jsonl,
    )

    res = run_linkage(
        rd.from_arrow(synth_small["transcripts"]), synth_small["catalog"], LinkageConfig()
    )
    report = predict_report(res, synth_small["catalog"], gold=synth_small["mentions_gold"])
    out = write_predicts_jsonl(report, str(tmp_path))
    rows = []
    for part in sorted(os.listdir(out)):
        with open(os.path.join(out, part)) as f:
            rows += [json.loads(l) for l in f if l.strip()]
    assert len(rows) == res.mentions.count()
    r = rows[0]
    assert set(r) == {"pid", "text", "mention", "gold", "predict"}
    assert len(r["predict"]) <= 5
    for p in r["predict"]:
        assert set(p) == {"name", "id", "similarity", "description"}
        assert len(p["description"]) <= 300
        assert round(p["similarity"], 4) == p["similarity"]
    gold_rows = [r for r in rows if r["gold"]]
    assert gold_rows and all("(" in g and g.endswith(")") for r in gold_rows for g in r["gold"])

    path = write_eval_results_json({"true": 10, "tp_1": 9, "reciprocal_rank": 9.5}, str(tmp_path))
    assert json.load(open(path))["tp_1"] == 9

"""End-to-end parity + F1 gates: Ray pipeline vs single-process oracle vs gold.

These are the BASELINE.md correctness gates:
- pipeline == oracle exactly (pred_id and cluster partition) ⇒ parity F1 = 1.0
- pairwise F1 ≥ 0.99 vs gold labeled pairs (FIXTURES.md §4)
- per-turn text equality invariant under (conv_id, turn_idx) keys
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.evaluation.metrics import labeled_pairs_from_gold, pairwise_prf
from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage
from mix_blink_ray.pipelines.oracle import oracle_linkage
from mix_blink_ray.sources.synth import NIL_ID, SynthConfig, generate


@pytest.fixture(scope="module")
def linkage_run(synth_small):
    cfg = LinkageConfig()
    tr = rd.from_arrow(synth_small["transcripts"])
    res = run_linkage(tr, synth_small["catalog"], cfg)
    mentions = res.mentions.to_pandas()
    oracle = oracle_linkage(synth_small["transcripts"], synth_small["catalog"], cfg)
    return cfg, mentions, oracle, res


def test_pipeline_matches_oracle_predictions(linkage_run):
    _, mentions, oracle, _ = linkage_run
    got = mentions[["mention_uid", "pred_id"]].sort_values("mention_uid").reset_index(drop=True)
    want = oracle["mentions"][["mention_uid", "pred_id"]].sort_values("mention_uid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_pipeline_matches_oracle_clusters_exactly(linkage_run):
    """Same partition AND same canonical labels (min node id per component)."""
    _, mentions, oracle, _ = linkage_run
    got = dict(zip(mentions["mention_uid"], mentions["cluster_id"]))
    want = dict(zip(oracle["mentions"]["mention_uid"], oracle["mentions"]["cluster_id"]))
    assert got == want


def test_parity_pairwise_f1_is_one(linkage_run, synth_small):
    """The BASELINE gate, measured the way the rule states it: pairwise F1 of
    the pipeline against oracle predictions on labeled pairs ≥ 0.99 (here
    exactly 1.0 because the partitions are identical)."""
    _, mentions, oracle, _ = linkage_run
    labeled = labeled_pairs_from_gold(synth_small["mentions_gold"])
    # treat oracle clusters as "truth", pipeline clusters as prediction
    oracle_cl = dict(zip(oracle["mentions"]["mention_uid"], oracle["mentions"]["cluster_id"]))
    pipe_cl = dict(zip(mentions["mention_uid"], mentions["cluster_id"]))
    a = labeled["a_uid"].to_pylist()
    b = labeled["b_uid"].to_pylist()
    same_o = np.array([oracle_cl[x] == oracle_cl[y] for x, y in zip(a, b)])
    same_p = np.array([pipe_cl[x] == pipe_cl[y] for x, y in zip(a, b)])
    tp = int((same_o & same_p).sum())
    fp = int((~same_o & same_p).sum())
    fn = int((same_o & ~same_p).sum())
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    assert f1 >= 0.99
    assert f1 == 1.0  # stronger: exact agreement


def test_gold_pairwise_f1_gate(linkage_run, synth_small):
    _, mentions, _, _ = linkage_run
    labeled = labeled_pairs_from_gold(synth_small["mentions_gold"])
    # NIL-predicted mentions are singletons: exclude their cluster equality
    cluster_of = {}
    for uid, cid, pid in zip(mentions["mention_uid"], mentions["cluster_id"], mentions["pred_id"]):
        cluster_of[uid] = cid if pid != NIL_ID else f"singleton:{uid}"
    prf = pairwise_prf(labeled, cluster_of)
    assert prf["f1"] >= 0.99, prf


def test_dup_entities_cluster_together(linkage_run, synth_small):
    """Multi-label golds (duplicate catalog ids) must land in ONE cluster —
    the entity-entity edge path (analog of multi-label gold handling,
    dataset_toy.jsonl:3)."""
    _, mentions, _, res = linkage_run
    cat = synth_small["catalog"].to_pandas()
    dups = cat[cat.dup_of.notna()]
    assert len(dups) > 0
    clusters = res.clusters.to_pandas()
    label_of = dict(zip(clusters["node"], clusters["label"]))
    for _, row in dups.iterrows():
        assert label_of[f"e:{row.entity_id}"] == label_of[f"e:{row.dup_of}"]


def test_nil_mentions_are_singletons(linkage_run, synth_small):
    _, mentions, _, _ = linkage_run
    gold = synth_small["mentions_gold"].to_pandas()
    nil_uids = set(gold[gold.gold_ids.map(lambda g: list(g) == [NIL_ID])]["mention_uid"])
    m = mentions[mentions.mention_uid.isin(nil_uids)]
    # NIL-predicted mentions keep their own node as cluster id
    nilpred = m[m.pred_id == NIL_ID]
    assert (nilpred.cluster_id == "m:" + nilpred.mention_uid).all()


def test_per_turn_text_equality_invariant(synth_small):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering vs the source table — verified by keyed
    anti-join (zero diffs), never by row order."""
    tr = rd.from_arrow(synth_small["transcripts"])
    out = tr.map_batches(lambda b: b, batch_format="pyarrow")  # engine passthrough
    left = out.to_pandas().set_index(["conv_id", "turn_idx"])["text"].sort_index()
    right = synth_small["transcripts"].to_pandas().set_index(["conv_id", "turn_idx"])["text"].sort_index()
    assert left.equals(right)


def test_stream_equals_contract_strategy(synth_small):
    """The zero-shuffle stream path must be byte-identical to the contraction
    path (same preds, same clusters)."""
    tr = rd.from_arrow(synth_small["transcripts"])
    a = run_linkage(tr, synth_small["catalog"], LinkageConfig(scoring_strategy="stream")).mentions.to_pandas()
    b = run_linkage(tr, synth_small["catalog"], LinkageConfig(scoring_strategy="contract")).mentions.to_pandas()
    cols = ["mention_uid", "pred_id", "best_id", "cluster_id"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("mention_uid").reset_index(drop=True),
        b[cols].sort_values("mention_uid").reset_index(drop=True),
    )


def test_deterministic_rerun(synth_small):
    cfg = LinkageConfig()
    tr = rd.from_arrow(synth_small["transcripts"])
    r1 = run_linkage(tr, synth_small["catalog"], cfg).mentions.to_pandas()
    r2 = run_linkage(tr, synth_small["catalog"], cfg).mentions.to_pandas()
    k = ["mention_uid", "pred_id", "cluster_id"]
    pd.testing.assert_frame_equal(
        r1[k].sort_values("mention_uid").reset_index(drop=True),
        r2[k].sort_values("mention_uid").reset_index(drop=True),
    )


def test_pairwise_counts_equals_enumeration(linkage_run, synth_small):
    """The O(n+V²) count-based pairwise metrics must equal pair enumeration."""
    from mix_blink_ray.evaluation.metrics import pairwise_prf_counts

    _, mentions, _, _ = linkage_run
    gold = synth_small["mentions_gold"].to_pandas()
    mdf = mentions.set_index("mention_uid")
    cluster_of = {}
    for uid, cid, pid in zip(mentions["mention_uid"], mentions["cluster_id"], mentions["pred_id"]):
        cluster_of[uid] = cid if pid != NIL_ID else f"singleton:{uid}"
    labeled = labeled_pairs_from_gold(synth_small["mentions_gold"])
    slow = pairwise_prf(labeled, cluster_of)

    gold_sets = [frozenset(g) - {NIL_ID} for g in gold["gold_ids"]]
    cl = mdf["cluster_id"].reindex(gold["mention_uid"]).to_numpy(dtype=object)
    pr = mdf["pred_id"].reindex(gold["mention_uid"]).to_numpy(dtype=object)
    clusters = [c if (isinstance(p, str) and p != NIL_ID) else None for c, p in zip(cl, pr)]
    fast = pairwise_prf_counts(gold_sets, clusters)
    for k in ("tp", "fp", "fn", "precision", "recall", "f1"):
        assert fast[k] == slow[k], (k, fast[k], slow[k])


def test_non_ascii_transcripts_safe():
    """Non-ASCII turn text must flow through extract → score → cluster with
    valid UTF-8 surfaces (byte-offset contract: mentions are ASCII
    capitalized runs by design; multi-byte codepoints act as separators and
    never get split mid-codepoint)."""
    import pyarrow as pa
    import ray.data as rd

    from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage
    from mix_blink_ray.stages.mentions import extract_mentions

    texts = [
        "the café in Zürich hired Acme Corp — naïve plan",
        "中文文本 with Globex Inc mentioned 日本語",
        "emoji 🎉 before Initech and after 🎊 done",
        "Ünïcödé only here, nothing else",
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "role": pa.array(["user"] * len(texts)),
            "text": pa.array(texts),
            "tool": pa.array([""] * len(texts)),
            "ts": pa.array([0] * len(texts), pa.timestamp("us")),
        }
    )
    m = extract_mentions(tbl)
    surfaces = m["surface"].to_pylist()
    for s in surfaces:
        s.encode()  # valid text, never split mid-codepoint
    assert "Acme Corp" in surfaces and "Globex Inc" in surfaces and "Initech" in surfaces

    catalog = pa.table(
        {
            "entity_id": pa.array(["000001", "000002"]),
            "name": pa.array(["Acme Corp", "Globex Inc"]),
            "description": pa.array(["", ""]),
        }
    )
    res = run_linkage(rd.from_arrow(tbl), catalog, LinkageConfig())
    out = res.mentions.to_pandas()
    assert len(out) == len(m)
    assert out["cluster_id"].notna().all()

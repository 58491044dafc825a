"""Generator determinism + mention extraction correctness vs planted gold."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mix_blink_ray.sources.synth import NIL_ID, SynthConfig, generate, generate_cached
from mix_blink_ray.stages.mentions import extract_mentions, mentions_from_annotations


def test_generator_deterministic(synth_small):
    t2 = generate(SynthConfig(n_convs=80))
    for k in ("transcripts", "mentions_gold", "catalog"):
        assert t2[k].equals(synth_small[k])


def test_generator_subset_stability(synth_small):
    """Any smaller corpus is a prefix-consistent subset (per-conv derivation)."""
    small = generate(SynthConfig(n_convs=10))
    big_tr = synth_small["transcripts"]
    sub = big_tr.filter(pc.is_in(big_tr["conv_id"], value_set=pa.array(sorted(set(small["transcripts"]["conv_id"].to_pylist())))))
    assert sub.num_rows == small["transcripts"].num_rows
    assert sorted(sub.to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"])) == sorted(
        small["transcripts"].to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"])
    )


def test_transcript_schema(synth_small):
    tr = synth_small["transcripts"]
    assert tr.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert tr.schema.field("turn_idx").type == pa.int32()
    assert pa.types.is_timestamp(tr.schema.field("ts").type)
    # turn_idx dense and unique within conv
    df = tr.to_pandas()
    for _, g in df.groupby("conv_id"):
        assert sorted(g["turn_idx"]) == list(range(len(g)))
        assert g.sort_values("turn_idx")["ts"].is_monotonic_increasing


def test_extraction_matches_planted_gold(synth_small):
    tr, mg = synth_small["transcripts"], synth_small["mentions_gold"]
    m = extract_mentions(tr)
    got = {u: s for u, s in zip(m["mention_uid"].to_pylist(), m["surface"].to_pylist())}
    want = {u: s for u, s in zip(mg["mention_uid"].to_pylist(), mg["surface"].to_pylist())}
    assert got == want  # exact uid + surface agreement, both directions


def test_extraction_hand_cases():
    tbl = pa.table(
        {
            "conv_id": pa.array(["c"] * 6),
            "turn_idx": pa.array(range(6), pa.int32()),
            "role": pa.array(["user"] * 6),
            "text": pa.array(
                [
                    "we met Zormak Systems about terms",   # multi-word run
                    "no mentions in this turn",             # zero mentions
                    "both Alpha and Beta Corp bid",         # two runs
                    "ends with Gamma",                      # run at end
                    "Delta starts the turn",                # run at start
                    "single X char",                        # below min_chars
                ]
            ),
            "tool": pa.array([""] * 6),
            "ts": pa.array([0] * 6, pa.timestamp("us")),
        }
    )
    m = extract_mentions(tbl)
    surfaces = m["surface"].to_pylist()
    assert surfaces == ["Zormak Systems", "Alpha", "Beta Corp", "Gamma", "Delta"]
    # offsets are exact half-open slices
    texts = {r["mention_uid"]: r for r in m.to_pylist()}
    for r in texts.values():
        turn_text = tbl["text"][r["turn_idx"]].as_py()
        assert turn_text[r["start"] : r["end"]] == r["surface"]


def test_mentions_from_annotations(synth_small):
    tr, mg = synth_small["transcripts"], synth_small["mentions_gold"]
    spans = mg.select(["conv_id", "turn_idx", "start", "end"])
    m = mentions_from_annotations(tr, spans)
    assert m["surface"].to_pylist() == mg["surface"].to_pylist()
    assert m["mention_uid"].to_pylist() == mg["mention_uid"].to_pylist()


def test_gold_properties(synth_small):
    mg = synth_small["mentions_gold"]
    cat = synth_small["catalog"]
    ids = set(cat["entity_id"].to_pylist()) | {NIL_ID}
    for r in mg.to_pylist():
        assert len(r["gold_ids"]) >= 1
        assert set(r["gold_ids"]) <= ids
        assert len(r["hard_negative_ids"]) == 3
        assert not (set(r["hard_negative_ids"]) & set(r["gold_ids"]))  # gold-excluded
    # multi-label (dup-entity) golds exist
    assert any(len([g for g in r["gold_ids"] if g != NIL_ID]) > 1 for r in mg.to_pylist())
    # NIL mentions exist
    assert any(r["gold_ids"] == [NIL_ID] for r in mg.to_pylist())


def test_generate_cached_roundtrip(tmp_path):
    cfg = SynthConfig(n_convs=5)
    p1 = generate_cached(cfg, cache_root=str(tmp_path))
    p2 = generate_cached(cfg, cache_root=str(tmp_path))
    assert p1 == p2
    import pyarrow.parquet as pq

    assert pq.read_table(p1["transcripts"]).equals(generate(cfg)["transcripts"])


def test_resolve_gold_labels_reference_semantics():
    """M2/M3: unknown labels dropped (remove_nil) or raise (strict); mentions
    with zero resolvable labels filtered (reference dataset.py:94-116).
    Toy-corpus analog: 8 mentions -> 6 with NIL removed (test_dataset.py:64-67)."""
    import pytest
    from mix_blink_ray.stages.mentions import resolve_gold_labels

    batch = pa.table(
        {
            "mention_uid": pa.array([f"m{i}" for i in range(8)]),
            "gold_ids": pa.array(
                [
                    ["e1"], ["e2"], ["e1", "-1"], ["-1"],      # multi-label + NIL-only
                    ["e3"], ["e1", "e2"], ["-1"], ["e2"],
                ]
            ),
        }
    )
    known = {"e1", "e2", "e3"}
    out = resolve_gold_labels(batch, known, remove_nil=True)
    # the two NIL-only mentions drop out: 8 -> 6 (reference toy expectation)
    assert out.num_rows == 6
    assert out["gold_ids"].to_pylist() == [["e1"], ["e2"], ["e1"], ["e3"], ["e1", "e2"], ["e2"]]
    with pytest.raises(KeyError):
        resolve_gold_labels(batch, known, remove_nil=False)
    # with the NIL sentinel in the catalog, everything resolves (8 kept)
    out2 = resolve_gold_labels(batch, known | {"-1"}, remove_nil=True)
    assert out2.num_rows == 8

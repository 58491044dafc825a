"""Unit tests for the scoring stage: top-k semantics, hard negatives, measures."""

import numpy as np
import pyarrow as pa
import pytest

from mix_blink_ray.functions.encoder import HashNgramEncoder
from mix_blink_ray.functions.similarity import score_matrix, topk_indices
from mix_blink_ray.stages.scoring import (
    ScoringConfig,
    SurfaceScorer,
    build_catalog_index,
    split_candidates_hard_negatives,
)


def make_catalog(names):
    ids = [f"{i:06d}" for i in range(len(names))]
    return pa.table(
        {
            "entity_id": pa.array(ids),
            "name": pa.array(names),
            "description": pa.array([""] * len(names)),
        }
    )


def make_scorer(catalog, **cfg_kwargs):
    cfg = ScoringConfig(**cfg_kwargs)
    scorer = SurfaceScorer.__new__(SurfaceScorer)
    scorer.cfg = cfg
    scorer.index = build_catalog_index(catalog, cfg=cfg)
    scorer.encoder = HashNgramEncoder(dim=cfg.encoder_dim)
    return scorer


def test_topk_deterministic_tiebreak():
    scores = np.array([[1.0, 2.0, 2.0, 0.5]])
    idx, sc = topk_indices(scores, 3)
    assert idx.tolist() == [[1, 2, 0]]  # equal scores → lower index first
    assert sc.tolist() == [[2.0, 2.0, 1.0]]


def test_topk_k_clamp_and_error():
    scores = np.ones((2, 3))
    idx, _ = topk_indices(scores, 10)  # clamped (reference dense.py:89-91)
    assert idx.shape == (2, 3)
    with pytest.raises(ValueError):
        topk_indices(scores, 0)  # reference dense.py:87-88


def test_measures_ranking_consistency():
    """ip/cos agree on normalized vectors; l2 is negative distance (nearest
    first — the engine FIXES the reference's l2 sign quirk, SURVEY §2.11.1)."""
    rng = np.random.RandomState(0)
    q = rng.randn(4, 8).astype(np.float32)
    c = rng.randn(10, 8).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    s_ip = score_matrix(qn, cn, "ip")
    s_cos = score_matrix(qn, cn, "cos")
    np.testing.assert_allclose(s_ip, s_cos)
    s_l2 = score_matrix(q, c, "l2")
    # negative-L2 argmax == true nearest neighbor
    d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(s_l2.argmax(1), d.argmin(1))
    with pytest.raises(ValueError):
        score_matrix(q, c, "bogus")


def test_surface_scorer_exact_match_wins():
    cat = make_catalog(["Zormak Systems", "Beltran Labs", "Quilhul Corp"])
    scorer = make_scorer(cat)
    out = scorer(pa.table({"norm_text": pa.array(["zormak systems", "beltran labs", "zzzzz qqqqq"])}))
    assert out["pred_id"].to_pylist()[:2] == ["000000", "000001"]
    assert out["pred_id"].to_pylist()[2] == "-1"  # NIL below threshold
    assert out["best_score"][0].as_py() == pytest.approx(1.0, abs=1e-5)


def test_surface_scorer_typo_links():
    cat = make_catalog(["Zormakel Systems", "Beltranov Labs", "Quilhulgar Corp"])
    scorer = make_scorer(cat)
    out = scorer(pa.table({"norm_text": pa.array(["zormkael systems", "beltrnaov labs"])}))
    assert out["pred_id"].to_pylist() == ["000000", "000001"]


def test_surface_scorer_candidate_list_sorted():
    cat = make_catalog([f"Entity{chr(65+i)} Corp" for i in range(20)])
    scorer = make_scorer(cat, top_k=5, extra_k=3)
    out = scorer(pa.table({"norm_text": pa.array(["entitya corp"])}))
    scores = out["candidate_scores"][0].as_py()
    assert len(scores) == 8  # top_k + extra_k
    assert scores == sorted(scores, reverse=True)


def test_tiled_topk_equals_untiled():
    cat = make_catalog([f"Name{i:03d} {s}" for i, s in zip(range(50), ["Alpha", "Beta", "Gamma", "Delta", "Eps"] * 10)])
    s_small = make_scorer(cat)
    s_tiled = make_scorer(cat, catalog_tile=7)  # force many tiles
    batch = pa.table({"norm_text": pa.array(["name007 beta", "name033 delta", "unrelated"])})
    a, b = s_small(batch), s_tiled(batch)
    assert a["candidates"].to_pylist() == b["candidates"].to_pylist()
    assert a["pred_id"].to_pylist() == b["pred_id"].to_pylist()


def test_split_candidates_hard_negatives_reference_semantics():
    """candidates = pre-gold-removal prefix (may contain gold, dense.py:115);
    hard_negatives exclude gold (dense.py:113-120)."""
    batch = pa.table(
        {
            "uid": pa.array(["a", "b", "c"]),
            "candidates": pa.array(
                [
                    ["e1", "e2", "e3", "e4", "e5"],
                    ["x1", "x2", "x3", "x4", "x5"],
                    ["g1", "g2", "n1", "n2", "n3"],
                ]
            ),
            "gold_ids": pa.array([["e2"], [], ["g1", "g2"]]),
        }
    )
    out = split_candidates_hard_negatives(batch, top_k=3)
    assert out["candidates"].to_pylist() == [
        ["e1", "e2", "e3"],   # gold e2 still present
        ["x1", "x2", "x3"],
        ["g1", "g2", "n1"],
    ]
    assert out["hard_negatives"].to_pylist() == [
        ["e1", "e3", "e4"],   # gold e2 removed, backfilled from deeper ranks
        ["x1", "x2", "x3"],
        ["n1", "n2", "n3"],   # both golds removed
    ]
    # never contains gold (reference test_retriever.py:169-190 behavior)
    for hn, g in zip(out["hard_negatives"].to_pylist(), batch["gold_ids"].to_pylist()):
        assert not set(hn) & set(g)


def test_nil_sentinel_catalog_row_mode():
    """Reference ranked-NIL mode (dictionary.py:67-72): with nil_sentinel on,
    the catalog gains a '-1'/'[NIL]' row, NIL appears IN the ranked candidate
    list, and prediction is pure top-1 (no threshold)."""
    from mix_blink_ray.sources.synth import NIL_ID

    catalog = make_catalog(["Acme Corp", "Globex Inc", "Initech LLC"])
    scorer = make_scorer(catalog, nil_sentinel=True, top_k=4, extra_k=0, rerank_jw=False)
    assert NIL_ID in scorer.index.entity_ids.tolist()
    assert len(scorer.index.entity_ids) == 4
    # ids stay sorted ascending ("-1" < "000000") for deterministic tie-break
    assert list(scorer.index.entity_ids) == sorted(scorer.index.entity_ids)

    out = scorer(pa.table({"norm_text": pa.array(["acme corp", "zzz qqq vvv"])}))
    cands = out["candidates"].to_pylist()
    assert all(NIL_ID in c for c in cands)          # sentinel is ranked
    assert out["pred_id"][0].as_py() == "000000"    # exact-ish match wins

    # Hand-computed rank parity: pred = argmax over the same 4-row index
    enc = HashNgramEncoder(dim=scorer.cfg.encoder_dim)
    q = enc.encode(pa.array(["acme corp"]))
    scores = (q @ scorer.index.emb.T)[0]
    assert out["candidates"][0].as_py()[0] == scorer.index.entity_ids[int(np.argmax(scores))]

    # Threshold mode (default) never ranks NIL and thresholds instead.
    scorer_off = make_scorer(catalog, top_k=4, extra_k=0, rerank_jw=False)
    out_off = scorer_off(pa.table({"norm_text": pa.array(["zzz qqq vvv"])}))
    assert NIL_ID not in out_off["candidates"][0].as_py()
    assert out_off["pred_id"][0].as_py() == NIL_ID  # below tau_nil → NIL


def test_catalog_index_persistence_roundtrip(tmp_path, monkeypatch):
    """save/load roundtrip is exact, and build_catalog_index(cache_path=...)
    reuses the artifact instead of re-encoding (reference build_index
    artifact semantics, dense.py:124-137) — but ONLY when the persisted
    content fingerprint matches; a legacy artifact without one is rebuilt."""
    from mix_blink_ray.stages.scoring import (
        build_catalog_index,
        load_catalog_index,
        save_catalog_index,
    )

    catalog = make_catalog(["Acme Corp", "Globex Inc", "Initech LLC"])
    cfg = ScoringConfig()
    idx = build_catalog_index(catalog, cfg=cfg)
    path = str(tmp_path / "catalog_index.parquet")
    save_catalog_index(idx, path)
    loaded = load_catalog_index(path)
    assert list(loaded.entity_ids) == list(idx.entity_ids)
    assert list(loaded.norm_names) == list(idx.norm_names)
    np.testing.assert_array_equal(loaded.emb, idx.emb)

    calls = {"n": 0}
    orig_encode = HashNgramEncoder.encode

    def counting(self, arr):
        calls["n"] += 1
        return orig_encode(self, arr)

    monkeypatch.setattr(HashNgramEncoder, "encode", counting)

    # legacy artifact (no fingerprint) is never trusted → one rebuild,
    # which persists the fingerprint
    out = build_catalog_index(catalog, cfg=cfg, cache_path=path)
    assert calls["n"] == 1
    np.testing.assert_array_equal(out.emb, idx.emb)
    # fingerprinted artifact + same catalog → cache hit, no encode call
    out_b = build_catalog_index(catalog, cfg=cfg, cache_path=path)
    assert calls["n"] == 1
    np.testing.assert_array_equal(out_b.emb, idx.emb)
    # stale cache (different catalog) → rebuilt and overwritten
    bigger = make_catalog(["Acme Corp", "Globex Inc", "Initech LLC", "Umbra Labs"])
    out2 = build_catalog_index(bigger, cfg=cfg, cache_path=path)
    assert calls["n"] == 2
    assert len(out2.entity_ids) == 4
    assert len(load_catalog_index(path).entity_ids) == 4


def test_sharded_catalog_scoring_matches_broadcast(synth_small):
    """score_surfaces_sharded (catalog streams, surfaces broadcast) must be
    output-identical to SurfaceScorer (catalog broadcast, surfaces stream) —
    candidates, scores, predictions, including JW rerank + NIL threshold."""
    import ray.data as rd

    from mix_blink_ray.stages.mentions import extract_mentions
    from mix_blink_ray.stages.scoring import score_surfaces_sharded

    cfg = ScoringConfig()
    mentions = extract_mentions(synth_small["transcripts"])
    surf = pa.table({"norm_text": pa.array(sorted(set(mentions["norm_text"].to_pylist())), pa.string())})

    scorer = make_scorer(synth_small["catalog"])
    want = scorer(surf).to_pandas().sort_values("norm_text").reset_index(drop=True)

    # small batch_size forces MANY catalog blocks → the merge path is real
    cat_ds = rd.from_arrow(synth_small["catalog"]).repartition(6)
    got = (
        score_surfaces_sharded(rd.from_arrow(surf), cat_ds, cfg)
        .to_pandas()
        .sort_values("norm_text")
        .reset_index(drop=True)
    )
    assert list(got["norm_text"]) == list(want["norm_text"])
    assert list(got["pred_id"]) == list(want["pred_id"])
    assert list(got["best_id"]) == list(want["best_id"])
    assert [list(c) for c in got["candidates"]] == [list(c) for c in want["candidates"]]
    import numpy as np

    np.testing.assert_allclose(
        np.concatenate([np.asarray(s) for s in got["candidate_scores"]]),
        np.concatenate([np.asarray(s) for s in want["candidate_scores"]]),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(got["pred_score"], want["pred_score"], rtol=0, atol=1e-6)


def test_catalog_index_cache_rejects_renamed_entities(tmp_path):
    """Round-2 ADVICE: same id set + same dim but RENAMED entities must
    rebuild the cached index, not silently reuse stale embeddings."""
    import numpy as np
    import pyarrow as pa

    from mix_blink_ray.stages.scoring import ScoringConfig, build_catalog_index

    cfg = ScoringConfig(encoder_dim=64)
    cat1 = pa.table(
        {
            "entity_id": pa.array(["E1", "E2", "E3"], pa.string()),
            "name": pa.array(["Steel Hawk", "Moon Garden", "Quantum Forge"], pa.string()),
        }
    )
    cache = str(tmp_path / "idx.parquet")
    idx1 = build_catalog_index(cat1, cfg=cfg, cache_path=cache)
    # identical catalog -> cache hit, byte-identical embeddings
    idx1b = build_catalog_index(cat1, cfg=cfg, cache_path=cache)
    np.testing.assert_array_equal(idx1.emb, idx1b.emb)

    cat2 = cat1.set_column(1, "name", pa.array(["Steel Hawk", "Moon Garden", "RENAMED Forge"], pa.string()))
    idx2 = build_catalog_index(cat2, cfg=cfg, cache_path=cache)
    assert list(idx2.names) == ["Steel Hawk", "Moon Garden", "RENAMED Forge"]
    assert not np.array_equal(idx1.emb, idx2.emb)  # rebuilt, not reused
    # and a different encoder dim also rebuilds rather than trusting the file
    idx3 = build_catalog_index(cat2, cfg=ScoringConfig(encoder_dim=32), cache_path=cache)
    assert idx3.emb.shape[1] == 32

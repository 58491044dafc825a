"""Stage 2 — pairwise candidate scoring on actor pools over Arrow batches.

Two scoring paths, both fed by the blocking stage:

- :class:`SurfaceScorer` — the engine's analog of the reference's FAISS flat
  retrieval (``mix_blink/retriever/dense.py:86-99``): every distinct mention
  surface is scored against the **broadcast** entity catalog (``ray.put`` once,
  ``ray.get`` in each actor's ``__init__`` — never re-shipped per batch) with a
  tiled dense top-k, so the catalog side never shuffles.  Top-k semantics
  mirror the reference: k clamped to |catalog| with a warning
  (``dense.py:89-91``), deterministic tie-break ``(score desc, entity_id
  asc)``, NIL by score threshold (the engine's analog of the reference's
  learned ``[NIL]`` sentinel entity, ``mix_blink/data/dictionary.py:67-72``).

- :func:`make_pair_generator` / :class:`PairScorer` — within-block pair
  candidate generation (``groupby(block_key).map_groups``) with a cheap
  MinHash-Jaccard prefilter, then exact scoring (encoder cosine + vectorized
  Jaro-Winkler) on the surviving pairs.  Used for entity-entity duplicate
  detection (catalog dedup → multi-label gold handling) and optional
  mention-mention edges.

:func:`split_candidates_hard_negatives` reproduces the reference's
gold-removal anti-join exactly (``mix_blink/retriever/dense.py:102-122``):
*candidates* are the pre-gold-removal prefix (may contain gold,
``dense.py:115``), *hard negatives* never contain gold (``:113-120``) — fully
vectorized over exploded Arrow list columns, keyed by row, never positional.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.encoder import Encoder, HashNgramEncoder
from ..functions.hashing import char_ngram_hashes, flat_utf8, hash_strings, minhash_signatures
from ..functions.similarity import score_matrix, topk_indices
from ..functions.strings import jaro_winkler_pairs, pad_codes
from ..sources.synth import NIL_ID

__all__ = [
    "ScoringConfig",
    "CatalogIndex",
    "build_catalog_index",
    "save_catalog_index",
    "load_catalog_index",
    "SurfaceScorer",
    "score_surfaces_sharded",
    "make_pair_generator",
    "PairScorer",
    "split_candidates_hard_negatives",
]

_ROW_MIX = np.uint64(0xC2B2AE3D27D4EB4F)

_FP_META_KEY = b"mbr_catalog_fingerprint"


def catalog_fingerprint(catalog: pa.Table, cfg: "ScoringConfig", encoder: "Encoder | None") -> str:
    """Content fingerprint of everything a cached index depends on: the
    (entity_id, name) pairs, the encoder identity/dim, and the NIL config.
    A cache whose persisted fingerprint differs is rebuilt, never trusted —
    the id-set/dim check alone cannot see renamed entities or a different
    encoder (round-2 ADVICE)."""
    import hashlib

    order = pc.sort_indices(catalog["entity_id"])
    ids = pc.cast(pc.take(catalog["entity_id"], order), pa.string())
    names = pc.fill_null(pc.cast(pc.take(catalog["name"], order), pa.string()), "")
    joined = pc.binary_join_element_wise(ids, names, "\x1f")
    data, offs = flat_utf8(joined)
    h = hashlib.sha256()
    h.update(data.tobytes())
    h.update(offs.tobytes())  # row boundaries keep (a,bc) distinct from (ab,c)
    enc_tag = type(encoder).__name__ if encoder is not None else HashNgramEncoder.__name__
    h.update(
        f"|dim={cfg.encoder_dim}|measure={cfg.measure}|nil={int(cfg.nil_sentinel)}:{cfg.nil_name}|enc={enc_tag}".encode()
    )
    return h.hexdigest()


@dataclass(frozen=True)
class ScoringConfig:
    measure: str = "ip"          # ip | cos | l2 (l2 scored as NEGATIVE distance)
    top_k: int = 10              # reference candidates default (cli/get_candidates.py:165)
    extra_k: int = 8             # headroom for gold removal (dense.py:102-111)
    tau_nil: float = 0.50        # combined-score below this → NIL prediction
    # Reference NIL mode: append a learned "[NIL]" sentinel entity to the
    # catalog so NIL is RANKED like any other candidate
    # (mix_blink/data/dictionary.py:67-72) instead of thresholded.  With the
    # sentinel on, NIL-only mentions become rankable in recall@k eval.
    nil_sentinel: bool = False
    nil_name: str = "[NIL]"
    rerank_jw: bool = True       # rerank dense top-k by 0.5·cos + 0.5·Jaro-Winkler
    rerank_k: int = 8            # JW computed for this many dense leaders only
    jw_weight: float = 0.5
    tau_pair_jaccard: float = 0.12   # MinHash prefilter for in-block pairs
    tau_edge_mention: float = 0.80   # mention-mention edge threshold (cos)
    tau_edge_entity: float = 0.90    # entity-entity duplicate threshold (cos)
    tau_jw: float = 0.90             # Jaro-Winkler confirmation for pair edges
    encoder_dim: int = 256
    catalog_tile: int = 65536    # entities per score-matrix tile (bounds memory)
    num_perms: int = 64
    seed: int = 42


@dataclass
class CatalogIndex:
    """The broadcastable 'index': plain arrays, zero-copy friendly.

    Replaces the reference's FAISS index + positional ``meta_ids_to_keys``
    sidecar (``mix_blink/retriever/dense.py:41-47``): the entity-id column is
    carried alongside the embedding matrix, no positional mapping.
    Entity ids are sorted ascending so top-k tie-break-by-index equals
    tie-break-by-id.
    """

    entity_ids: np.ndarray       # (V,) object array of str
    names: np.ndarray            # (V,) object array of str
    norm_names: np.ndarray       # (V,)
    emb: np.ndarray              # (V, d) float32, L2-normalized by the encoder


def build_catalog_index(
    catalog: pa.Table,
    encoder: Encoder | None = None,
    cfg: ScoringConfig = ScoringConfig(),
    cache_path: str | None = None,
) -> CatalogIndex:
    """Entity catalog table → CatalogIndex (built once on the driver, then
    ``ray.put``).  Reference analog: ``DenseRetriever.dump`` streaming the
    catalog through the entity encoder into ``index.add``
    (``mix_blink/retriever/dense.py:68-84``).

    ``cache_path``: reuse a persisted index (``save_catalog_index``) only when
    its persisted content fingerprint (:func:`catalog_fingerprint` — hash of
    the (entity_id, name) pairs plus encoder identity/dim and NIL config,
    stored in the parquet schema metadata) matches this catalog — with an
    expensive encoder at 10⁶ entities, re-encoding every run is the
    reference's ``build_index``-artifact cost this skips.  A stale/mismatched
    cache (including same ids with renamed entities, or a different
    encoder/measure) is rebuilt and overwritten, never trusted."""
    import os

    from ..functions.text import normalize

    want_fp = catalog_fingerprint(catalog, cfg, encoder) if cache_path else None
    if cache_path and os.path.exists(cache_path):
        import pyarrow.parquet as pq_

        meta = pq_.read_schema(cache_path).metadata or {}
        if (meta.get(_FP_META_KEY) or b"").decode() == want_fp:
            cached = load_catalog_index(cache_path)
            if cached.emb.shape[1] == cfg.encoder_dim:
                return cached

    encoder = encoder or HashNgramEncoder(dim=cfg.encoder_dim)
    if cfg.nil_sentinel and NIL_ID not in set(catalog["entity_id"].to_pylist()):
        # Reference NIL sentinel row (dictionary.py:67-72): id "-1", name
        # "[NIL]" — appended BEFORE the sort so tie-breaks stay id-ordered.
        nil_row = pa.table(
            {
                "entity_id": pa.array([NIL_ID], pa.string()),
                "name": pa.array([cfg.nil_name], pa.string()),
            }
        )
        extra_cols = [c for c in catalog.column_names if c not in nil_row.column_names]
        for c in extra_cols:
            nil_row = nil_row.append_column(c, pa.nulls(1, catalog.schema.field(c).type))
        catalog = pa.concat_tables([catalog, nil_row.select(catalog.column_names)])
    order = pc.sort_indices(catalog["entity_id"])
    catalog = catalog.take(order)
    norm = normalize(catalog["name"])
    emb = encoder.encode(norm)
    index = CatalogIndex(
        entity_ids=np.asarray(catalog["entity_id"].to_pylist(), dtype=object),
        names=np.asarray(catalog["name"].to_pylist(), dtype=object),
        norm_names=np.asarray(norm.to_pylist() if hasattr(norm, "to_pylist") else norm, dtype=object),
        emb=emb,
    )
    if cache_path:
        save_catalog_index(index, cache_path, fingerprint=want_fp)
    return index


def save_catalog_index(index: CatalogIndex, path: str, fingerprint: str | None = None) -> str:
    """Persist a built catalog index as ONE parquet table (entity ids, names,
    normalized names, embedding as FixedSizeList<float32>) — the engine analog
    of the reference's serialized FAISS artifact (``mix_blink/retriever/
    dense.py:124-137`` ``build_index`` → ``index.serialize``), minus the
    positional ``meta_ids_to_keys`` sidecar (ids ride in the same table)."""
    import pyarrow.parquet as pq_

    dim = index.emb.shape[1]
    tbl = pa.table(
        {
            "entity_id": pa.array(index.entity_ids, pa.string()),
            "name": pa.array(index.names, pa.string()),
            "norm_name": pa.array(index.norm_names, pa.string()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(index.emb.reshape(-1)), dim
            ),
        }
    )
    import os

    if fingerprint is not None:
        tbl = tbl.replace_schema_metadata({_FP_META_KEY: fingerprint.encode()})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    pq_.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic: a crashed run never leaves a torn index
    return path


def load_catalog_index(path: str) -> CatalogIndex:
    import pyarrow.parquet as pq_

    tbl = pq_.read_table(path)
    emb_col = tbl["embedding"].combine_chunks()
    dim = emb_col.type.list_size
    return CatalogIndex(
        entity_ids=np.asarray(tbl["entity_id"].to_pylist(), dtype=object),
        names=np.asarray(tbl["name"].to_pylist(), dtype=object),
        norm_names=np.asarray(tbl["norm_name"].to_pylist(), dtype=object),
        emb=np.asarray(emb_col.flatten(), dtype=np.float32).reshape(len(tbl), dim),
    )


def _tiled_topk(queries: np.ndarray, catalog: np.ndarray, k: int, measure: str, tile: int):
    """Running top-k over catalog tiles — memory is O(Q·(k + tile)), never O(Q·V)."""
    v = catalog.shape[0]
    k = min(k, v)
    best_idx = None
    best_scores = None
    for lo in range(0, v, tile):
        hi = min(lo + tile, v)
        s = score_matrix(queries, catalog[lo:hi], measure)
        idx, sc = topk_indices(s, min(k, hi - lo))
        idx = idx + lo
        if best_idx is None:
            best_idx, best_scores = idx, sc
        else:
            cat_idx = np.concatenate([best_idx, idx], axis=1)
            cat_sc = np.concatenate([best_scores, sc], axis=1)
            order = np.lexsort((cat_idx, -cat_sc), axis=1)[:, :k]
            best_idx = np.take_along_axis(cat_idx, order, axis=1)
            best_scores = np.take_along_axis(cat_sc, order, axis=1)
    return best_idx, best_scores


class SurfaceScorer:
    """Actor-pool ``map_batches`` stage: distinct surfaces → top-k entity
    candidates + NIL-thresholded prediction.

    State (catalog matrix, encoder) is constructed ONCE per actor in
    ``__init__`` — reference analog: model weights + FAISS index living in one
    process (``mix_blink/cli/eval.py:105-110``).  ``catalog_ref`` is a
    ``ray.ObjectRef`` from ``ray.put`` (zero-copy shared on a node) or a plain
    CatalogIndex (tests).
    """

    def __init__(self, catalog_ref, cfg: ScoringConfig = ScoringConfig(), encoder: Encoder | None = None):
        import ray

        self.cfg = cfg
        self.index: CatalogIndex = (
            ray.get(catalog_ref) if isinstance(catalog_ref, ray.ObjectRef) else catalog_ref
        )
        self.encoder = encoder or HashNgramEncoder(dim=cfg.encoder_dim)
        k = cfg.top_k + cfg.extra_k
        if k > len(self.index.entity_ids):
            warnings.warn(
                f"k={k} clamped to catalog size {len(self.index.entity_ids)}"
            )  # reference: dense.py:89-91

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        queries = self.encoder.encode(batch["norm_text"])
        k = min(cfg.top_k + cfg.extra_k, len(self.index.entity_ids))
        idx, scores = _tiled_topk(queries, self.index.emb, k, cfg.measure, cfg.catalog_tile)
        n = batch.num_rows
        cand_ids = self.index.entity_ids[idx.reshape(-1)]
        offsets = np.arange(0, (n + 1) * k, k, dtype=np.int32)
        cand_list = pa.ListArray.from_arrays(pa.array(offsets), pa.array(cand_ids, pa.string()))
        score_list = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(scores.reshape(-1).astype(np.float32))
        )
        # Dense-ranked top-1 (pure reference retrieval semantics, dense.py:94).
        best_score = scores[:, 0] if k > 0 else np.zeros(n, dtype=np.float32)
        best_id = self.index.entity_ids[idx[:, 0]] if k > 0 else np.array([NIL_ID] * n, dtype=object)

        if cfg.rerank_jw and k > 0:
            # Cheap-prefilter rerank (north rule): Jaro-Winkler against the
            # first ``rerank_k`` dense leaders only — O(n·rerank_k), never O(n·V).
            rk = min(cfg.rerank_k, k)
            idx_r = idx[:, :rk]
            qm, ql = pad_codes(batch["norm_text"])
            nm, nl = pad_codes(pa.array(self.index.norm_names[idx_r.reshape(-1)], pa.string()))
            L = max(qm.shape[1], nm.shape[1], 1)

            def padto(m: np.ndarray) -> np.ndarray:
                if m.shape[1] == L:
                    return m
                out = np.zeros((m.shape[0], L), np.uint8)
                out[:, : m.shape[1]] = m
                return out

            jw = jaro_winkler_pairs(
                padto(np.repeat(qm, rk, axis=0)), np.repeat(ql, rk), padto(nm), nl
            ).reshape(n, rk)
            # Short surfaces have few char n-grams (a single interior edit can
            # zero the dense overlap), so lean more on Jaro-Winkler for them.
            w = np.where(ql < 8, min(cfg.jw_weight + 0.15, 1.0), cfg.jw_weight)[:, None]
            comb = (1.0 - w) * scores[:, :rk] + w * jw
            # Deterministic tie-break: combined desc, then dense rank asc.
            ri = np.lexsort((np.broadcast_to(np.arange(rk), (n, rk)), -comb), axis=1)[:, 0]
            pred_score = comb[np.arange(n), ri].astype(np.float32)
            chosen = self.index.entity_ids[idx_r[np.arange(n), ri]]
        else:
            pred_score = best_score.astype(np.float32)
            chosen = best_id
        if cfg.nil_sentinel:
            # Reference semantics: NIL is a ranked catalog row — the top-1
            # IS the prediction (which may be the sentinel), no threshold.
            pred_id = chosen
        else:
            pred_id = np.where(pred_score >= cfg.tau_nil, chosen, NIL_ID)

        out = batch
        out = out.append_column("candidates", cand_list)
        out = out.append_column("candidate_scores", score_list)
        out = out.append_column("best_id", pa.array(best_id, pa.string()))
        out = out.append_column("best_score", pa.array(best_score.astype(np.float32)))
        out = out.append_column("pred_id", pa.array(pred_id, pa.string()))
        out = out.append_column("pred_score", pa.array(pred_score))
        return out


def score_surfaces_sharded(
    surfaces,
    catalog,
    cfg: ScoringConfig = ScoringConfig(),
    encoder: Encoder | None = None,
):
    """LARGE-catalog scoring: the transpose of :class:`SurfaceScorer`.

    SurfaceScorer broadcasts the catalog index and streams surfaces — right
    when the catalog fits the object store (≤ ~10⁷ entities).  Beyond that,
    THIS path broadcasts the (contracted, small) surface matrix instead and
    streams the CATALOG:

        catalog Dataset → per-block: encode names, (surfaces × block) scores,
        per-surface block-local top-k rows → groupby(norm_text) merge.

    Per-block top-k under the same deterministic total order (score desc,
    entity_id asc; catalog pre-sorted by id so block-local index order IS id
    order) provably preserves the global top-k, so output candidates /
    predictions are IDENTICAL to SurfaceScorer (parity-tested) including the
    Jaro-Winkler rerank and NIL threshold, which run on the merged global
    list.  Shuffle volume: surfaces × (k + extra_k) × n_blocks rows of
    (text, id, score, name) — independent of catalog size per surface.

    ``surfaces``: Dataset or pa.Table with ``norm_text``; ``catalog``:
    Dataset or pa.Table with entity_id / name.  Returns a Dataset with the
    SurfaceScorer output schema.
    """
    import ray
    import ray.data as rd

    from ..functions.text import normalize

    if isinstance(surfaces, pa.Table):
        surfaces = rd.from_arrow(surfaces)
    if isinstance(catalog, pa.Table):
        cat_ds = rd.from_arrow(catalog)
    else:
        cat_ds = catalog
    cat_ds = cat_ds.select_columns(["entity_id", "name"])
    if cfg.nil_sentinel:
        # Append the sentinel only if absent (mirrors build_catalog_index);
        # the membership probe streams — no full catalog materialization.
        has_nil = (
            cat_ds.map_batches(
                lambda b: b.filter(pc.equal(b["entity_id"], NIL_ID)), batch_format="pyarrow"
            )
            .limit(1)
            .count()
            > 0
        )
        if not has_nil:
            nil_row = pa.table(
                {"entity_id": pa.array([NIL_ID], pa.string()), "name": pa.array([cfg.nil_name], pa.string())}
            )
            cat_ds = cat_ds.union(rd.from_arrow(nil_row))

    encoder = encoder or HashNgramEncoder(dim=cfg.encoder_dim)
    surf_tbl = surfaces.select_columns(["norm_text"]).to_pandas()
    surf_texts = pa.array(surf_tbl["norm_text"], pa.string())
    q_emb = encoder.encode(surf_texts)
    surf_ref = ray.put((surf_texts, q_emb))
    k = cfg.top_k + cfg.extra_k

    def block_topk(batch: pa.Table) -> pa.Table:
        texts, q = ray.get(surf_ref) if isinstance(surf_ref, ray.ObjectRef) else surf_ref
        order = pc.sort_indices(batch["entity_id"])
        batch = batch.take(order)  # local index order == id order (tie-break)
        names = batch["name"]
        norm = normalize(names)
        emb = encoder.encode(norm)
        idx, scores = _tiled_topk(q, emb, min(k, batch.num_rows), cfg.measure, cfg.catalog_tile)
        nq, kk = idx.shape
        flat_idx = idx.reshape(-1)
        take = pa.array(flat_idx)
        return pa.table(
            {
                "norm_text": pc.take(texts, pa.array(np.repeat(np.arange(nq, dtype=np.int64), kk))),
                "entity_id": pc.take(batch["entity_id"], take),
                "norm_name": pc.take(pc.cast(norm, pa.string()), take),
                "score": pa.array(scores.reshape(-1).astype(np.float32)),
            }
        )

    rows = cat_ds.map_batches(block_topk, batch_format="pyarrow", batch_size=cfg.catalog_tile)

    def merge_group(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["entity_id"].to_pylist(), dtype=object)
        names = np.asarray(g["norm_name"].to_pylist(), dtype=object)
        scores = np.asarray(g["score"], dtype=np.float32)
        order = np.lexsort((ids, -scores.astype(np.float64)))[: min(k, len(ids))]
        ids, names, scores = ids[order], names[order], scores[order]
        text = g["norm_text"][0].as_py()
        kk = len(ids)
        cand_list = pa.ListArray.from_arrays(
            pa.array([0, kk], pa.int32()), pa.array(ids, pa.string())
        )
        score_list = pa.ListArray.from_arrays(pa.array([0, kk], pa.int32()), pa.array(scores))
        best_id, best_score = (ids[0], float(scores[0])) if kk else (NIL_ID, 0.0)

        if cfg.rerank_jw and kk:
            rk = min(cfg.rerank_k, kk)
            qm, ql = pad_codes(pa.array([text], pa.string()))
            nm, nl = pad_codes(pa.array(names[:rk], pa.string()))
            L = max(qm.shape[1], nm.shape[1], 1)

            def padto(m: np.ndarray) -> np.ndarray:
                if m.shape[1] == L:
                    return m
                out = np.zeros((m.shape[0], L), np.uint8)
                out[:, : m.shape[1]] = m
                return out

            jw = jaro_winkler_pairs(
                padto(np.repeat(qm, rk, axis=0)), np.repeat(ql, rk), padto(nm), nl
            )
            w = min(cfg.jw_weight + 0.15, 1.0) if ql[0] < 8 else cfg.jw_weight
            comb = (1.0 - w) * scores[:rk] + w * jw
            ri = int(np.lexsort((np.arange(rk), -comb))[0])
            pred_score = float(comb[ri])
            chosen = ids[ri]
        else:
            pred_score = best_score
            chosen = best_id
        if cfg.nil_sentinel:
            pred_id = chosen
        else:
            pred_id = chosen if pred_score >= cfg.tau_nil else NIL_ID
        return pa.table(
            {
                "norm_text": pa.array([text], pa.string()),
                "candidates": cand_list,
                "candidate_scores": score_list,
                "best_id": pa.array([best_id], pa.string()),
                "best_score": pa.array([best_score], pa.float32()),
                "pred_id": pa.array([pred_id], pa.string()),
                "pred_score": pa.array([pred_score], pa.float32()),
            }
        )

    return rows.groupby("norm_text").map_groups(merge_group, batch_format="pyarrow")


def make_pair_generator(cfg: ScoringConfig, id_col: str = "node_id", text_col: str = "norm_text"):
    """Per-block pair candidate generator for ``groupby("block_key").map_groups``.

    For one block (possibly salt-split by :func:`..stages.blocking.add_salt`):
    all ordered pairs ``a_id < b_id`` within each salt whose estimated MinHash
    Jaccard ≥ ``tau_pair_jaccard`` OR whose normalized texts are equal.
    Vectorized per group; emits ``(a_id, b_id, a_text, b_text, a_type,
    b_type, est_jaccard)``.
    """

    def gen(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "a_id": pa.array([], pa.string()),
                "b_id": pa.array([], pa.string()),
                "a_text": pa.array([], pa.string()),
                "b_text": pa.array([], pa.string()),
                "a_type": pa.array([], pa.string()),
                "b_type": pa.array([], pa.string()),
                "est_jaccard": pa.array([], pa.float32()),
            }
        )
        if n < 2:
            return empty
        data, offsets = flat_utf8(group[text_col])
        grams, rows = char_ngram_hashes(data, offsets, n=cfg.ngram if hasattr(cfg, "ngram") else 3)
        sig = minhash_signatures(grams, rows, n, num_perms=cfg.num_perms, seed=cfg.seed)
        salts = (
            np.asarray(group["salt"], dtype=np.int64)
            if "salt" in group.column_names
            else np.zeros(n, dtype=np.int64)
        )
        ids = np.asarray(group[id_col].to_pylist(), dtype=object)
        texts = np.asarray(group[text_col].to_pylist(), dtype=object)
        types = (
            np.asarray(group["node_type"].to_pylist(), dtype=object)
            if "node_type" in group.column_names
            else np.asarray(["node"] * n, dtype=object)
        )
        a_parts, b_parts, j_parts = [], [], []
        for s in np.unique(salts):
            members = np.flatnonzero(salts == s)
            m = len(members)
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, k=1)
            ai, bi = members[iu], members[ju]
            est = (sig[ai] == sig[bi]).mean(axis=1).astype(np.float32)
            same = texts[ai] == texts[bi]
            keep = (est >= cfg.tau_pair_jaccard) | same
            a_parts.append(ai[keep])
            b_parts.append(bi[keep])
            j_parts.append(est[keep])
        if not a_parts:
            return empty
        ai = np.concatenate(a_parts)
        bi = np.concatenate(b_parts)
        est = np.concatenate(j_parts)
        # Canonical orientation: a_id < b_id (keys, not positions, align pairs).
        flip = ids[ai] > ids[bi]
        ai2 = np.where(flip, bi, ai)
        bi2 = np.where(flip, ai, bi)
        return pa.table(
            {
                "a_id": pa.array(ids[ai2], pa.string()),
                "b_id": pa.array(ids[bi2], pa.string()),
                "a_text": pa.array(texts[ai2], pa.string()),
                "b_text": pa.array(texts[bi2], pa.string()),
                "a_type": pa.array(types[ai2], pa.string()),
                "b_type": pa.array(types[bi2], pa.string()),
                "est_jaccard": pa.array(est),
            }
        )

    return gen


class PairScorer:
    """Actor-pool stage: exact-score deduped candidate pairs → edges.

    Encoder cosine on both surfaces + vectorized Jaro-Winkler; a pair becomes
    an edge when ``cos ≥ tau_edge_<type>`` or (``est_jaccard`` passed and
    ``jw ≥ tau_jw``).  Output keeps scores for diagnostics.
    """

    def __init__(self, cfg: ScoringConfig = ScoringConfig(), encoder: Encoder | None = None):
        self.cfg = cfg
        self.encoder = encoder or HashNgramEncoder(dim=cfg.encoder_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return batch.append_column("cos", pa.array([], pa.float32())).append_column(
                "jw", pa.array([], pa.float32())
            ).append_column("is_edge", pa.array([], pa.bool_()))
        ea = self.encoder.encode(batch["a_text"])
        eb = self.encoder.encode(batch["b_text"])
        cos = (ea * eb).sum(axis=1)
        a_mat, a_len = pad_codes(batch["a_text"])
        b_mat, b_len = pad_codes(batch["b_text"])
        jw = jaro_winkler_pairs(a_mat, a_len, b_mat, b_len).astype(np.float32)
        a_type = np.asarray(batch["a_type"].to_pylist(), dtype=object)
        b_type = np.asarray(batch["b_type"].to_pylist(), dtype=object)
        both_entity = (a_type == "entity") & (b_type == "entity")
        tau = np.where(both_entity, cfg.tau_edge_entity, cfg.tau_edge_mention)
        is_edge = (cos >= tau) | ((jw >= cfg.tau_jw) & (cos >= cfg.tau_nil))
        out = batch.append_column("cos", pa.array(cos.astype(np.float32)))
        out = out.append_column("jw", pa.array(jw))
        out = out.append_column("is_edge", pa.array(is_edge))
        return out


def split_candidates_hard_negatives(batch: pa.Table, top_k: int) -> pa.Table:
    """Reference gold-removal semantics, vectorized (``dense.py:102-122``):

    - ``candidates``  := first ``top_k`` of the retrieved list **including**
      gold (pre-removal prefix, ``dense.py:115``),
    - ``hard_negatives`` := first ``top_k`` retrieved ids NOT in ``gold_ids``
      (``dense.py:113-120``).

    Input needs list columns ``candidates`` (full retrieved list, len ≥
    top_k+headroom) and ``gold_ids``.
    """
    cand = batch["candidates"].combine_chunks() if isinstance(batch["candidates"], pa.ChunkedArray) else batch["candidates"]
    gold = batch["gold_ids"].combine_chunks() if isinstance(batch["gold_ids"], pa.ChunkedArray) else batch["gold_ids"]
    n = batch.num_rows

    c_off = np.asarray(cand.offsets, dtype=np.int64)
    c_val = cand.values
    g_off = np.asarray(gold.offsets, dtype=np.int64)
    g_val = gold.values
    c_row = np.repeat(np.arange(n, dtype=np.int64), np.diff(c_off))
    g_row = np.repeat(np.arange(n, dtype=np.int64), np.diff(g_off))

    c_h = hash_strings(*flat_utf8(c_val))
    g_h = hash_strings(*flat_utf8(g_val))
    c_key = c_h + c_row.astype(np.uint64) * _ROW_MIX
    g_key = g_h + g_row.astype(np.uint64) * _ROW_MIX
    is_gold = np.isin(c_key, g_key)

    # Rank within row (candidate lists are already score-ordered).
    row_start = c_off[c_row] - c_off[0]
    pos_in_row = np.arange(len(c_row), dtype=np.int64) - (np.searchsorted(c_row, c_row))
    keep_cand = pos_in_row < top_k

    # Non-gold rank within row via segmented cumsum.
    nk = (~is_gold).astype(np.int64)
    cum = np.cumsum(nk)
    seg_first = np.searchsorted(c_row, c_row)  # index of first element of this row
    base = np.where(seg_first > 0, cum[seg_first - 1], 0)
    ng_rank = cum - base  # 1-based rank among non-gold, only meaningful where ~is_gold
    keep_hneg = (~is_gold) & (ng_rank <= top_k)

    def rebuild(mask: np.ndarray) -> pa.ListArray:
        counts = np.bincount(c_row[mask], minlength=n)
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        vals = c_val.take(pa.array(np.flatnonzero(mask) + (c_off[0])))
        return pa.ListArray.from_arrays(pa.array(offs), vals)

    out = batch.drop_columns(["candidates"])
    out = out.append_column("candidates", rebuild(keep_cand))
    out = out.append_column("hard_negatives", rebuild(keep_hneg))
    return out

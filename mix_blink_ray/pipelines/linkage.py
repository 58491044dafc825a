"""The flagship pipeline: transcripts → mentions → blocking → scoring →
transitive clusters, end to end as ONE streaming Ray Data program.

Dataflow (SURVEY.md §7), default ("contract") strategy:

    transcripts.parquet (conv_id, turn_idx, role, text, tool, ts)
      └─ read_parquet                                   stateless tasks
      └─ extract_mentions            map_batches        flat-map, zero-copy Arrow
      └─ contract: distinct norm_text                   SHUFFLE #0 — map-side
           (per-batch combine → int-bucket groupby)     combine kills hot-text skew
      └─ SurfaceScorer vs broadcast catalog             no shuffle (ray.put once)
      └─ predictions → mentions                         broadcast map-side attach
           (hash join fallback above broadcast_threshold distinct surfaces)
      └─ edges:  entity↔entity   (LSH blocking + pair scoring on the catalog)
                 mention→entity  (pred_id ≠ NIL; implicit in the fast path)
                 mention↔surface + surface↔surface (general path only — NOTE)
      └─ cluster_nodes (entity-graph union-find fast path; distributed
           min-label propagation for the general path)
      └─ clustered mentions (+ optional work_dir stage checkpoints)

An optional "stream" strategy fuses extract→score→label into one shuffle-free
pass with per-worker caches — byte-identical output, but duplicated scoring
grows with worker count (anti-scales beyond a node); contract is the default.

NOTE on mention↔mention edges: surfaces whose gold is NIL must stay
singletons (FIXTURES.md §4: a pair matches only on a shared non-NIL gold id),
so by default mentions connect only through entity anchors; enabling
``emit_mention_edges`` adds within-block surface-similarity edges for
catalog-free dedup use-cases.

Scale notes (10^12 turns): the only all-to-all exchanges are the distinct-
surface contraction (#0), the mentions⋈predictions hash join, and the
clustering rounds — all keyed; the catalog never shuffles (broadcast), and
per-surface scoring work is proportional to *distinct* surfaces, not turns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from ..functions.encoder import Encoder, HashNgramEncoder
from ..sources.synth import NIL_ID
from ..stages.blocking import BlockingConfig, add_salt, block_keys_table
from ..stages.clustering import cluster_nodes
from ..stages.mentions import extract_mentions
from ..stages.scoring import (
    PairScorer,
    ScoringConfig,
    SurfaceScorer,
    build_catalog_index,
    make_pair_generator,
)

__all__ = [
    "LinkageConfig",
    "LinkageResult",
    "run_linkage",
    "run_linkage_incremental",
    "entity_dup_edges",
]

M_PREFIX = "m:"
E_PREFIX = "e:"
S_PREFIX = "s:"  # surface nodes (general path): "e:" < "m:" < "s:" keeps
                 # entity labels winning anchored components

# Per-worker-process scorer cache for the stateless-task scoring path: Ray
# reuses worker processes, so the broadcast index is fetched and unpacked once
# per worker, not once per batch.  Bounded: evicted FIFO beyond a few runs.
_WORKER_SCORER_CACHE: dict = {}


def _cached_scorer(key: str, factory):
    scorer = _WORKER_SCORER_CACHE.get(key)
    if scorer is None:
        if len(_WORKER_SCORER_CACHE) >= 4:
            _WORKER_SCORER_CACHE.pop(next(iter(_WORKER_SCORER_CACHE)))
        scorer = factory()
        _WORKER_SCORER_CACHE[key] = scorer
    return scorer


@dataclass(frozen=True)
class LinkageConfig:
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    emit_mention_edges: bool = False
    scorer_concurrency: tuple[int, int] = (1, 8)   # actor-pool autoscale bounds
    scorer_batch_size: int = 1024
    # Stateless tasks + a per-worker scorer cache beat an actor pool for the
    # cheap hash-n-gram encoder (no spin-up, elastic).  Flip on for encoders
    # with expensive __init__ (HF model load) where the pool amortizes it.
    use_scorer_actors: bool = False
    join_partitions: int = 8
    cluster_mode: str = "auto"
    work_dir: str | None = None   # spill reused intermediates to parquet (resumable)
    # Persisted catalog-embedding artifact (reference build_index analog):
    # reused across runs when it matches the catalog; see build_catalog_index.
    catalog_index_path: str | None = None
    broadcast_threshold: int = 20_000_000  # distinct surfaces ≤ this → map-side join
    # (~60 B/surface ⇒ 20M ≈ 1.2 GB broadcast table — object-store shared, zero-copy)
    # "stream": single fused pass (extract→score→label), per-worker surface
    #   caches, ZERO mention-sized shuffles — the fast path when mentions
    #   anchor to entities only.  "contract": distinct-surface groupby before
    #   scoring — wins when distinct cardinality ≫ worker cache budget or
    #   when mention-mention edges are on.  "sharded_catalog": contract flow
    #   but the catalog STREAMS in blocks while the (small) surface matrix
    #   broadcasts — for catalogs too big to broadcast as a dense index
    #   (≳10⁷ entities); output-identical (parity-tested).  "auto" = contract.
    scoring_strategy: str = "auto"
    # Materialize the extracted mention table in the object store (one
    # barrier) vs re-executing extract per consumer.  MEASURED at 64M turns /
    # 32 CPUs: materialize 32-44 s, lazy re-extract 133-195 s — extraction
    # (gazetteer matching over every turn) dominates an object-store round
    # trip of the mention table by ~4×, so True is the default.  False only
    # makes sense if extract ever becomes trivial relative to mention width.
    materialize_mentions: bool = True
    stream_cache_limit: int = 1_000_000   # per-worker surface-cache entries


@dataclass
class LinkageResult:
    mentions: Dataset          # per-mention predictions + cluster ids
    surface_preds: Dataset     # per distinct surface: candidates/scores/pred
    entity_edges: Dataset      # entity-entity duplicate edges found
    clusters: Dataset          # (node, label)
    stage_metrics: dict


_DUP_LOCAL_THRESHOLD = 100_000

_EMPTY_PAIR_TABLE = pa.table(
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


def _blocked_candidate_pairs(
    blocked: Dataset, cfg: "LinkageConfig", n_rows_hint: int = 0
) -> Dataset:
    """Blocked node rows (with ``block_key``) → DISTINCT candidate pair rows.

    Two hotspot fixes over the round-3 shape (same pattern as
    ``stages/dedup.py``): (1) pair generation via
    :func:`~..stages.dedup.grouped_run_pairs` — one hash-bucket shuffle, the
    per-block Python generator invoked only for block keys with ≥ 2 rows
    (singleton blocks emit nothing but each paid a ``map_groups`` callback);
    (2) cross-block dedup via ONE vectorized multi-key Count aggregate
    instead of ``groupby(pair).map_groups(slice(0, 1))`` (a Python callback
    per pair-group).  Grouping on every column is equivalent to keep-first
    because duplicate (a_id, b_id) rows are fully identical: texts/types are
    functions of the ids and ``est_jaccard`` is a deterministic function of
    the two texts.  The float column rides through the groupby bit-cast to
    int32 so group keys stay integer/string."""
    from ..stages.blocking import add_salt
    from ..stages.dedup import _auto_buckets, grouped_run_pairs
    from ..stages.scoring import make_pair_generator

    gen = make_pair_generator(cfg.scoring)
    raw = grouped_run_pairs(
        blocked,
        "block_key",
        lambda g: gen(add_salt(g, cfg.blocking)),
        n_buckets=_auto_buckets(n_rows_hint),
    )
    key_cols = ["a_id", "b_id", "a_text", "b_text", "a_type", "b_type", "j_bits"]

    def contract(b: pa.Table) -> pa.Table:
        j = np.asarray(b["est_jaccard"], dtype=np.float32).view(np.int32)
        b = b.drop_columns(["est_jaccard"]).append_column("j_bits", pa.array(j))
        return b.group_by(key_cols).aggregate([])  # vectorized in-batch distinct

    deduped = (
        raw.map_batches(contract, batch_format="pyarrow")
        .groupby(key_cols)
        .aggregate(Count(alias_name="_nb"))
    ).materialize()
    if deduped.count() == 0:
        return ray.data.from_arrow(_EMPTY_PAIR_TABLE)

    def restore(b: pa.Table) -> pa.Table:
        j = np.asarray(b["j_bits"], dtype=np.int32).view(np.float32)
        return b.drop_columns(["j_bits", "_nb"]).append_column("est_jaccard", pa.array(j))

    return deduped.map_batches(restore, batch_format="pyarrow")


def _entity_dup_edges_local(catalog: pa.Table, cfg: LinkageConfig) -> pa.Table:
    """Single-task vectorized catalog self-dedup (same blocking + scoring
    semantics as the distributed path).  For catalogs that fit one worker,
    20k Python map_groups calls cost more than the whole computation."""
    from ..functions.hashing import char_ngram_hashes, flat_utf8, hash_strings, lsh_band_keys, minhash_signatures
    from ..functions.strings import jaro_winkler_pairs, pad_codes
    from ..functions.text import normalize

    bc, sc = cfg.blocking, cfg.scoring
    norm = normalize(catalog["name"])
    norm = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
    ids = np.asarray(catalog["entity_id"].to_pylist(), dtype=object)
    v = len(ids)
    empty = pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    if v < 2:
        return empty

    data, off = flat_utf8(norm)
    grams, rows = char_ngram_hashes(data, off, n=bc.ngram)
    sig = minhash_signatures(grams, rows, v, num_perms=bc.num_perms, seed=bc.seed)
    keys = np.concatenate(
        [lsh_band_keys(sig, bc.num_bands), hash_strings(data, off).view(np.int64)[:, None]],
        axis=1,
    )
    flat_keys = keys.reshape(-1)
    flat_idx = np.tile(np.arange(v, dtype=np.int64), (keys.shape[1], 1)).T.reshape(-1)
    order = np.argsort(flat_keys, kind="stable")
    sk, si = flat_keys[order], flat_idx[order]
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(sk)) + 1, [len(sk)]])
    pair_codes: list[np.ndarray] = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        members = np.unique(si[s:e])
        if len(members) < 2:
            continue
        iu, ju = np.triu_indices(len(members), k=1)
        pair_codes.append(members[iu] * v + members[ju])
    if not pair_codes:
        return empty
    codes = np.unique(np.concatenate(pair_codes))
    ai, bi = codes // v, codes % v
    est = (sig[ai] == sig[bi]).mean(axis=1)
    names_np = np.asarray(norm.to_pylist(), dtype=object)
    keep = (est >= sc.tau_pair_jaccard) | (names_np[ai] == names_np[bi])
    ai, bi = ai[keep], bi[keep]
    if not len(ai):
        return empty

    from ..functions.encoder import HashNgramEncoder

    enc = HashNgramEncoder(dim=sc.encoder_dim)
    emb = enc.encode(norm)
    cos = (emb[ai] * emb[bi]).sum(axis=1)
    am, al = pad_codes(pa.array(names_np[ai], pa.string()))
    bm, bl = pad_codes(pa.array(names_np[bi], pa.string()))
    L = max(am.shape[1], bm.shape[1], 1)

    def padto(m):
        if m.shape[1] == L:
            return m
        out = np.zeros((m.shape[0], L), np.uint8)
        out[:, : m.shape[1]] = m
        return out

    jw = jaro_winkler_pairs(padto(am), al, padto(bm), bl)
    is_edge = (cos >= sc.tau_edge_entity) | ((jw >= sc.tau_jw) & (cos >= sc.tau_nil))
    ai, bi = ai[is_edge], bi[is_edge]
    lo = np.where(ids[ai] < ids[bi], ai, bi)
    hi = np.where(ids[ai] < ids[bi], bi, ai)
    return pa.table(
        {
            "src": pa.array([E_PREFIX + x for x in ids[lo]], pa.string()),
            "dst": pa.array([E_PREFIX + x for x in ids[hi]], pa.string()),
        }
    )


def entity_dup_edges(catalog: pa.Table, cfg: LinkageConfig) -> Dataset:
    """Catalog self-dedup: LSH blocking over entity names → in-block pairs →
    exact scoring → entity↔entity edges (duplicate catalog ids — the source of
    the reference's multi-label golds, ``dataset_toy.jsonl:3`` analog).

    Small catalogs (≤ ``_DUP_LOCAL_THRESHOLD``) run the identical semantics as
    one vectorized task; bigger catalogs take the distributed
    groupby(block_key) path below."""
    from ..functions.text import normalize

    if catalog.num_rows <= _DUP_LOCAL_THRESHOLD:
        return ray.data.from_arrow(_entity_dup_edges_local(catalog, cfg))

    ents = pa.table(
        {
            "node_id": catalog["entity_id"],
            "norm_text": normalize(catalog["name"]),
            "node_type": pa.array(["entity"] * catalog.num_rows, pa.string()),
        }
    )
    ds = ray.data.from_arrow(ents)
    blocked = ds.map_batches(
        lambda b: block_keys_table(b, cfg.blocking, carry_cols=("node_type",)),
        batch_format="pyarrow",
    )
    pairs = _blocked_candidate_pairs(
        blocked, cfg, n_rows_hint=catalog.num_rows * (cfg.blocking.num_bands + 1)
    )
    pair_cfg = cfg.scoring

    def pair_scorer_fn(batch):
        scorer = _cached_scorer(f"pair:{pair_cfg!r}", lambda: PairScorer(pair_cfg))
        return scorer(batch)

    scored = pairs.map_batches(pair_scorer_fn, batch_format="pyarrow", batch_size=8192)
    return scored.filter(expr="is_edge == True").map_batches(
        lambda b: pa.table(
            {
                "src": pc.binary_join_element_wise(pa.array([E_PREFIX] * b.num_rows, pa.string()), b["a_id"], ""),
                "dst": pc.binary_join_element_wise(pa.array([E_PREFIX] * b.num_rows, pa.string()), b["b_id"], ""),
            }
        ),
        batch_format="pyarrow",
    )


def _empty_result(catalog: pa.Table) -> "LinkageResult":
    """Schema-correct empty outputs for mention-free input (every entity still
    gets its singleton cluster)."""
    empty_mentions = pa.table(
        {
            "mention_uid": pa.array([], pa.string()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "start": pa.array([], pa.int32()),
            "end": pa.array([], pa.int32()),
            "surface": pa.array([], pa.string()),
            "norm_text": pa.array([], pa.string()),
            "pred_id": pa.array([], pa.string()),
            "best_id": pa.array([], pa.string()),
            "best_score": pa.array([], pa.float32()),
            "cluster_id": pa.array([], pa.string()),
        }
    )
    e_nodes = pc.binary_join_element_wise(
        pa.array([E_PREFIX] * catalog.num_rows, pa.string()), catalog["entity_id"], ""
    )
    return LinkageResult(
        mentions=ray.data.from_arrow(empty_mentions),
        surface_preds=ray.data.from_arrow(empty_mentions.select(["norm_text", "pred_id"])),
        entity_edges=ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
        ),
        clusters=ray.data.from_arrow(pa.table({"node": e_nodes, "label": e_nodes})),
        stage_metrics={"empty_input": True},
    )


def _contract_surfaces(mentions: Dataset, n_buckets: int | None = None) -> Dataset:
    """Distinct-surface contraction: map-side combine (hot repeated text
    collapses per batch), then a groupby on an integer hash bucket —
    shuffling/sorting int64 keys is several times faster than sorting the
    surface strings themselves — with an exact vectorized per-bucket distinct.

    Bucket count scales with the cluster (≥ 2 per CPU, min 256) so the
    per-bucket distinct stays a bounded-size task at any surface cardinality
    — 256 fixed buckets would cap reduce parallelism on a big cluster."""
    from ..functions.hashing import flat_utf8, hash_strings

    if n_buckets is None:
        n_buckets = max(256, 2 * int(ray.cluster_resources().get("CPU", 8)))
    nb = np.uint64(n_buckets)

    def partial_distinct_bucket(b: pa.Table) -> pa.Table:
        g = b.group_by("norm_text").aggregate([("norm_text", "count")]).rename_columns(
            ["norm_text", "n_mentions"]
        )
        h = (hash_strings(*flat_utf8(g["norm_text"])) % nb).astype(np.int64)
        return g.append_column("bucket", pa.array(h))

    def bucket_distinct(g: pa.Table) -> pa.Table:
        return g.group_by("norm_text").aggregate([("n_mentions", "sum")]).rename_columns(
            ["norm_text", "n_mentions"]
        )

    return (
        mentions.map_batches(partial_distinct_bucket, batch_format="pyarrow", batch_size=32768)
        .groupby("bucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )


class _StreamScoreState:
    """Per-worker state for the stream strategy: scorer + surface→result cache
    + entity→cluster-label lookup (all built once per worker process)."""

    def __init__(self, catalog_ref, cfg: ScoringConfig, encoder, label_ref, cache_limit: int):
        self.scorer = SurfaceScorer(catalog_ref, cfg, encoder)
        self.labels: dict[str, str] = (
            ray.get(label_ref) if isinstance(label_ref, ray.ObjectRef) else label_ref
        )
        self.cache: dict[str, tuple] = {}
        self.cache_limit = cache_limit

    def __call__(self, batch: pa.Table) -> pa.Table:
        uniq = pc.unique(batch["norm_text"])
        uniq_py = uniq.to_pylist()
        missing = [s for s in uniq_py if s not in self.cache]
        if missing:
            scored = self.scorer(pa.table({"norm_text": pa.array(missing, pa.string())}))
            if len(self.cache) + len(missing) > self.cache_limit:
                self.cache.clear()
            for s, p, b, sc_ in zip(
                missing,
                scored["pred_id"].to_pylist(),
                scored["best_id"].to_pylist(),
                scored["best_score"].to_pylist(),
            ):
                self.cache[s] = (p, b, sc_)
        rows = [self.cache[s] for s in uniq_py]
        pred_u = pa.array([r[0] for r in rows], pa.string())
        best_u = pa.array([r[1] for r in rows], pa.string())
        score_u = pa.array([r[2] for r in rows], pa.float32())
        label_u = pa.array(
            [self.labels.get(r[0]) for r in rows], pa.string()
        )  # None for NIL → filled per mention below
        pos = pc.index_in(batch["norm_text"], value_set=uniq)
        out = batch.append_column("pred_id", pc.take(pred_u, pos))
        out = out.append_column("best_id", pc.take(best_u, pos))
        out = out.append_column("best_score", pc.take(score_u, pos))
        ent_label = pc.take(label_u, pos)
        own = pc.binary_join_element_wise(
            pa.array([M_PREFIX] * out.num_rows, pa.string()), out["mention_uid"], ""
        )
        cluster = pc.if_else(pc.is_null(ent_label), own, ent_label)
        return out.append_column("cluster_id", cluster)


def _run_linkage_stream(
    transcripts: Dataset,
    catalog: pa.Table,
    cfg: LinkageConfig,
    encoder: Encoder | None,
) -> LinkageResult:
    """The zero-shuffle fast path: one fused map chain
    read → extract → (score + cluster-label) → consumer.  Entity-graph
    clustering (catalog-sized) is precomputed and broadcast; per-worker
    surface caches collapse hot duplicate text without a global contraction.
    Produces byte-identical output to the contract strategy."""
    ee_edges = entity_dup_edges(catalog, cfg).materialize()
    e_nodes = ray.data.from_arrow(
        pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array([E_PREFIX] * catalog.num_rows, pa.string()), catalog["entity_id"], ""
                )
            }
        )
    )
    clusters = cluster_nodes(
        ee_edges, e_nodes, mode=cfg.cluster_mode, num_partitions=cfg.join_partitions
    ).materialize()
    cdf = clusters.to_pandas()
    label_lut = {
        node[len(E_PREFIX):]: label for node, label in zip(cdf["node"], cdf["label"])
    }
    index = build_catalog_index(catalog, encoder, cfg.scoring, cache_path=cfg.catalog_index_path)
    catalog_ref = ray.put(index)
    label_ref = ray.put(label_lut)
    sc_cfg = cfg.scoring
    key = f"stream:{catalog_ref.hex()}:{sc_cfg!r}"

    def score_attach(batch: pa.Table) -> pa.Table:
        state = _cached_scorer(
            key,
            lambda: _StreamScoreState(catalog_ref, sc_cfg, encoder, label_ref, cfg.stream_cache_limit),
        )
        return state(batch)

    mentions = transcripts.map_batches(extract_mentions, batch_format="pyarrow")
    mentions_out = mentions.map_batches(score_attach, batch_format="pyarrow")

    # surface_preds: same contract-path graph, LAZY — only runs if consumed.
    def scorer_fn(batch: pa.Table) -> pa.Table:
        scorer = _cached_scorer(
            f"surf:{catalog_ref.hex()}:{sc_cfg!r}", lambda: SurfaceScorer(catalog_ref, sc_cfg, encoder)
        )
        return scorer(batch)

    surface_preds = _contract_surfaces(mentions).map_batches(
        scorer_fn, batch_format="pyarrow", batch_size=cfg.scorer_batch_size
    )
    return LinkageResult(
        mentions=mentions_out,
        surface_preds=surface_preds,
        entity_edges=ee_edges,
        clusters=clusters,
        stage_metrics={"strategy": "stream"},
    )


def run_linkage(
    transcripts: Dataset,
    catalog: pa.Table,
    cfg: LinkageConfig = LinkageConfig(),
    encoder: Encoder | None = None,
) -> LinkageResult:
    """Run the full three-stage linkage program.  ``catalog`` is the (small)
    entity table — broadcast once via ``ray.put``, read in every scorer actor's
    ``__init__``, never re-shipped per batch."""
    strategy = cfg.scoring_strategy
    if strategy == "auto":
        # contract (shuffle-based distinct) is the default: the stream
        # strategy's per-worker caches duplicate scoring work ∝ #workers and
        # ANTI-scale beyond one node (measured: 32 cpus slower than 8).
        strategy = "contract"
    if strategy == "stream":
        if cfg.emit_mention_edges:
            raise ValueError("stream strategy requires emit_mention_edges=False")
        return _run_linkage_stream(transcripts, catalog, cfg, encoder)
    metrics: dict = {}

    def persist(ds: Dataset, name: str) -> Dataset:
        """Pin a reused intermediate: parquet round-trip when ``work_dir`` is
        set (bounded memory + resumable layout), object-store materialize
        otherwise.  Without this, every downstream consumption re-executes the
        whole upstream DAG (including actor-pool spin-up).

        Stage-checkpoint semantics: writes go to ``{name}.tmp`` then rename
        (atomic), and a COMPLETE existing stage dir is REUSED — i.e. a rerun
        pointed at the same work_dir resumes after the last finished stage.
        A work_dir is valid for one (input, config) pair; pass a fresh dir for
        different inputs (``state/manifest.py`` adds fingerprint checking for
        the sharded variant).
        """
        if cfg.work_dir:
            import os
            import shutil

            path = os.path.join(cfg.work_dir, name)
            if not (os.path.isdir(path) and os.listdir(path)):
                tmp = path + ".tmp"
                shutil.rmtree(tmp, ignore_errors=True)
                ds.write_parquet(tmp)
                os.replace(tmp, path)
            metrics.setdefault("stages", []).append(name)
            return ray.data.read_parquet(path)
        return ds.materialize()

    import time as _time

    # ── stage 0: mentions (flat-map) + distinct-surface contraction ──────────
    _t0 = _time.time()
    mentions_lazy = transcripts.map_batches(extract_mentions, batch_format="pyarrow")
    if cfg.work_dir or cfg.materialize_mentions:
        mentions = persist(mentions_lazy, "mentions")
        metrics["sec_extract"] = round(_time.time() - _t0, 3)
        n_mentions = mentions.count()
        metrics["n_mentions"] = n_mentions
        if n_mentions == 0:
            return _empty_result(catalog)
    else:
        # Lazy: each consumer re-runs the cheap extract flat-map instead of
        # round-tripping the full mention table through the object store
        # (see LinkageConfig.materialize_mentions).  Emptiness probe via
        # limit(1) executes only until the first mention appears.
        mentions = mentions_lazy
        if mentions.limit(1).count() == 0:
            return _empty_result(catalog)

    surfaces = _contract_surfaces(mentions)

    # ── stage 2a: surface → catalog top-k ────────────────────────────────────
    _t0 = _time.time()
    if strategy == "sharded_catalog":
        # Catalogs too big to broadcast: surfaces broadcast, catalog streams
        # (output-identical to the broadcast scorer — see
        # stages.scoring.score_surfaces_sharded).
        from ..stages.scoring import score_surfaces_sharded

        surface_preds = score_surfaces_sharded(
            surfaces.materialize(), catalog, cfg.scoring, encoder
        ).materialize()
    elif cfg.use_scorer_actors:
        index = build_catalog_index(catalog, encoder, cfg.scoring, cache_path=cfg.catalog_index_path)
        catalog_ref = ray.put(index)
        surface_preds = surfaces.map_batches(
            SurfaceScorer,
            fn_constructor_kwargs={"catalog_ref": catalog_ref, "cfg": cfg.scoring, "encoder": encoder},
            batch_format="pyarrow",
            concurrency=cfg.scorer_concurrency,
            batch_size=cfg.scorer_batch_size,
        ).materialize()
    else:
        index = build_catalog_index(catalog, encoder, cfg.scoring, cache_path=cfg.catalog_index_path)
        catalog_ref = ray.put(index)
        scorer_key = f"{catalog_ref.hex()}:{cfg.scoring!r}"
        sc_cfg = cfg.scoring

        def scorer_fn(batch: pa.Table) -> pa.Table:
            scorer = _cached_scorer(
                scorer_key, lambda: SurfaceScorer(catalog_ref, sc_cfg, encoder)
            )
            return scorer(batch)

        surface_preds = surfaces.map_batches(
            scorer_fn, batch_format="pyarrow", batch_size=cfg.scorer_batch_size
        ).materialize()  # small: one row per DISTINCT surface; reused below
    metrics["sec_contract_score"] = round(_time.time() - _t0, 3)

    # ── entity graph (independent of mentions — catalog-sized) ───────────────
    _t0 = _time.time()
    metrics["n_entities"] = catalog.num_rows
    ee_edges = entity_dup_edges(catalog, cfg).materialize()  # tiny: catalog dups
    metrics["n_entity_edges"] = ee_edges.count()
    e_nodes = ray.data.from_arrow(
        pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array([E_PREFIX] * catalog.num_rows, pa.string()), catalog["entity_id"], ""
                )
            }
        )
    )
    fast_path = not cfg.emit_mention_edges
    clusters = None
    label_lut: dict | None = None
    if fast_path:
        # ── stage 3 FAST PATH: mentions attach to clusters only through their
        # predicted entity, so the transitive state is the ENTITY graph alone
        # (catalog-sized).  Cluster the entity graph, merge entity→label INTO
        # the broadcast surface table, and label mentions map-side — no
        # mention-sized shuffle, and ONE fused pass over mentions.
        # Labels are identical to the full-graph result because "e:" < "m:"
        # lexicographically (an anchored component's min node is always its
        # min entity) and NIL mentions are singletons either way.
        clusters = cluster_nodes(
            ee_edges, e_nodes, mode=cfg.cluster_mode, num_partitions=cfg.join_partitions
        ).materialize()
        cdf = clusters.to_pandas()
        label_lut = dict(zip(cdf["node"], cdf["label"]))
        metrics["sec_entity_graph"] = round(_time.time() - _t0, 3)

    # ── join predictions back to mentions (keyed, order-free) ────────────────
    # The contracted surface table is usually ≪ mentions: broadcast it and do
    # a map-side lookup (no shuffle).  Above `broadcast_threshold` distinct
    # surfaces, fall back to the partitioned hash join.
    from ..stages.clustering import clamped_partitions

    n_surfaces = surface_preds.count()
    metrics["n_surfaces"] = n_surfaces
    n_parts = clamped_partitions(
        n_surfaces, max(cfg.join_partitions, int(ray.cluster_resources().get("CPU", 8)))
    )
    use_broadcast = n_surfaces <= cfg.broadcast_threshold
    if use_broadcast:
        pred_df = surface_preds.select_columns(
            ["norm_text", "pred_id", "best_id", "best_score"]
        ).to_pandas()
        if fast_path:
            # Pre-resolve each surface's cluster label driver-side (surface
            # table × catalog-sized dict) so the mention pass needs ONE
            # lookup total; None ⇒ NIL ⇒ own-singleton cluster in the map.
            lut = label_lut
            pred_df["ent_label"] = [
                lut.get(E_PREFIX + p) if isinstance(p, str) and p != NIL_ID else None
                for p in pred_df["pred_id"]
            ]
        pred_ref = ray.put(pred_df)
        attach_key = f"attach:{pred_ref.hex()}"
        with_label = fast_path

        def attach_pred(batch: pa.Table) -> pa.Table:
            # Build the lookup index ONCE per worker (pc.index_in re-hashes
            # the whole value set on every batch — O(V) per call).
            def build():
                df = ray.get(pred_ref) if isinstance(pred_ref, ray.ObjectRef) else pred_ref
                import pandas as pd

                return (
                    pd.Index(df["norm_text"].to_numpy()),
                    pa.array(df["pred_id"], pa.string()),
                    pa.array(df["best_id"], pa.string()),
                    pa.array(df["best_score"], pa.float32()),
                    pa.array(df["ent_label"], pa.string()) if with_label else None,
                )

            idx, pred_a, best_a, score_a, label_a = _cached_scorer(attach_key, build)
            col = batch["norm_text"]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            pos_np = idx.get_indexer(col.to_numpy(zero_copy_only=False))
            pos = pa.array(np.where(pos_np >= 0, pos_np, None))
            batch = batch.append_column("pred_id", pc.take(pred_a, pos))
            batch = batch.append_column("best_id", pc.take(best_a, pos))
            batch = batch.append_column("best_score", pc.take(score_a, pos))
            if label_a is not None:
                ent_label = pc.take(label_a, pos)
                own = pc.binary_join_element_wise(
                    pa.array([M_PREFIX] * batch.num_rows, pa.string()), batch["mention_uid"], ""
                )
                batch = batch.append_column(
                    "cluster_id", pc.if_else(pc.is_null(ent_label), own, ent_label)
                )
            return batch

        # LAZY in the fast path: the fused attach has exactly one consumer,
        # so the chain fuses into one pass over mentions; persisting it would
        # cost a full extra materialization.
        mentions_pred = mentions.map_batches(attach_pred, batch_format="pyarrow")
        if cfg.emit_mention_edges or (cfg.work_dir and not fast_path):
            mentions_pred = persist(mentions_pred, "mentions_pred")
    else:
        mentions_pred = persist(
            mentions.join(
                surface_preds.select_columns(["norm_text", "pred_id", "best_id", "best_score"]),
                join_type="left_outer",
                num_partitions=n_parts,
                on=("norm_text",),
            ),
            "mentions_pred",
        )

    def mention_entity_edges(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(batch["pred_id"]), pc.not_equal(batch["pred_id"], NIL_ID))
        keep = batch.filter(mask)
        n = keep.num_rows
        return pa.table(
            {
                "src": pc.binary_join_element_wise(pa.array([M_PREFIX] * n, pa.string()), keep["mention_uid"], ""),
                "dst": pc.binary_join_element_wise(pa.array([E_PREFIX] * n, pa.string()), keep["pred_id"], ""),
            }
        )

    if fast_path:
        label_tbl = pa.Table.from_pandas(clusters.to_pandas(), preserve_index=False)
        label_ref = ray.put(label_tbl)

        def attach_cluster(batch: pa.Table) -> pa.Table:
            tbl = ray.get(label_ref) if isinstance(label_ref, ray.ObjectRef) else label_ref
            e_node = pc.binary_join_element_wise(
                pa.array([E_PREFIX] * batch.num_rows, pa.string()),
                pc.fill_null(batch["pred_id"], NIL_ID),
                "",
            )
            pos = pc.index_in(e_node, value_set=tbl["node"].combine_chunks())
            ent_label = pc.take(tbl["label"], pos)
            own = pc.binary_join_element_wise(
                pa.array([M_PREFIX] * batch.num_rows, pa.string()), batch["mention_uid"], ""
            )
            is_nil = pc.or_(
                pc.is_null(batch["pred_id"]), pc.equal(batch["pred_id"], NIL_ID)
            )
            cluster = pc.if_else(is_nil, own, ent_label)
            return batch.append_column("cluster_id", cluster)

        mentions_out = (
            mentions_pred  # broadcast path already fused the cluster label in
            if use_broadcast
            else mentions_pred.map_batches(attach_cluster, batch_format="pyarrow")
        )
        return LinkageResult(
            mentions=mentions_out,
            surface_preds=surface_preds,
            entity_edges=ee_edges,
            clusters=clusters,
            stage_metrics=metrics,
        )

    # ── stage 3 GENERAL PATH (mention-mention edges on): full node graph ─────
    # Mentions connect to their surface node ("s:<norm_text>"); surface↔surface
    # similarity edges then make co-similar surfaces transitive without
    # materializing the quadratic mention↔mention edge set (a surface with 10^6
    # duplicate mentions contributes 10^6 mention→surface edges, not 10^12).
    me_edges = mentions_pred.map_batches(mention_entity_edges, batch_format="pyarrow")

    def mention_surface_edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "src": pc.binary_join_element_wise(
                    pa.array([M_PREFIX] * n, pa.string()), batch["mention_uid"], ""
                ),
                "dst": pc.binary_join_element_wise(
                    pa.array([S_PREFIX] * n, pa.string()), batch["norm_text"], ""
                ),
            }
        )

    ms_edges = mentions_pred.map_batches(mention_surface_edges, batch_format="pyarrow")
    edges = me_edges.union(ee_edges).union(ms_edges).union(
        _mention_mention_edges(surface_preds, cfg)
    )
    edges = persist(edges, "edges")
    m_nodes = mentions.map_batches(
        lambda b: pa.table(
            {"node": pc.binary_join_element_wise(pa.array([M_PREFIX] * b.num_rows, pa.string()), b["mention_uid"], "")}
        ),
        batch_format="pyarrow",
    )
    s_nodes = surface_preds.map_batches(
        lambda b: pa.table(
            {"node": pc.binary_join_element_wise(pa.array([S_PREFIX] * b.num_rows, pa.string()), b["norm_text"], "")}
        ),
        batch_format="pyarrow",
    )
    nodes = m_nodes.union(e_nodes).union(s_nodes)
    clusters = cluster_nodes(edges, nodes, mode=cfg.cluster_mode, num_partitions=cfg.join_partitions)

    m_clusters = clusters.map_batches(
        lambda b: pa.table({"m_node": b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )
    mentions_keyed = mentions_pred.map_batches(
        lambda b: b.append_column(
            "m_node",
            pc.binary_join_element_wise(pa.array([M_PREFIX] * b.num_rows, pa.string()), b["mention_uid"], ""),
        ),
        batch_format="pyarrow",
    )
    mentions_out = mentions_keyed.join(
        m_clusters,
        join_type="left_outer",
        num_partitions=n_parts,
        on=("m_node",),
    ).drop_columns(["m_node"])

    return LinkageResult(
        mentions=mentions_out,
        surface_preds=surface_preds,
        entity_edges=ee_edges,
        clusters=clusters,
        stage_metrics=metrics,
    )


def run_linkage_incremental(
    transcripts: Dataset,
    catalog: pa.Table,
    cfg: LinkageConfig,
    state_dir: str,
    encoder: Encoder | None = None,
) -> tuple[Dataset, dict]:
    """Incremental (delta) linkage: link a NEW batch of transcripts against a
    persisted surface-prediction state, scoring ONLY surfaces never seen in
    prior runs.

    This is the daily-increment shape of a 100-TB corpus: surface cardinality
    grows sublinearly with turns, so after the first run almost every mention
    hits the persisted state and the encoder/top-k work is proportional to
    the NOVEL surfaces only.  State layout (``state_dir/surface_preds/``,
    atomic tmp+rename parquet) is the same schema ``run_linkage`` produces,
    so a state dir can be seeded from a full run.

    Returns ``(labeled mentions Dataset, metrics)`` with
    ``metrics = {"n_surfaces", "n_known", "n_novel"}``.  Output labels are
    IDENTICAL to running ``run_linkage`` over the concatenated corpus
    (asserted by the parity test): per-surface predictions depend only on the
    surface and catalog, and entity clusters are catalog-sized (recomputed
    per run, cheap).

    Scale note: BOTH state-sized steps respect ``cfg.broadcast_threshold`` —
    the known-surface membership check broadcasts the state's ``norm_text``
    column below it (exact strings — a hashed set would false-positive and
    silently skip scoring a genuinely new surface) and switches to the keyed
    anti-join above it; the final attach broadcasts the state below it and
    switches to the partitioned hash join on ``norm_text`` above it (the
    ``run_linkage`` join branch).  Both dualities are parity-tested with
    ``broadcast_threshold=0``.
    """
    import os
    import shutil

    import pandas as pd

    prev_path = os.path.join(state_dir, "surface_preds")
    have_prev = os.path.isdir(prev_path) and os.listdir(prev_path)

    # Surface predictions depend on the catalog + encoder: refuse to mix a
    # state built against a different one (stale preds would silently blend
    # with fresh scores — round-2 ADVICE, same contract as the index cache).
    from ..stages.scoring import catalog_fingerprint

    state_fp = catalog_fingerprint(catalog, cfg.scoring, encoder)
    fp_path = os.path.join(state_dir, "catalog.fp")
    if have_prev and os.path.exists(fp_path):
        if open(fp_path).read().strip() != state_fp:
            raise ValueError(
                f"run_linkage_incremental: state at {state_dir!r} was built against "
                "a different catalog/encoder (fingerprint mismatch); use a fresh "
                "state_dir or re-seed it from a full run over the new catalog"
            )

    mentions = transcripts.map_batches(extract_mentions, batch_format="pyarrow").materialize()
    surfaces = _contract_surfaces(mentions).materialize()
    n_surfaces = surfaces.count()

    pred_cols = ["norm_text", "pred_id", "best_id", "best_score"]
    if have_prev:
        prev = ray.data.read_parquet(prev_path)
        n_prev = prev.count()
        if n_prev <= cfg.broadcast_threshold:
            known_idx = pd.Index(prev.select_columns(["norm_text"]).to_pandas()["norm_text"].to_numpy())
            known_ref = ray.put(known_idx)

            def only_novel(b: pa.Table) -> pa.Table:
                idx = ray.get(known_ref) if isinstance(known_ref, ray.ObjectRef) else known_ref
                col = b["norm_text"]
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                pos = idx.get_indexer(col.to_numpy(zero_copy_only=False))
                return b.filter(pa.array(pos < 0))

            novel = surfaces.map_batches(only_novel, batch_format="pyarrow")
        else:
            # keyed anti-join: surfaces ⟕ known-marker, keep unmatched
            from ..stages.clustering import clamped_partitions

            marks = prev.map_batches(
                lambda b: pa.table(
                    {"known_text": b["norm_text"], "is_known": pa.array([True] * b.num_rows)}
                ),
                batch_format="pyarrow",
            )
            kp = clamped_partitions(n_prev, max(8, int(ray.cluster_resources().get("CPU", 8))))
            novel = surfaces.join(
                marks, join_type="left_outer", num_partitions=kp, on=("norm_text",), right_on=("known_text",)
            ).map_batches(
                lambda b: b.filter(pc.is_null(b["is_known"])).drop_columns(["is_known"]),
                batch_format="pyarrow",
            )
    else:
        prev = None
        novel = surfaces

    index = build_catalog_index(catalog, encoder, cfg.scoring, cache_path=cfg.catalog_index_path)
    catalog_ref = ray.put(index)
    sc_cfg = cfg.scoring

    def scorer_fn(batch: pa.Table) -> pa.Table:
        scorer = _cached_scorer(
            f"{catalog_ref.hex()}:{sc_cfg!r}", lambda: SurfaceScorer(catalog_ref, sc_cfg, encoder)
        )
        return scorer(batch)

    novel_preds = novel.map_batches(
        scorer_fn, batch_format="pyarrow", batch_size=cfg.scorer_batch_size
    ).select_columns(pred_cols).materialize()
    n_novel = novel_preds.count()

    all_preds = prev.select_columns(pred_cols).union(novel_preds) if prev is not None else novel_preds
    tmp = prev_path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    all_preds.write_parquet(tmp)
    old = prev_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if have_prev:
        os.replace(prev_path, old)
    os.replace(tmp, prev_path)
    shutil.rmtree(old, ignore_errors=True)
    fp_tmp = fp_path + ".tmp"
    with open(fp_tmp, "w") as f:
        f.write(state_fp + "\n")
    os.replace(fp_tmp, fp_path)
    all_preds = ray.data.read_parquet(prev_path)

    # Label the new batch's mentions: entity clusters are catalog-sized.
    ee_edges = entity_dup_edges(catalog, cfg).materialize()
    e_nodes = ray.data.from_arrow(
        pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array([E_PREFIX] * catalog.num_rows, pa.string()), catalog["entity_id"], ""
                )
            }
        )
    )
    clusters = cluster_nodes(ee_edges, e_nodes, mode=cfg.cluster_mode, num_partitions=cfg.join_partitions).materialize()
    cdf = clusters.to_pandas()
    label_lut = dict(zip(cdf["node"], cdf["label"]))

    n_state = n_surfaces if prev is None else all_preds.count()
    if n_state <= cfg.broadcast_threshold:
        pred_df = all_preds.to_pandas()
        pred_df["ent_label"] = [
            label_lut.get(E_PREFIX + p) if isinstance(p, str) and p != NIL_ID else None
            for p in pred_df["pred_id"]
        ]
        pred_ref = ray.put(pred_df)
        attach_key = f"attach:{pred_ref.hex()}"

        def attach_all(batch: pa.Table) -> pa.Table:
            def build():
                df = ray.get(pred_ref) if isinstance(pred_ref, ray.ObjectRef) else pred_ref
                return (
                    pd.Index(df["norm_text"].to_numpy()),
                    pa.array(df["pred_id"], pa.string()),
                    pa.array(df["best_id"], pa.string()),
                    pa.array(df["best_score"], pa.float32()),
                    pa.array(df["ent_label"], pa.string()),
                )

            idx, pred_a, best_a, score_a, label_a = _cached_scorer(attach_key, build)
            col = batch["norm_text"]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            pos_np = idx.get_indexer(col.to_numpy(zero_copy_only=False))
            pos = pa.array(np.where(pos_np >= 0, pos_np, None))
            batch = batch.append_column("pred_id", pc.take(pred_a, pos))
            batch = batch.append_column("best_id", pc.take(best_a, pos))
            batch = batch.append_column("best_score", pc.take(score_a, pos))
            ent_label = pc.take(label_a, pos)
            own = pc.binary_join_element_wise(
                pa.array([M_PREFIX] * batch.num_rows, pa.string()), batch["mention_uid"], ""
            )
            return batch.append_column("cluster_id", pc.if_else(pc.is_null(ent_label), own, ent_label))

        labeled = mentions.map_batches(attach_all, batch_format="pyarrow")
    else:
        # The accumulated surface state grows with the corpus — above the
        # broadcast threshold it must NOT be to_pandas()'d onto the driver.
        # Mirror run_linkage's join branch: ent_label rides along map-side
        # from the tiny catalog-sized cluster lut, then the mentions join the
        # state on norm_text in a partitioned hash join.
        from ..stages.clustering import clamped_partitions

        lut_keys = pa.array(list(label_lut.keys()), pa.string())
        lut_vals = pa.array([label_lut[k] for k in label_lut], pa.string())
        lut_ref = ray.put((lut_keys, lut_vals))

        def add_ent_label(b: pa.Table) -> pa.Table:
            keys, vals = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
            e_node = pc.binary_join_element_wise(
                pa.array([E_PREFIX] * b.num_rows, pa.string()),
                pc.fill_null(b["pred_id"], NIL_ID),
                "",
            )
            ent = pc.take(vals, pc.index_in(e_node, value_set=keys))
            is_nil = pc.or_(pc.is_null(b["pred_id"]), pc.equal(b["pred_id"], NIL_ID))
            return b.append_column(
                "ent_label", pc.if_else(is_nil, pa.nulls(b.num_rows, pa.string()), ent)
            )

        state_lab = all_preds.map_batches(add_ent_label, batch_format="pyarrow")
        jp = clamped_partitions(
            n_state, max(cfg.join_partitions, int(ray.cluster_resources().get("CPU", 8)))
        )
        joined = mentions.join(
            state_lab, join_type="left_outer", num_partitions=jp, on=("norm_text",)
        )

        def finish(b: pa.Table) -> pa.Table:
            own = pc.binary_join_element_wise(
                pa.array([M_PREFIX] * b.num_rows, pa.string()), b["mention_uid"], ""
            )
            out = b.append_column(
                "cluster_id", pc.if_else(pc.is_null(b["ent_label"]), own, b["ent_label"])
            )
            return out.drop_columns(["ent_label"])

        labeled = joined.map_batches(finish, batch_format="pyarrow")
    return labeled, {
        "n_surfaces": n_surfaces,
        "n_novel": n_novel,
        "n_known": n_surfaces - n_novel,
    }


def _mention_mention_edges(surface_preds: Dataset, cfg: LinkageConfig) -> Dataset:
    """Optional surface↔surface similarity edges (catalog-free dedup mode).
    Blocks distinct surfaces, scores in-block pairs, links mentions via their
    surfaces' exact-key node ids.  Off by default (see module NOTE)."""
    nodes = surface_preds.map_batches(
        lambda b: pa.table(
            {
                "node_id": pc.binary_join_element_wise(pa.array(["s:"] * b.num_rows, pa.string()), b["norm_text"], ""),
                "norm_text": b["norm_text"],
                "node_type": pa.array(["mention"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    blocked = nodes.map_batches(
        lambda b: block_keys_table(b, cfg.blocking, carry_cols=("node_type",)),
        batch_format="pyarrow",
    )
    pairs = _blocked_candidate_pairs(blocked, cfg)
    pair_cfg = cfg.scoring

    def pair_scorer_fn(batch):
        scorer = _cached_scorer(f"pair:{pair_cfg!r}", lambda: PairScorer(pair_cfg))
        return scorer(batch)

    scored = pairs.map_batches(pair_scorer_fn, batch_format="pyarrow", batch_size=8192)
    return scored.filter(expr="is_edge == True").select_columns(["a_id", "b_id"]).map_batches(
        lambda b: pa.table({"src": b["a_id"], "dst": b["b_id"]}),
        batch_format="pyarrow",
    )

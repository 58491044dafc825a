"""The flagship pipeline: transcripts → mentions → blocking → scoring →
transitive clusters, end to end as ONE streaming Ray Data program.

Dataflow (SURVEY.md §7):

    transcripts.parquet (conv_id, turn_idx, role, text, tool, ts)
      └─ read_parquet                                   stateless tasks
      └─ extract_mentions            map_batches        flat-map, zero-copy Arrow
      └─ contract: distinct norm_text (groupby+count)   SHUFFLE #0 (kills hot-text skew)
      └─ SurfaceScorer actor pool vs broadcast catalog  no shuffle (catalog via ray.put)
      └─ mentions ⋈ surface predictions (hash join on norm_text)
      └─ edges:  mention→entity  (pred_id ≠ NIL)
                 entity↔entity   (LSH blocking + in-block pair scoring on the catalog)
                 mention↔mention (optional, off by default — see NOTE)
      └─ cluster_nodes (min-label propagation / union-find)
      └─ clustered mentions (+ optional partitioned parquet + lineage manifests)

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
    CatalogIndex,
    PairScorer,
    ScoringConfig,
    SurfaceScorer,
    build_catalog_index,
    make_pair_generator,
)

__all__ = ["LinkageConfig", "LinkageResult", "run_linkage", "entity_dup_edges"]

M_PREFIX = "m:"
E_PREFIX = "e:"


@dataclass(frozen=True)
class LinkageConfig:
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    emit_mention_edges: bool = False
    scorer_concurrency: tuple[int, int] = (1, 4)   # actor-pool autoscale bounds
    scorer_batch_size: int = 4096
    join_partitions: int = 8
    cluster_mode: str = "auto"
    work_dir: str | None = None   # spill reused intermediates to parquet (resumable)


@dataclass
class LinkageResult:
    mentions: Dataset          # per-mention predictions + cluster ids
    surface_preds: Dataset     # per distinct surface: candidates/scores/pred
    entity_edges: Dataset      # entity-entity duplicate edges found
    clusters: Dataset          # (node, label)
    stage_metrics: dict


def entity_dup_edges(catalog: pa.Table, cfg: LinkageConfig) -> Dataset:
    """Catalog self-dedup: LSH blocking over entity names → in-block pairs →
    exact scoring → entity↔entity edges (duplicate catalog ids — the source of
    the reference's multi-label golds, ``dataset_toy.jsonl:3`` analog)."""
    from ..functions.text import normalize

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
    pairs = (
        blocked.groupby("block_key")
        .map_groups(
            lambda g: make_pair_generator(cfg.scoring)(add_salt(g, cfg.blocking)),
            batch_format="pyarrow",
        )
        .groupby(["a_id", "b_id"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")  # dedup across bands
    )
    scored = pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={"cfg": cfg.scoring},
        batch_format="pyarrow",
        concurrency=(1, 2),
        batch_size=8192,
    )
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


def run_linkage(
    transcripts: Dataset,
    catalog: pa.Table,
    cfg: LinkageConfig = LinkageConfig(),
    encoder: Encoder | None = None,
) -> LinkageResult:
    """Run the full three-stage linkage program.  ``catalog`` is the (small)
    entity table — broadcast once via ``ray.put``, read in every scorer actor's
    ``__init__``, never re-shipped per batch."""
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

    # ── stage 0: mentions (flat-map) + distinct-surface contraction ──────────
    mentions = persist(
        transcripts.map_batches(extract_mentions, batch_format="pyarrow"), "mentions"
    )
    if mentions.count() == 0:
        return _empty_result(catalog)
    surfaces = mentions.groupby("norm_text").aggregate(Count(alias_name="n_mentions"))

    # ── stage 2a: surface → catalog top-k on a broadcast index ───────────────
    index = build_catalog_index(catalog, encoder, cfg.scoring)
    catalog_ref = ray.put(index)
    surface_preds = surfaces.map_batches(
        SurfaceScorer,
        fn_constructor_kwargs={"catalog_ref": catalog_ref, "cfg": cfg.scoring, "encoder": encoder},
        batch_format="pyarrow",
        concurrency=cfg.scorer_concurrency,
        batch_size=cfg.scorer_batch_size,
    ).materialize()  # small: one row per DISTINCT surface; reused twice below

    # ── join predictions back to mentions (keyed, order-free) ────────────────
    from ..stages.clustering import clamped_partitions

    n_parts = clamped_partitions(surface_preds.count(), cfg.join_partitions)
    mentions_pred = persist(
        mentions.join(
            surface_preds.select_columns(["norm_text", "pred_id", "best_id", "best_score"]),
            join_type="left_outer",
            num_partitions=n_parts,
            on=("norm_text",),
        ),
        "mentions_pred",
    )

    # ── edges ────────────────────────────────────────────────────────────────
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

    me_edges = mentions_pred.map_batches(mention_entity_edges, batch_format="pyarrow")
    ee_edges = entity_dup_edges(catalog, cfg).materialize()  # tiny: catalog dups
    edges = me_edges.union(ee_edges)

    if cfg.emit_mention_edges:
        mm = _mention_mention_edges(surface_preds, cfg)
        edges = edges.union(mm)
    edges = persist(edges, "edges")

    # ── nodes: every mention + every entity (singletons keep own cluster) ────
    m_nodes = mentions.map_batches(
        lambda b: pa.table(
            {"node": pc.binary_join_element_wise(pa.array([M_PREFIX] * b.num_rows, pa.string()), b["mention_uid"], "")}
        ),
        batch_format="pyarrow",
    )
    e_nodes = ray.data.from_arrow(
        pa.table(
            {
                "node": pc.binary_join_element_wise(
                    pa.array([E_PREFIX] * catalog.num_rows, pa.string()), catalog["entity_id"], ""
                )
            }
        )
    )
    nodes = m_nodes.union(e_nodes)

    # ── stage 3: transitive clustering ───────────────────────────────────────
    clusters = cluster_nodes(edges, nodes, mode=cfg.cluster_mode, num_partitions=cfg.join_partitions)

    # attach cluster ids to mentions (join on the node key)
    m_clusters = clusters.map_batches(
        lambda b: pa.table(
            {
                "m_node": b["node"],
                "cluster_id": b["label"],
            }
        ),
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
    pairs = (
        blocked.groupby("block_key")
        .map_groups(
            lambda g: make_pair_generator(cfg.scoring)(add_salt(g, cfg.blocking)),
            batch_format="pyarrow",
        )
        .groupby(["a_id", "b_id"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    scored = pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={"cfg": cfg.scoring},
        batch_format="pyarrow",
        concurrency=(1, 2),
        batch_size=8192,
    )
    return scored.filter(expr="is_edge == True").select_columns(["a_id", "b_id"]).map_batches(
        lambda b: pa.table({"src": b["a_id"], "dst": b["b_id"]}),
        batch_format="pyarrow",
    )

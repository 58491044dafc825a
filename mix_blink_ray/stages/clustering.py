"""Stage 3 — transitive clustering: iterative min-label propagation to fixpoint.

The reference links every mention independently (no transitive step); this
stage is the north rule's addition, implemented as the MapReduce
connected-components pattern ("Finding connected components in map-reduce in
logarithmic rounds", ICDE 2013 — see PAPERS.md) expressed in Ray Data:

    labels(node) ← min over {labels(node)} ∪ {labels(neighbor)}

each round is one ``union → groupby(node).min`` shuffle; the loop stops when a
round changes nothing (checked with a cheap aggregate, not a driver
materialization of the labels).  All state lives in Datasets — no actor holds
the graph.

For small candidate graphs (the common case after thresholding — edges are
O(mentions)), ``mode="driver"`` runs a NumPy union-find on the collected edge
list instead; ``mode="auto"`` picks based on a driver-side count.  Both paths
produce byte-identical labels (cluster id = lexicographic min node id of the
component), which the parity tests assert.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset, from_arrow
from ray.data.aggregate import Min

__all__ = ["propagate_labels", "unionfind_labels", "cluster_nodes", "clamped_partitions"]

_DRIVER_EDGE_LIMIT = 2_000_000


def clamped_partitions(count: int, requested: int, min_rows_per_part: int = 8) -> int:
    """Ray's hash join (2.49) fails with "No match ... FieldRef" when a
    partition receives zero rows of one side (empty blocks lose their schema).
    Clamp partition count so small inputs can't produce empty partitions; at
    real scale ``count >> requested`` and this is a no-op."""
    return max(1, min(requested, count // min_rows_per_part + 1))


def cpu_scaled_partitions(count: int) -> int:
    """``clamped_partitions`` with the requested count scaled to the node:
    a fixed 8 caps verify/attach joins at 8 tasks and leaves a 32-CPU box
    three-quarters idle (measured 15 s/task on the sf0.1 PPJoin verify)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return clamped_partitions(max(count, 1), max(8, cpus))


def _is_empty_partition_join_error(e: BaseException) -> bool:
    """True iff the exception (or its Ray-wrapped cause chain) is the Ray 2.49
    empty-hash-partition join failure: an empty block loses its schema and the
    acero join raises ``pa.ArrowInvalid`` ("No match for FieldRef...")."""
    seen: BaseException | None = e
    for _ in range(8):  # cause chains are short; avoid cycles
        if seen is None:
            return False
        if isinstance(seen, pa.ArrowInvalid):
            return True
        cause = getattr(seen, "cause", None)  # ray.exceptions.RayTaskError
        if isinstance(cause, BaseException):
            seen = cause
            continue
        # RayTaskError raised cross-process reconstructs the original type as
        # a dynamic subclass ("RayTaskError(ArrowInvalid)") — match by name.
        if "ArrowInvalid" in type(seen).__name__:
            return True
        seen = seen.__cause__
    return False


def _symmetrize(edges: Dataset) -> Dataset:
    """(src, dst) → both directions, so one groupby(dst) propagates everywhere."""

    def flip(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["src"], "dst": batch["dst"]})
        rev = pa.table({"src": batch["dst"], "dst": batch["src"]})
        return pa.concat_tables([fwd, rev])

    return edges.map_batches(flip, batch_format="pyarrow")


def propagate_labels(
    edges: Dataset,
    nodes: Dataset,
    max_rounds: int = 64,
    num_partitions: int = 16,
) -> Dataset:
    """Distributed min-label propagation with pointer jumping.  ``edges``:
    (src,dst) string columns; ``nodes``: (node) string column (must cover
    every endpoint + singletons).  Returns Dataset (node, label).

    Each round combines one hop of neighbor propagation with one pointer-jump
    (``label ← label(label)``, the shortcutting step of the log-round
    MapReduce connected-components family, ICDE'13 — see PAPERS.md), so
    convergence needs O(log diameter) rounds, not O(diameter): a 10⁶-long
    duplicate chain converges in ~20 rounds.  Exhausting ``max_rounds``
    without convergence RAISES (round-1 ADVICE: never silently return split
    components)."""
    sym = _symmetrize(edges).materialize()
    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow",
    ).materialize()
    num_partitions = clamped_partitions(labels.count(), num_partitions)

    for round_idx in range(max_rounds):
        # messages: for each edge (src,dst), dst receives label(src).
        msgs = sym.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        hop = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # pointer jump: node's label ← label(label) — halves the remaining
        # pointer-chain depth every round.  The self-join keys on `label`,
        # whose value distribution DEGENERATES as components converge (late
        # rounds: most rows share one label) — a hash partition can then
        # receive rows of only one side, which Ray 2.49 rejects
        # (ArrowInvalid, the empty-block schema loss).  The jump is a pure
        # accelerator — the fixpoint is identical without it — so on that
        # failure retry single-partition, then fall back to skipping the
        # jump for this round.
        def _jump(parts: int):
            return hop.join(
                hop.map_batches(
                    lambda b: pa.table({"jnode": b["node"], "jlabel": b["label"]}),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=parts,
                on=("label",),
                right_on=("jnode",),
            ).map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["jlabel"]}),
                batch_format="pyarrow",
            )

        new_labels = None
        for parts in (num_partitions, 1):
            try:
                new_labels = (
                    hop.union(_jump(parts))
                    .groupby("node")
                    .aggregate(Min("label", alias_name="label"))
                    .materialize()
                )
                break
            except Exception as e:  # noqa: BLE001 — filtered just below
                # Only the known Ray 2.49 degenerate-key failure is retryable
                # (empty hash-partition loses its schema → ArrowInvalid /
                # "No match ... FieldRef").  Everything else — OOM, lost
                # workers, schema bugs — must surface, not silently degrade.
                if not _is_empty_partition_join_error(e):
                    raise
                continue
        if new_labels is None:  # jump skipped entirely this round
            import logging

            logging.getLogger(__name__).warning(
                "propagate_labels: pointer jump skipped in round %d "
                "(degenerate label distribution at both partition counts); "
                "falling back to plain hop for this round", round_idx
            )
            new_labels = hop
        # changed count: nodes whose label shrank this round.
        changed = (
            new_labels.join(
                labels.map_batches(
                    lambda b: pa.table({"node": b["node"], "old_label": b["label"]}),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=num_partitions,
                on=("node",),
            )
            .map_batches(
                lambda b: pa.table(
                    {"changed": pc.cast(pc.not_equal(b["label"], b["old_label"]), pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .sum("changed")
        )
        labels = new_labels
        if not changed:
            break
    else:
        raise RuntimeError(
            f"propagate_labels did not converge in {max_rounds} rounds — "
            "component structure implies a pointer chain deeper than "
            f"2^{max_rounds}; raise max_rounds (this should be unreachable "
            "with pointer jumping on any physical graph)"
        )
    return labels


def unionfind_labels(edge_table: pa.Table, node_array: pa.Array) -> pa.Table:
    """Driver-side NumPy union-find (path-halving) — the small-graph fast path.

    Produces the same (node, label) contract as :func:`propagate_labels`:
    label = lexicographic min node id of the component.
    """
    nodes = np.asarray(node_array.to_pylist(), dtype=object)
    order = np.argsort(nodes, kind="stable")
    sorted_nodes = nodes[order]
    idx_of = {n: i for i, n in enumerate(sorted_nodes)}

    parent = np.arange(len(sorted_nodes), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    src = edge_table["src"].to_pylist()
    dst = edge_table["dst"].to_pylist()
    for a, b in zip(src, dst):
        ra, rb = find(idx_of[a]), find(idx_of[b])
        if ra != rb:
            # union by smaller index ⇒ root is the lexicographic min (sorted ids)
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(sorted_nodes))], dtype=np.int64)
    labels = sorted_nodes[roots]
    out_nodes = sorted_nodes
    return pa.table({"node": pa.array(out_nodes, pa.string()), "label": pa.array(labels, pa.string())})


def cluster_nodes(
    edges: Dataset,
    nodes: Dataset,
    mode: str = "auto",
    num_partitions: int = 16,
) -> Dataset:
    """Cluster assignment: Dataset (node, label).  ``mode``: "driver" |
    "distributed" | "auto" (driver iff edge count ≤ 2M — provably small)."""
    if mode == "auto":
        mode = "driver" if edges.count() <= _DRIVER_EDGE_LIMIT else "distributed"
    if mode == "distributed":
        return propagate_labels(edges, nodes, num_partitions=num_partitions)
    edge_table = pa.Table.from_pandas(edges.to_pandas()) if edges.count() else pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )
    node_list = nodes.unique("node")
    out = unionfind_labels(
        edge_table.select(["src", "dst"]), pa.array(node_list, pa.string())
    )
    return from_arrow(out)

"""Deterministic sampling operators for training-data curation.

Random sampling at 100 TB must be (a) reproducible across retries — Ray may
re-execute a task after a failure, so ``np.random`` inside a batch fn would
yield a different sample on replay — and (b) shuffle-free.  Both operators
therefore derive the "randomness" from a keyed integer hash (a Lehmer /
Park–Miller LCG step, chosen because it is expressible in ANSI SQL for the
DuckDB oracle): rows are kept or ranked by ``h(key)``, so the sample is a
pure row-wise function of the data.  Reference analog: the reference samples
hard negatives by retrieval rank (``cli/get_candidates.py``), not at the
corpus level; corpus-level sampling is part of this engine's training-data
suite (SURVEY §2.10c).

Scale notes
-----------
``hash_sample`` is embarrassingly parallel (a vectorized filter per batch —
no shuffle, no driver state).  ``stratified_sample`` keeps the ``k`` rows
with the smallest hash per stratum: each batch first contracts to its local
top-k per stratum (so at most ``k × n_strata`` rows per block enter the
exchange), then a ``groupby(stratum).map_groups`` takes the global top-k.
The shuffle volume is bounded by ``k × n_strata × n_blocks`` tiny rows, never
the corpus.  Skew is bounded by ``k`` per group — the final per-group merge
handles at most ``k × n_blocks`` rows regardless of stratum size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

__all__ = ["lehmer_hash", "hash_sample", "stratified_sample", "epoch_shuffle"]

_MERSENNE31 = 2147483647  # 2^31 - 1 (prime)
_LEHMER_MULT = 48271  # MINSTD multiplier


def lehmer_hash(ids: np.ndarray, steps: int = 1) -> np.ndarray:
    """``steps`` iterations of ``x ← (x mod (2^31-1)) * 48271 mod (2^31-1)``
    — overflow-free in int64 (operands < 2^31 · 2^16), identical to the SQL
    expression ``(id % 2147483647) * 48271 % 2147483647`` (nested ``steps``
    times) so DuckDB oracles can replay it exactly.  One step is enough for
    residue-class sampling (``h % mod``); THRESHOLD acceptance
    (``h < p·M``) on small sequential ids needs ``steps ≥ 3`` — a single
    multiply leaves ``h = id·48271`` far below any practical threshold.
    Not cryptographic; fine for sampling, NOT for dedup keys (use
    ``functions.hashing`` there)."""
    x = np.asarray(ids, dtype=np.int64)
    for _ in range(steps):
        x = (x % _MERSENNE31) * _LEHMER_MULT % _MERSENNE31
    return x


def hash_sample(ds: Dataset, key_col: str, keep_mod: int, keep_residue: int = 0) -> Dataset:
    """Deterministic ~``1/keep_mod`` sample: keep rows where
    ``lehmer_hash(key) % keep_mod == keep_residue``.  Pure per-batch filter —
    streams, never shuffles, reproducible under task retry."""
    if not (0 <= keep_residue < keep_mod):
        raise ValueError("keep_residue must be in [0, keep_mod)")

    def keep(b: pa.Table) -> pa.Table:
        h = lehmer_hash(np.asarray(b[key_col], dtype=np.int64))
        return b.filter(pa.array(h % keep_mod == keep_residue))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: Dataset, key_col: str, stratum_col: str, k: int
) -> Dataset:
    """Per-stratum deterministic sample: for each value of ``stratum_col``
    keep the ``k`` rows with the smallest ``(lehmer_hash(key), key)`` — the
    distributed equivalent of a per-group reservoir sample, but reproducible.
    Output adds the ``sample_h`` hash column (ties broken by ``key_col``).
    """

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("sample_h", pa.array([], pa.int64()))
        h = lehmer_hash(np.asarray(b[key_col], dtype=np.int64))
        b = b.append_column("sample_h", pa.array(h))
        order = pc.sort_indices(
            b, sort_keys=[(stratum_col, "ascending"), ("sample_h", "ascending"), (key_col, "ascending")]
        )
        b = b.take(order)
        strata = b[stratum_col].to_numpy(zero_copy_only=False)
        # rank within run of equal strata (sorted ⇒ runs are contiguous)
        change = np.flatnonzero(np.concatenate([[True], strata[1:] != strata[:-1]]))
        run_start = np.repeat(change, np.diff(np.append(change, len(strata))))
        rank = np.arange(len(strata)) - run_start
        return b.filter(pa.array(rank < k))

    def global_topk(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("sample_h", "ascending"), (key_col, "ascending")]
        )
        return g.take(order.slice(0, k))

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby(stratum_col)
        .map_groups(global_topk, batch_format="pyarrow")
    )


def epoch_shuffle(
    ds: Dataset,
    key_col: str,
    seed: int = 0,
    pos_col: str = "epoch_pos",
) -> Dataset:
    """Deterministic epoch shuffle — the scale-safe global reorder that
    feeds training loops.

    ``Dataset.random_shuffle`` is an all-to-all exchange whose output order
    is neither deterministic under task retries nor resumable mid-epoch.
    Here the order is a PURE FUNCTION of ``(key, seed)``: rows range-sort by
    ``splitmix64(key ^ splitmix64(seed))`` (viewed as int64 — the two sides
    only need a CONSISTENT order, not an unsigned one; the SQL oracle
    replays the signed view), and the two-phase prefix scan
    (``stages.scan.prefix_scan``) stamps the exact 1-based global position.
    Uniform 64-bit hash keys make the range sort's partitions balanced BY
    CONSTRUCTION — no skew regardless of the input key layout (sequential
    ids, hot prefixes, anything) — and a restarted epoch recomputes the
    identical order, so position-ranged output shards are resumable; epoch
    ``e+1`` is just ``seed + 1``.  Ties are impossible within one epoch
    (``key_col`` breaks the sort after the hash), so the permutation is
    total.  Output: the input columns + ``pos_col``; blocks come back
    range-ordered by position, ready for a sharded ``write_parquet``.

    Reference analog: none — the reference trains from a fixed HF dataset
    order (``mix_blink/train.py``); epoch ordering is part of this engine's
    training-data suite, same family as ``hash_sample`` above.
    """
    from .scan import prefix_scan
    from .sketches import splitmix64

    seed_mix = splitmix64(np.array([seed], dtype=np.uint64))[0]

    def add_key(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[key_col], dtype=np.int64).view(np.uint64)
        h = splitmix64(ids ^ seed_mix).view(np.int64)
        return b.append_column("_sk", pa.array(h)).append_column(
            "_one", pa.array(np.ones(b.num_rows, dtype=np.int64))
        )

    out = prefix_scan(
        ds.map_batches(add_key, batch_format="pyarrow"),
        ["_sk", key_col],
        "_one",
        out_col="_run",
        row_col=pos_col,
    )
    return out.map_batches(
        lambda b: b.drop_columns(["_sk", "_one", "_run"]), batch_format="pyarrow"
    )

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

__all__ = ["lehmer_hash", "hash_sample", "stratified_sample"]

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

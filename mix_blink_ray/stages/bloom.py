"""Bloom-filter semi-join: compact prefilter + exact verify.

The broadcast semi-join (``queries.q3_top_orders`` pattern) ships the exact
key set to every worker — perfect while the build side fits in a broadcast.
At 100 TB the build side can be billions of keys; the classic answer is a
Bloom filter: ~10 bits/key regardless of key width, mergeable by bitwise OR
(associative/commutative/idempotent — the same shape as HLL register max in
``stages/sketches.py``).  The probe side drops most non-matching rows
map-side for the cost of a broadcast that is 6–8× smaller than the key set,
and the surviving sliver goes through a partitioned hash join against the
build keys for EXACTNESS — false positives never reach the output, so the
operator's semantics are a plain semi-join (SQL twin: ``EXISTS``), with the
filter purely a shuffle-volume optimization.  Pruned-row and false-positive
counts are published via ``state.counters`` (never silent).

Plan shape: build-side ``map_batches`` emits per-batch DISTINCT set-bit
indices → one vectorized hash-aggregate dedups them (shuffle ∝ set bits ×
blocks, never rows; no per-group Python) → the driver scatters ≤ m_bits
indices into the word array, which broadcasts via ``ray.put`` → probe-side
vectorized k-hash membership test → partitioned join of survivors.  Hashes
are splitmix64 with distinct salts (deterministic across runs and
partitionings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .sketches import splitmix64

__all__ = ["build_bloom", "bloom_semi_join"]

_SALTS = (0x243F6A8885A308D3, 0x13198A2E03707344, 0xA4093822299F31D0, 0x082EFA98EC4E6C89)


def _bit_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for int64 keys (salted splitmix64 per hash)."""
    u = keys.astype(np.int64).view(np.uint64)
    return np.stack([splitmix64(u ^ np.uint64(_SALTS[i])) % np.uint64(m_bits) for i in range(k)])


def build_bloom(keys: Dataset, key_col: str, m_bits: int = 1 << 23, k: int = 3) -> np.ndarray:
    """Distributed Bloom build → the merged (m_bits/64,) uint64 word array.

    Per-batch partials emit only their distinct SET BITS; the OR-merge is a
    single hash-aggregate whose input is bounded by set-bits × blocks
    (filter size, not row count).  The merged index table — at most m_bits
    rows — is the only driver materialization.
    """
    if k > len(_SALTS):
        raise ValueError(f"k={k} exceeds available salts ({len(_SALTS)})")
    n_words = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"bidx": pa.array([], pa.int64())})
        pos = _bit_positions(np.asarray(b[key_col], dtype=np.int64), m_bits, k).reshape(-1)
        return pa.table({"bidx": pa.array(np.unique(pos).astype(np.int64))})

    # OR-merge ≡ distinct set-bit indices: per-batch unique bits (≤ k × keys
    # rows per block), one vectorized hash-aggregate (never per-group
    # Python), and a driver scatter into the word array.  Shuffle and driver
    # volume are bounded by the number of SET BITS (≤ m_bits, sized sparse),
    # never by row count.
    from ray.data.aggregate import Count

    merged = (
        keys.map_batches(partial, batch_format="pyarrow")
        .groupby("bidx")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    words = np.zeros(n_words, dtype=np.uint64)
    if len(merged):
        bits = merged["bidx"].to_numpy().astype(np.uint64)
        np.bitwise_or.at(words, (bits >> np.uint64(6)).astype(np.int64), np.uint64(1) << (bits & np.uint64(63)))
    return words


def bloom_semi_join(
    probe: Dataset,
    build: Dataset,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 23,
    k: int = 3,
    num_partitions: int = 16,
) -> Dataset:
    """Exact semi-join (rows of ``probe`` whose key exists in ``build``),
    Bloom-prefiltered: survivors of the broadcast membership test go through
    a partitioned hash join against the distinct build keys, so false
    positives are eliminated and the output is exactly ``WHERE EXISTS``."""
    from ..state.counters import incr
    from .clustering import clamped_partitions

    words = build_bloom(build, build_key, m_bits=m_bits, k=k)
    words_ref = ray.put(words)

    def prefilter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        w = ray.get(words_ref)
        pos = _bit_positions(np.asarray(b[probe_key], dtype=np.int64), m_bits, k)
        hit = np.ones(b.num_rows, dtype=bool)
        for i in range(pos.shape[0]):
            p = pos[i]
            hit &= (w[(p >> np.uint64(6)).astype(np.int64)] >> (p & np.uint64(63))) & np.uint64(1) != 0
        incr("bloom_pruned_rows", int(b.num_rows - hit.sum()))
        return b.filter(pa.array(hit))

    survivors = probe.map_batches(prefilter, batch_format="pyarrow").materialize()
    n_surv = survivors.count()
    if n_surv == 0:
        return survivors
    # LEFT SEMI join: exact membership without distinct-ing the build side
    # (semi semantics never duplicate probe rows) — one exchange fewer than
    # dedup-then-inner-join.  Per-batch pc.unique still contracts the build
    # side map-side so only distinct keys per block enter the shuffle.
    build_keys = build.map_batches(
        lambda b: pa.table({"__bk": pc.unique(b[build_key])}), batch_format="pyarrow"
    )
    np_ = clamped_partitions(n_surv, num_partitions)
    return survivors.join(
        build_keys, join_type="left_semi", num_partitions=np_, on=(probe_key,), right_on=("__bk",)
    )

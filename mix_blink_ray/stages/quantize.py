"""Scalar (int8-range) embedding quantization — the broadcast-memory scale
path for the ANN suite.

At 100 TB the float32 catalog that ``stages/scoring.py`` broadcasts is 4×
larger than it needs to be for candidate generation; per-dimension scalar
quantization to uint8 codes cuts the object-store copy 4× at a bounded,
measurable recall cost (re-rank survivors against the float column for
exactness — same verify-pass shape as ``stages/bloom.py``).

Plan shape: per-batch per-dimension (min, max) partials (``dim`` rows per
block, never vectors) → tiny ``groupby(dim).min/max`` merge → the
``2 × dim`` scale vector broadcasts via ``ray.put`` → per-batch vectorized
encode.  Rounding is ``floor(x + 0.5)`` (half-up) in BOTH the engine and the
SQL oracle — ``np.round``'s banker's rounding vs SQL ``round``'s
half-away-from-zero would silently diverge on exact halves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

__all__ = ["dim_min_max", "quantize_embeddings", "dequantize", "code_gram"]


def _stack(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def dim_min_max(ds: Dataset, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Global per-dimension (min, max) of a ``list<float>`` column via
    map-side partials: each block contributes ``dim`` rows, the merge is a
    tiny groupby — vector count never enters the exchange."""
    from ray.data.aggregate import Max, Min

    def partial(b: pa.Table) -> pa.Table:
        m = _stack(b[col])
        if not m.size:
            return pa.table(
                {"dim": pa.array([], pa.int64()), "mn": pa.array([], pa.float64()),
                 "mx": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "mn": pa.array(m.min(axis=0)),
                "mx": pa.array(m.max(axis=0)),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("dim")
    )
    return merged["mn"].to_numpy(), merged["mx"].to_numpy()


def quantize_embeddings(ds: Dataset, col: str, id_col: str = "vec_id") -> Dataset:
    """uint8-code quantization per dimension: ``code = floor((v − mn) * 255 /
    (mx − mn) + 0.5)`` (constant-dimension columns map to 0).  Returns
    ``(id_col, codes: list<uint8>)``; the scale vectors broadcast once."""
    mn, mx = dim_min_max(ds, col)
    span = mx - mn
    scale = np.divide(255.0, span, out=np.zeros_like(span), where=span > 0)
    ref = ray.put((mn, scale))

    def encode(b: pa.Table) -> pa.Table:
        m = _stack(b[col])
        mn_, sc_ = ray.get(ref)
        codes = np.floor((m - mn_) * sc_ + 0.5).astype(np.uint8) if m.size else m.astype(np.uint8)
        n, d = m.shape if m.size else (b.num_rows, 0)
        return pa.table(
            {
                id_col: b[id_col],
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), d
                )
                if n
                else pa.array([], pa.list_(pa.uint8(), d)),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def dequantize(codes: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Reconstruction: ``v ≈ mn + code × (mx − mn) / 255`` (midpoint-free,
    matches the encoder's zero point)."""
    span = mx - mn
    return mn + codes.astype(np.float64) * (span / 255.0)


def code_gram(ds: Dataset, col: str = "embedding", id_col: str = "vec_id") -> Dataset:
    """Distributed Gram matrix over the uint8 quantization codes:
    ``G[i, j] = Σ_vec code_i · code_j`` (upper triangle, i ≤ j) — the
    integer-exact flavor of the covariance/PCA building block (a float Gram
    cannot hash-match across engines: partial-sum association differs; uint8
    products summed in int64 are exact to ~1.4·10¹⁴ vectors).

    Each block contributes one dim×dim partial (``mᵀm`` — vectors never
    leave the worker); the exchange carries dim²/2 rows per block into a
    tiny ``groupby((i, j)).sum``."""
    from ray.data.aggregate import Sum

    codes_ds = quantize_embeddings(ds, col, id_col)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"dim_i": pa.array([], pa.int64()), "dim_j": pa.array([], pa.int64()),
             "g_partial": pa.array([], pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        arr = b["codes"].combine_chunks() if isinstance(b["codes"], pa.ChunkedArray) else b["codes"]
        flat = np.asarray(arr.flatten(), dtype=np.int64)
        d = len(flat) // b.num_rows if b.num_rows else 0
        if d == 0:
            return empty
        m = flat.reshape(b.num_rows, d)
        g = m.T @ m
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "dim_i": pa.array(iu.astype(np.int64)),
                "dim_j": pa.array(ju.astype(np.int64)),
                "g_partial": pa.array(g[iu, ju]),
            }
        )

    return (
        codes_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dim_i", "dim_j"])
        .aggregate(Sum("g_partial", alias_name="g"))
    )

"""Scalar embedding quantization: reconstruction bound, search recall,
layout invariance."""

import numpy as np
import pyarrow as pa
import ray

from mix_blink_ray.stages.quantize import dequantize, dim_min_max, quantize_embeddings


def _emb_table(n=200, d=16, seed=1):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[:, 3] = 7.25  # constant dimension → span 0 must not divide-by-zero
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), d
            ),
        }
    ), m.astype(np.float64)


def _codes(ds_out):
    df = ds_out.to_pandas().sort_values("vec_id")
    return np.stack(df["codes"].to_numpy())


def test_quantize_reconstruction_bound():
    tbl, m = _emb_table()
    ds = ray.data.from_arrow(tbl).repartition(4)
    mn, mx = dim_min_max(ds, "embedding")
    assert np.allclose(mn, m.min(axis=0)) and np.allclose(mx, m.max(axis=0))
    codes = _codes(quantize_embeddings(ds, "embedding"))
    assert codes.dtype == np.uint8
    recon = dequantize(codes, mn, mx)
    span = mx - mn
    # half-up rounding error ≤ span/510 per dim (plus float slack)
    assert (np.abs(recon - m) <= span / 500.0 + 1e-9).all()
    # constant dim: codes all 0, reconstruction exact
    assert (codes[:, 3] == 0).all() and np.allclose(recon[:, 3], 7.25)


def test_quantized_search_recall():
    tbl, m = _emb_table(n=300, d=24, seed=8)
    ds = ray.data.from_arrow(tbl).repartition(3)
    mn, mx = dim_min_max(ds, "embedding")
    recon = dequantize(_codes(quantize_embeddings(ds, "embedding")), mn, mx)

    def topk(mat, k=5):
        norm = np.linalg.norm(mat, axis=1, keepdims=True)
        u = mat / np.maximum(norm, 1e-12)
        sims = u @ u.T
        np.fill_diagonal(sims, -np.inf)
        return np.argsort(-sims, axis=1)[:, :k]

    exact, approx = topk(m), topk(recon)
    recall = np.mean([len(set(a) & set(b)) / 5.0 for a, b in zip(exact, approx)])
    assert recall >= 0.9


def test_quantize_layout_invariant():
    tbl, _ = _emb_table(n=120, d=8, seed=3)
    a = _codes(quantize_embeddings(ray.data.from_arrow(tbl).repartition(2), "embedding"))
    b = _codes(quantize_embeddings(ray.data.from_arrow(tbl).repartition(9), "embedding"))
    assert (a == b).all()


def test_code_gram_matches_numpy_and_layouts(ray_session):
    """Distributed Gram over codes == single-process numpy Gram, at several
    block layouts (int64-exact, so equality is bitwise)."""
    import ray.data as rd

    from mix_blink_ray.stages.quantize import code_gram, dim_min_max, quantize_embeddings

    rng = np.random.default_rng(9)
    n, d = 120, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float32()), d
            ),
        }
    )
    # reference: quantize identically, then one numpy matmul
    mn = emb.astype(np.float64).min(axis=0)
    mx = emb.astype(np.float64).max(axis=0)
    scale = np.where(mx > mn, 255.0 / (mx - mn), 0.0)
    codes = np.floor((emb.astype(np.float64) - mn) * scale + 0.5).astype(np.int64)
    want = codes.T @ codes
    for n_blocks in (1, 5, 16):
        out = code_gram(rd.from_arrow(tbl).repartition(n_blocks)).to_pandas()
        assert len(out) == d * (d + 1) // 2, n_blocks
        for r in out.itertuples():
            assert r.g == want[r.dim_i, r.dim_j], (n_blocks, r.dim_i, r.dim_j)

"""Encoder protocol + the deterministic hashed-char-n-gram bi-encoder.

The reference scores mention/entity pairs with a BERT bi-encoder: CLS pooling
(``mix_blink/modeling/encoder.py:73``) with an optional linear projection when
encoder width ≠ configured width (``encoder.py:48-49, 75-76``), wrapped as two
encoders in ``BiEncoder`` (``encoder.py:80-119``).  This container has no
torch, so the engine's default encoder is a deterministic hashed char-n-gram
embedding — same *role* in the pipeline (text → fixed-width float32 vector,
dot-product/cosine comparable), fully vectorized, and identical across
processes, which is what the parity/F1 gates need.  A HuggingFace-backed
encoder with the same protocol is gated behind an import-try.

Encoders are constructed once per scorer actor (``__init__``), reference
analog: weights loaded once per process.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

import numpy as np
import pyarrow as pa

from .hashing import char_ngram_hashes, flat_utf8, hashed_ngram_multihot

__all__ = ["Encoder", "HashNgramEncoder", "MiniTransformerEncoder", "HFEncoder"]


class Encoder(Protocol):
    """``encode(strings) -> (n, dim) float32`` — the pluggable encoder surface.

    Engine analog of the reference's pluggable ``AutoModel`` encoder families
    (``mix_blink/config.py:10-42``).
    """

    dim: int

    def encode(self, strings: pa.Array | pa.ChunkedArray) -> np.ndarray: ...


@dataclass
class HashNgramEncoder:
    """Deterministic signed hashed char-n-gram embedding, L2-normalized.

    L2 normalization at encode time makes ``ip`` ≡ ``cos`` for this encoder
    (the reference normalizes only for ``cos``: ``mix_blink/retriever/
    dense.py:81-82, 92-93``); keeping raw feature counts is available with
    ``normalize=False``.
    """

    dim: int = 64
    n: int = 3
    normalize: bool = True
    # include_short: rows shorter than ``n`` contribute one whole-string
    # hash feature (the robust default).  SQL-oracled paths disable it so
    # the feature map matches a gram-range replay exactly (round-3 ADVICE).
    include_short: bool = True

    def encode(self, strings: pa.Array | pa.ChunkedArray) -> np.ndarray:
        data, offsets = flat_utf8(strings)
        grams, rows = char_ngram_hashes(data, offsets, n=self.n, include_short=self.include_short)
        mat = hashed_ngram_multihot(grams, rows, len(offsets) - 1, self.dim)
        if self.normalize:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            np.divide(mat, norms, out=mat, where=norms > 0)
        return mat


class MiniTransformerEncoder:
    """Deterministic pure-numpy 2-layer MLP + attention encoder (fixed
    seed) — the multi-layer learned-encoder stand-in that exercises
    everything the HF path would through the REAL scorer actor pools,
    without torch:

    - weights built lazily ONCE per process (``__getstate__`` drops them, so
      an actor rebuilds on first batch — the "load checkpoint once per
      worker" shape; ``build_count`` observably stays 1 per process),
    - CLS pooling in the attention branch (reference
      ``mix_blink/modeling/encoder.py:73``),
    - linear projection iff encoder width ≠ configured width (reference
      ``encoder.py:48-49, 75-76`` — default hidden 48 ≠ dim, so the quirk
      path runs),
    - batch padding to a FIXED ``max_len`` with key masking, making each
      row's embedding batch-composition-invariant (asserted to float32
      tolerance — BLAS reduction order varies with batch shape, so bit
      equality is not promised).

    Architecture (untrained, so chosen for contrast rather than learned):
    a 2-layer tanh MLP over L2-normalized hashed char-3-gram multihot
    features (the content path — tanh is odd, so random weights add no
    input-norm-dependent bias direction) summed with 0.25× a 2-layer
    single-head softmax-attention stack over the gram-embedding sequence
    with CLS pooling (the sequence path, centered at its null-input CLS to
    strip the random-transformer anisotropy).  Near-identical surfaces share
    most grams, so cosine stays high under typos and low across unrelated
    strings — enough for the linkage F1 gate, which the e2e test pins.
    """

    def __init__(
        self,
        dim: int = 64,
        hidden: int = 48,
        n_layers: int = 2,
        max_len: int = 24,
        vocab: int = 4096,
        feat_dim: int = 512,
        seed: int = 42,
        normalize: bool = True,
    ):
        self.dim = dim
        self.hidden = hidden
        self.n_layers = n_layers
        self.max_len = max_len
        self.vocab = vocab
        self.feat_dim = feat_dim
        self.seed = seed
        self.normalize = normalize
        self._w: dict | None = None
        self.build_count = 0

    def __getstate__(self):
        s = self.__dict__.copy()
        s["_w"] = None  # weights never pickled; each process rebuilds once
        s["build_count"] = 0
        return s

    def _weights(self) -> dict:
        if self._w is None:
            rng = np.random.RandomState(self.seed)
            h = self.hidden

            def mat(a: int, b: int) -> np.ndarray:
                return (rng.randn(a, b) / np.sqrt(a)).astype(np.float32)

            pos = np.zeros((self.max_len, h), dtype=np.float32)
            p = np.arange(self.max_len, dtype=np.float32)[:, None]
            div = np.exp(np.arange(0, h, 2, dtype=np.float32) * (-np.log(10000.0) / h))
            pos[:, 0::2] = np.sin(p * div)
            pos[:, 1::2] = np.cos(p * div[: (h - h // 2)])
            layers = [
                {
                    "wq": mat(h, h), "wk": mat(h, h), "wv": mat(h, h), "wo": mat(h, h),
                    "w1": mat(h, 4 * h), "w2": mat(4 * h, h),
                }
                for _ in range(self.n_layers)
            ]
            self._w = {
                # row 0 = CLS embedding; gram ids occupy 1..vocab
                "emb": (rng.randn(self.vocab + 1, h).astype(np.float32)),
                "pos": pos,
                "layers": layers,
                "wm1": mat(self.feat_dim, 4 * h),
                "wm2": mat(4 * h, h),
                "proj": mat(h, self.dim) if self.dim != h else None,
            }
            # Anisotropy correction: a random transformer's CLS vectors share
            # a large common component, flattening cosine contrast; center at
            # the null-input CLS (computed once, part of the "checkpoint").
            tok0 = np.zeros((1, self.max_len), dtype=np.int64)
            mask0 = np.zeros((1, self.max_len), dtype=bool)
            mask0[:, 0] = True
            self._w["null"] = self._forward(tok0, mask0)[0]
            self.build_count += 1
        return self._w

    def _token_ids(self, strings: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
        data, offsets = flat_utf8(strings)
        grams, rows = char_ngram_hashes(data, offsets, n=3)
        n = len(offsets) - 1
        ids = (grams % np.uint64(self.vocab)).astype(np.int64) + 1
        counts = np.bincount(rows, minlength=n)
        starts = np.concatenate([[0], np.cumsum(counts)])
        pos_in_row = np.arange(len(rows), dtype=np.int64) - starts[rows]
        keep = pos_in_row < self.max_len - 1
        tok = np.zeros((n, self.max_len), dtype=np.int64)  # pos 0 = CLS (id 0)
        mask = np.zeros((n, self.max_len), dtype=bool)
        mask[:, 0] = True
        tok[rows[keep], pos_in_row[keep] + 1] = ids[keep]
        mask[rows[keep], pos_in_row[keep] + 1] = True
        return tok, mask

    @staticmethod
    def _layernorm(x: np.ndarray, eps: float = 1e-5) -> np.ndarray:
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps)

    @staticmethod
    def _gelu(x: np.ndarray) -> np.ndarray:
        return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))

    def _forward(self, tok: np.ndarray, mask: np.ndarray) -> np.ndarray:
        w = self._w
        x = (w["emb"][tok] + w["pos"][None, :, :]).astype(np.float32)
        neg = np.where(mask, 0.0, -np.inf).astype(np.float32)[:, None, :]  # key mask
        scale = 1.0 / np.sqrt(self.hidden)
        for layer in w["layers"]:
            xn = self._layernorm(x)
            q, k, v = xn @ layer["wq"], xn @ layer["wk"], xn @ layer["wv"]
            att = q @ k.transpose(0, 2, 1) * scale + neg
            att = att - att.max(axis=-1, keepdims=True)
            e = np.exp(att)
            att = e / e.sum(axis=-1, keepdims=True)
            x = x + (att @ v) @ layer["wo"]
            xn2 = self._layernorm(x)
            x = x + self._gelu(xn2 @ layer["w1"]) @ layer["w2"]
        # CLS pooling at HIDDEN width, reference encoder.py:73
        return self._layernorm(x)[:, 0, :].astype(np.float32)

    @staticmethod
    def _unit(x: np.ndarray) -> np.ndarray:
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        return np.divide(x, norms, out=np.zeros_like(x), where=norms > 0)

    def encode(self, strings: pa.Array | pa.ChunkedArray) -> np.ndarray:
        from .hashing import hashed_ngram_multihot

        w = self._weights()
        data, offsets = flat_utf8(strings)
        n = len(offsets) - 1
        if n == 0:
            return np.zeros((0, self.dim), dtype=np.float32)
        # content branch: 2-layer tanh MLP over unit multihot gram features
        grams, rows = char_ngram_hashes(data, offsets, n=3)
        multi = self._unit(hashed_ngram_multihot(grams, rows, n, self.feat_dim))
        mlp_h = self._unit(np.tanh(2.0 * (multi @ w["wm1"])) @ w["wm2"])
        # sequence branch: attention stack, CLS-pooled, null-centered
        tok, mask = self._token_ids(strings)
        attn_h = self._unit(self._forward(tok, mask) - w["null"][None, :])
        hidden = mlp_h + 0.25 * attn_h
        out = hidden @ w["proj"] if w["proj"] is not None else hidden
        if self.normalize:
            out = self._unit(out)
        return out.astype(np.float32)


class HFEncoder:
    """HuggingFace bi-encoder (CLS pooling + optional projection), if torch
    and transformers are installed.  Mirrors reference pooling semantics
    (``mix_blink/modeling/encoder.py:73``) without importing reference code.
    Not available in this container — gated so the package imports cleanly.
    """

    def __init__(self, model_name: str, dim: int | None = None, device: str = "cpu"):
        try:
            import torch  # noqa: F401
            from transformers import AutoModel, AutoTokenizer
        except ImportError as e:  # pragma: no cover - not installed here
            raise NotImplementedError(
                "HFEncoder requires torch+transformers, which are not in this "
                "environment; use HashNgramEncoder"
            ) from e
        self._torch = __import__("torch")
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name).to(device).eval()
        hidden = self.model.config.hidden_size
        self.dim = dim or hidden
        self.device = device
        self._proj = None
        if self.dim != hidden:  # reference: projection iff width mismatch
            g = self._torch.Generator().manual_seed(42)
            self._proj = self._torch.randn(hidden, self.dim, generator=g) / hidden**0.5

    def encode(self, strings: pa.Array | pa.ChunkedArray) -> np.ndarray:  # pragma: no cover
        texts = strings.to_pylist()
        enc = self.tokenizer(texts, padding=True, truncation=True, return_tensors="pt").to(self.device)
        with self._torch.no_grad():
            out = self.model(**enc).last_hidden_state[:, 0]  # CLS pooling
            if self._proj is not None:
                out = out @ self._proj.to(self.device)
        return out.cpu().numpy().astype(np.float32)

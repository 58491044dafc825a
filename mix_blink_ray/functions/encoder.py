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

__all__ = ["Encoder", "HashNgramEncoder", "HFEncoder"]


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

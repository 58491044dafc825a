"""Vectorized string-hashing kernels over raw Arrow UTF-8 buffers.

Everything in this module operates zero-copy on the flat ``data`` buffer and
``offsets`` of an Arrow (large_)string array with NumPy — there is no Python
loop over rows in any hot path.  These kernels power:

- the deterministic hash-n-gram encoder (``functions/encoder.py``) — the
  engine's stand-in for the reference bi-encoder forward pass
  (reference: ``mix_blink/modeling/encoder.py:16-77``),
- MinHash signatures / LSH band keys for blocking (``stages/blocking.py``),
- SimHash fingerprints and n-gram Jaccard for near-dedup (``stages/dedup.py``).

All hashes are seeded and deterministic across processes/machines (no reliance
on Python's salted ``hash``), which is what makes retries and resumes
idempotent (SURVEY.md §4 "Determinism under retries/parallelism").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# FNV-64 prime as the polynomial base; arithmetic wraps mod 2**64 (uint64).
_P = np.uint64(1099511628211)
# Second independent base for the 128-bit full-content hash (odd ⇒ invertible
# mod 2^64, so the polynomial map loses no entropy).
_P2 = np.uint64(0x9E3779B185EBCA87)
_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)

__all__ = [
    "flat_utf8",
    "gather_substrings",
    "char_ngram_hashes",
    "token_ngram_hashes",
    "hash_strings",
    "hash_strings_full",
    "rolling_hashes",
    "minhash_signatures",
    "lsh_band_keys",
    "simhash",
    "hashed_ngram_multihot",
]


def flat_utf8(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(data, offsets)`` views of a string array's UTF-8 buffers.

    ``data`` is the full flat uint8 buffer; ``offsets`` is an int64 array of
    length ``len(arr) + 1`` indexing into ``data``.  Nulls appear as empty
    rows.  Zero-copy except for the (cheap) cast to ``large_string``.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data_buf = buffers[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None and len(data_buf) > 0
        else np.zeros(0, dtype=np.uint8)
    )
    return data, offsets


def char_to_byte_offsets(
    data: np.ndarray, offsets: np.ndarray, char_offs: np.ndarray
) -> np.ndarray:
    """Convert per-row CHARACTER offsets to byte offsets into the flat UTF-8
    buffer of :func:`flat_utf8`.

    ``char_offs[i]`` is a Python-``str`` character index into row ``i``'s text
    (the reference's contract — ``mix_blink/data/dataset.py:85-92`` slices the
    str, so a dataset with non-ASCII text before a mention has char ≠ byte
    offsets).  Returns global byte positions suitable for
    :func:`gather_substrings`.  Char offsets past the row's length clamp to
    the row end (Python slice semantics).  ASCII-only buffers short-circuit to
    pure arithmetic.
    """
    char_offs = np.asarray(char_offs, dtype=np.int64)
    if len(data) == 0:
        return offsets[:-1] + np.minimum(char_offs, 0)
    # UTF-8 char starts = every byte that is NOT a continuation byte (0b10xxxxxx).
    start_pos = np.flatnonzero((data & 0xC0) != 0x80).astype(np.int64)
    if len(start_pos) == len(data):  # pure ASCII: char offset == byte offset
        return offsets[:-1] + np.minimum(char_offs, offsets[1:] - offsets[:-1])
    # global char index of each row boundary (rows are contiguous, so row
    # r's chars occupy start_pos[cum[r]:cum[r+1]])
    cum = np.searchsorted(start_pos, offsets, side="left")
    start_pos_ext = np.append(start_pos, np.int64(len(data)))
    return start_pos_ext[np.minimum(cum[:-1] + char_offs, cum[1:])]


def gather_substrings(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Array:
    """Vectorized substring gather: byte ranges ``[starts[i], ends[i])`` of the
    flat buffer → a new ``large_string`` array.  The per-row-offset slicing
    that ``pc.utf8_slice_codeunits`` can't do (its bounds are scalars).
    Ranges are byte offsets and must fall on UTF-8 codepoint boundaries.
    """
    starts = starts.astype(np.int64)
    ends = ends.astype(np.int64)
    lengths = ends - starts
    if np.any(lengths < 0):
        raise ValueError("ends must be >= starts")
    new_off = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=new_off[1:])
    total = int(new_off[-1])
    if total == 0:
        out_data = np.zeros(0, dtype=np.uint8)
    else:
        pos = np.arange(total, dtype=np.int64)
        pos += np.repeat(starts - new_off[:-1], lengths)
        out_data = data[pos]
    return pa.Array.from_buffers(
        pa.large_string(),
        len(starts),
        [None, pa.py_buffer(new_off), pa.py_buffer(out_data)],
    )


def char_ngram_hashes(
    data: np.ndarray, offsets: np.ndarray, n: int = 3, *, include_short: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every char n-gram of every row; returns ``(gram_hashes, row_ids)``.

    ``row_ids`` is sorted ascending (grams appear in buffer order), which lets
    downstream reducers use contiguous-segment ``ufunc.reduceat``.  Rows
    shorter than ``n`` contribute one whole-string hash when
    ``include_short`` (so `"ab"` still gets a signature), else nothing.
    """
    nrows = len(offsets) - 1
    total = int(offsets[-1] - offsets[0])
    if total >= n:
        span = data[offsets[0] : offsets[-1]]
        m = len(span) - n + 1
        h = np.zeros(m, dtype=np.uint64)
        for i in range(n):
            h = h * _P + span[i : m + i].astype(np.uint64)
        starts = np.arange(m, dtype=np.int64) + offsets[0]
        row = np.searchsorted(offsets, starts, side="right") - 1
        valid = (starts + n) <= offsets[row + 1]
        gram_h, gram_row = h[valid], row[valid]
    else:
        gram_h = np.zeros(0, dtype=np.uint64)
        gram_row = np.zeros(0, dtype=np.int64)

    if include_short:
        lengths = offsets[1:] - offsets[:-1]
        short = np.flatnonzero((lengths > 0) & (lengths < n))
        if len(short):
            sh = hash_strings(data, offsets)[short]
            gram_h = np.concatenate([gram_h, sh])
            gram_row = np.concatenate([gram_row, short.astype(np.int64)])
            order = np.argsort(gram_row, kind="stable")
            gram_h, gram_row = gram_h[order], gram_row[order]
    return gram_h, gram_row


def token_ngram_hashes(toks: pa.ListArray | pa.ChunkedArray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash every TOKEN n-gram of every list row; returns ``(gram_hashes, row_ids)``.

    ``toks`` is a ``list<string>`` array (e.g. the output of whitespace
    tokenization).  Each token is hashed once (full polynomial hash +
    avalanche), then windows of ``n`` consecutive token hashes are combined
    with an avalanched polynomial — so the cost is O(total tokens), not
    O(total gram characters), and no gram strings are ever materialized
    (the string form exists only in the DuckDB oracles).  Rows with fewer
    than ``n`` tokens contribute nothing.  ``row_ids`` is ascending.

    Rows must be non-null (``ListArray.flatten`` drops null rows, which would
    desynchronize the offsets); tokenizer output of non-null text satisfies
    this.
    """
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    if toks.null_count:
        raise ValueError("token_ngram_hashes requires non-null list rows")
    off = np.asarray(toks.offsets, dtype=np.int64)
    off = off - off[0]
    flat = toks.flatten()
    data, soff = flat_utf8(flat)
    th = _splitmix64(hash_strings(data, soff, max_bytes=1 << 30))
    m = len(th) - n + 1
    if m <= 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    h = np.full(m, _SEED_MIX, dtype=np.uint64)
    for i in range(n):
        h = _splitmix64(h * _P + th[i : m + i])
    starts = np.arange(m, dtype=np.int64)
    row = np.searchsorted(off, starts, side="right") - 1
    valid = (starts + n) <= off[row + 1]
    return h[valid], row[valid]


def hash_strings(data: np.ndarray, offsets: np.ndarray, max_bytes: int = 64) -> np.ndarray:
    """Whole-string polynomial hash per row (first ``max_bytes`` bytes + length).

    Vectorized across rows: loops over byte *positions* (bounded by the longest
    row, capped), never over rows.
    """
    nrows = len(offsets) - 1
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    h = lengths.astype(np.uint64) * _P + _SEED_MIX
    if nrows == 0 or len(data) == 0:
        return h
    maxlen = min(int(lengths.max(initial=0)), max_bytes)
    for j in range(maxlen):
        idx = offsets[:-1] + j
        m = j < lengths
        h[m] = h[m] * _P + data[idx[m]].astype(np.uint64)
    return h


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Final avalanche (splitmix64 finalizer, public domain constant set)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


# Two-level power table: P^e = P^(e mod 2^16) · (P^2^16)^(e >> 16) — bounds
# table memory at O(2^16 + maxlen/2^16) no matter how long one row is.
_POW_BLOCK = 1 << 16


def _pow_tables(base: np.uint64, maxlen: int) -> tuple[np.ndarray, np.ndarray]:
    small_n = min(maxlen, _POW_BLOCK)
    small = np.empty(small_n, dtype=np.uint64)
    small[0] = np.uint64(1)
    if small_n > 1:
        small[1:] = np.cumprod(np.full(small_n - 1, base, dtype=np.uint64))
    big_n = maxlen // _POW_BLOCK + 1
    big = np.empty(big_n, dtype=np.uint64)
    big[0] = np.uint64(1)
    if big_n > 1:
        big_base = small[-1] * base if small_n == _POW_BLOCK else base
        big[1:] = np.cumprod(np.full(big_n - 1, big_base, dtype=np.uint64))
    return small, big


# Row-chunking bound for the transient (row_of, exponent) int64 arrays: keeps
# the ~24 B/text-byte working set per chunk at a few hundred MB max.
_FULL_HASH_CHUNK_BYTES = 8 << 20


def hash_strings_full(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Full-length 128-bit content hash per row — NO truncation.

    Unlike :func:`hash_strings` (a 64-byte-prefix bucketing hash, fine for
    blocking keys), this reads EVERY byte: two independent position-weighted
    polynomial hashes (h = Σ byte·base^(len−1−i), bases ``_P``/``_P2``) mixed
    with the length and finalized with splitmix64.  This is the identity key
    for :func:`..stages.dedup.exact_dedup` — same-length documents sharing a
    long prefix must NOT collide.

    Vectorized over the flat buffer: O(total bytes) work, no loop over rows or
    byte positions (rows are chunked only to bound transient memory).
    Returns ``(h1, h2)`` uint64 arrays of length nrows.
    """
    nrows = len(offsets) - 1
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    h1 = lengths.astype(np.uint64) * _P + _SEED_MIX
    h2 = lengths.astype(np.uint64) * _P2 + ~_SEED_MIX
    if nrows == 0 or len(data) == 0 or offsets[-1] == offsets[0]:
        return _splitmix64(h1), _splitmix64(h2)

    cum = (offsets - offsets[0]).astype(np.int64)
    total = int(cum[-1])
    n_chunks = max(1, (total + _FULL_HASH_CHUNK_BYTES - 1) // _FULL_HASH_CHUNK_BYTES)
    row_bounds = np.unique(
        np.concatenate(
            [
                [0],
                np.searchsorted(cum, np.arange(1, n_chunks) * _FULL_HASH_CHUNK_BYTES, side="left"),
                [nrows],
            ]
        )
    )
    for r0, r1 in zip(row_bounds[:-1], row_bounds[1:]):
        off = offsets[r0 : r1 + 1]
        if off[-1] == off[0]:
            continue
        span = data[off[0] : off[-1]].astype(np.uint64)
        seg_len = lengths[r0:r1]
        row_of = np.repeat(np.arange(r1 - r0, dtype=np.int64), seg_len)
        gpos = np.arange(off[0], off[-1], dtype=np.int64)
        e = off[1:][row_of] - 1 - gpos
        maxlen = int(seg_len.max())
        present = np.flatnonzero(seg_len > 0)
        seg_starts = (off[:-1] - off[0])[present]
        e_lo = e & np.int64(_POW_BLOCK - 1)
        e_hi = e >> np.int64(16)
        for base, h in ((_P, h1), (_P2, h2)):
            small, big = _pow_tables(base, maxlen)
            contrib = span * small[e_lo] * big[e_hi]
            h[r0 + present] += np.add.reduceat(contrib, seg_starts)
    return _splitmix64(h1), _splitmix64(h2)


def rolling_hashes(
    values: np.ndarray, row_ids: np.ndarray, nrows: int, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling w-window polynomial hash over per-row sequences of uint64 values.

    Used for word-level w-shingles: ``values`` = token hashes in row order,
    ``row_ids`` sorted ascending.  Rows with fewer than ``w`` tokens get one
    whole-sequence hash.  Returns ``(shingle_hashes, shingle_row_ids)``.
    """
    if len(values) == 0:
        return values.astype(np.uint64), row_ids
    # Segment boundaries of each row inside `values`.
    seg_starts = np.searchsorted(row_ids, np.arange(nrows), side="left")
    seg_ends = np.searchsorted(row_ids, np.arange(nrows), side="right")
    counts = seg_ends - seg_starts

    m = len(values) - w + 1
    if m > 0:
        h = np.zeros(m, dtype=np.uint64)
        for i in range(w):
            h = h * _P + values[i : m + i]
        starts = np.arange(m, dtype=np.int64)
        row = row_ids[starts]
        valid = (starts + w) <= seg_ends[row]
        out_h, out_row = h[valid], row[valid]
    else:
        out_h = np.zeros(0, dtype=np.uint64)
        out_row = np.zeros(0, dtype=np.int64)

    short_rows = np.flatnonzero((counts > 0) & (counts < w))
    if len(short_rows):
        acc = np.full(len(short_rows), _SEED_MIX, dtype=np.uint64)
        maxc = int(counts[short_rows].max())
        for j in range(maxc):
            idx = seg_starts[short_rows] + j
            mm = j < counts[short_rows]
            acc[mm] = acc[mm] * _P + values[idx[mm]]
        out_h = np.concatenate([out_h, acc])
        out_row = np.concatenate([out_row, short_rows.astype(np.int64)])
        order = np.argsort(out_row, kind="stable")
        out_h, out_row = out_h[order], out_row[order]
    return out_h, out_row


def _perm_coeffs(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_perms, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**62, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signatures(
    gram_hashes: np.ndarray,
    row_ids: np.ndarray,
    nrows: int,
    num_perms: int = 64,
    seed: int = 42,
) -> np.ndarray:
    """(nrows, num_perms) uint64 MinHash signature matrix.

    Empty rows (no grams) get the sentinel ``uint64 max`` in every slot so two
    empty strings still "collide" deterministically.  ``row_ids`` must be
    sorted ascending (as produced by :func:`char_ngram_hashes`).
    """
    a, b = _perm_coeffs(num_perms, seed)
    sig = np.full((nrows, num_perms), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(gram_hashes) == 0 or nrows == 0:
        return sig
    # Contiguous segments per present row → one reduceat per permutation.
    boundaries = np.flatnonzero(np.diff(row_ids)) + 1
    seg_starts = np.concatenate([[0], boundaries])
    present_rows = row_ids[seg_starts]
    for j in range(num_perms):
        hj = gram_hashes * a[j] + b[j]
        sig[present_rows, j] = np.minimum.reduceat(hj, seg_starts)
    return sig


def lsh_band_keys(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """(nrows, num_bands) int64 LSH band keys from a MinHash signature matrix.

    Each band key mixes the band index in, so keys from different bands never
    collide into the same blocking group.
    """
    nrows, num_perms = sig.shape
    if num_perms % num_bands != 0:
        raise ValueError(f"num_perms={num_perms} not divisible by num_bands={num_bands}")
    r = num_perms // num_bands
    keys = np.empty((nrows, num_bands), dtype=np.int64)
    for band in range(num_bands):
        h = np.full(nrows, _SEED_MIX + np.uint64(band), dtype=np.uint64)
        for j in range(band * r, (band + 1) * r):
            h = h * _P + sig[:, j]
        h = h * _P + np.uint64(band + 1)
        keys[:, band] = h.view(np.int64)
    return keys


def simhash(gram_hashes: np.ndarray, row_ids: np.ndarray, nrows: int) -> np.ndarray:
    """64-bit SimHash fingerprint per row (uint64), from char n-gram hashes."""
    out = np.zeros(nrows, dtype=np.uint64)
    if len(gram_hashes) == 0 or nrows == 0:
        return out
    boundaries = np.flatnonzero(np.diff(row_ids)) + 1
    seg_starts = np.concatenate([[0], boundaries])
    present_rows = row_ids[seg_starts]
    fp = np.zeros(len(present_rows), dtype=np.uint64)
    # One bit at a time keeps peak memory at O(len(grams)), not O(len(grams)·64).
    for bit in range(64):
        votes = (((gram_hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.int32) * 2) - 1
        sums = np.add.reduceat(votes, seg_starts)
        fp |= (sums > 0).astype(np.uint64) << np.uint64(bit)
    out[present_rows] = fp
    return out


def hashed_ngram_multihot(
    gram_hashes: np.ndarray, row_ids: np.ndarray, nrows: int, dim: int
) -> np.ndarray:
    """(nrows, dim) float32 signed hashed-n-gram feature matrix (un-normalized).

    The feature-hashing trick: column = ``h % dim``, sign from an independent
    hash bit.  This is the encoder's raw feature map; L2 normalization (for
    ``cos``) happens in the encoder.
    """
    if nrows == 0:
        return np.zeros((0, dim), dtype=np.float32)
    if len(gram_hashes) == 0:
        return np.zeros((nrows, dim), dtype=np.float32)
    col = (gram_hashes % np.uint64(dim)).astype(np.int64)
    sign = (((gram_hashes >> np.uint64(32)) & np.uint64(1)).astype(np.float64) * 2.0) - 1.0
    flat = np.bincount(row_ids * dim + col, weights=sign, minlength=nrows * dim)
    return flat.reshape(nrows, dim).astype(np.float32)

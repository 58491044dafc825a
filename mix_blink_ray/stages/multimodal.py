"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing is REAL and tested — schemas, batch sizing for large
binary rows, actor signatures, zero-copy buffer access, output layout.  The
codec work itself (JPEG decode, resampling, frame extraction) is STUBBED: the
image/audio libraries are not in this container, so each decoder either
raises ``NotImplementedError`` (``backend="real"``) or runs a deterministic
fake (``backend="fake"``, default) that derives features from the payload
bytes — enough to exercise the full pipeline shape end-to-end.

Scale notes: binary payloads dominate block size, so these stages want SMALL
``batch_size`` (tens of rows) and a larger ``target_max_block_size``; feature
outputs drop the payload column immediately so downstream stages stream the
small feature table, not the blobs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "ImageFeatures",
    "AudioFeatures",
    "VideoFrameSampler",
    "synth_media_batch",
    "parse_image_dims",
    "parse_wav_headers",
    "parse_mp4_headers",
    "make_png_payloads",
    "make_jpeg_payloads",
    "make_wav_payloads",
    "make_mp4_payloads",
]

# Canonical multimodal schema: payload + typed metadata.
MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),          # images/video; -1 otherwise
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),    # audio/video; -1 otherwise
    ]
)


def media_table(rows: list[dict]) -> pa.Table:
    cols = {f.name: [r.get(f.name) for r in rows] for f in MEDIA_SCHEMA}
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type) for k, v in cols.items()})


def synth_media_batch(n: int, kind: str = "image", seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (seeded payload bytes) for tests/bench."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rows.append(
            {
                "media_id": f"{kind}-{i:06d}",
                "kind": kind,
                "payload": rng.bytes(payload_bytes),
                "mime": {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 640 if kind != "audio" else -1,
                "height": 480 if kind != "audio" else -1,
                "duration_ms": 30_000 if kind != "image" else -1,
            }
        )
    return media_table(rows)


def _payload_matrix(payload: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of the flat binary buffer + offsets."""
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    if not pa.types.is_large_binary(payload.type):
        payload = payload.cast(pa.large_binary())
    offsets = np.frombuffer(payload.buffers()[1], dtype=np.int64)[
        payload.offset : payload.offset + len(payload) + 1
    ]
    buf = payload.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.zeros(0, np.uint8)
    return data, offsets


_PNG_SIG = np.frombuffer(b"\x89PNG\r\n\x1a\n", dtype=np.uint8)


def parse_image_dims(
    data: np.ndarray, offsets: np.ndarray, scan_limit: int = 65536
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """REAL image-header decode in pure numpy — no imaging library.

    Returns ``(width, height, fmt)`` int32 arrays per payload; ``fmt`` is
    1 = PNG, 2 = JPEG, 0 = unparseable (width/height −1).

    - PNG: 8-byte signature then the IHDR chunk — width big-endian at bytes
      16-20, height at 20-24 (PNG spec §11.2.2).  Fully vectorized (fixed
      offsets).
    - JPEG: SOI ``FFD8`` then marker segments ``FF xx LEN(BE)``; dimensions
      live in the SOFn frame header (``C0-CF`` except ``C4/C8/CC``): height
      BE at +5, width BE at +7 (ITU T.81 §B.2.2).  The marker walk is
      per-row Python but bounded by HEADER bytes — it stops at SOF/SOS or
      ``scan_limit``, never scanning entropy-coded image data.
    """
    n = len(offsets) - 1
    width = np.full(n, -1, dtype=np.int32)
    height = np.full(n, -1, dtype=np.int32)
    fmt = np.zeros(n, dtype=np.int32)
    if n == 0 or len(data) == 0:
        return width, height, fmt
    lens = offsets[1:] - offsets[:-1]

    # ── PNG: vectorized signature + IHDR field gather ──
    cand = np.flatnonzero(lens >= 24)
    if len(cand):
        sig_idx = offsets[cand, None] + np.arange(8)
        is_png = (data[sig_idx] == _PNG_SIG[None, :]).all(axis=1)
        # first chunk type MUST be IHDR (bytes 12-16, PNG spec §5.6/§11.2.2)
        ihdr_idx = offsets[cand, None] + 12 + np.arange(4)
        is_png &= (data[ihdr_idx] == np.frombuffer(b"IHDR", dtype=np.uint8)[None, :]).all(axis=1)
        png = cand[is_png]
        if len(png):
            def be32(at: np.ndarray) -> np.ndarray:
                b = data[at[:, None] + np.arange(4)].astype(np.int64)
                return (b[:, 0] << 24) | (b[:, 1] << 16) | (b[:, 2] << 8) | b[:, 3]

            width[png] = be32(offsets[png] + 16).astype(np.int32)
            height[png] = be32(offsets[png] + 20).astype(np.int32)
            fmt[png] = 1

    # ── JPEG: per-row bounded marker walk ──
    _SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    # clamp the probe indices so EMPTY rows (offset == len(data)) never
    # index out of bounds; the lens>=4 mask already excludes them logically
    first = np.minimum(offsets[:-1], len(data) - 1)
    jcand = np.flatnonzero(
        (lens >= 4) & (fmt == 0)
        & (data[first] == 0xFF)
        & (data[np.minimum(first + 1, len(data) - 1)] == 0xD8)
    )
    for i in jcand:
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        hi = min(hi, lo + scan_limit)
        p = lo + 2
        while p + 3 < hi:
            if data[p] != 0xFF:
                break
            marker = int(data[p + 1])
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone markers
                p += 2
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS: dimensions must precede
                break
            seg_len = (int(data[p + 2]) << 8) | int(data[p + 3])
            if seg_len < 2:
                break
            if marker in _SOF:
                if p + 8 < hi:
                    height[i] = (int(data[p + 5]) << 8) | int(data[p + 6])
                    width[i] = (int(data[p + 7]) << 8) | int(data[p + 8])
                    fmt[i] = 2
                break
            p += 2 + seg_len
    return width, height, fmt


def make_png_payloads(widths: np.ndarray, heights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimal valid-header PNG payloads (signature + IHDR, zeroed CRC —
    the parser reads fields, not checksums), vectorized: one (flat_bytes,
    offsets) pair for n rows of 33 bytes each."""
    n = len(widths)
    buf = np.zeros((n, 33), dtype=np.uint8)
    buf[:, :8] = _PNG_SIG
    buf[:, 8:12] = np.array([0, 0, 0, 13], dtype=np.uint8)  # IHDR data length
    buf[:, 12:16] = np.frombuffer(b"IHDR", dtype=np.uint8)
    w = widths.astype(np.int64)
    h = heights.astype(np.int64)
    for j in range(4):
        buf[:, 16 + j] = (w >> (8 * (3 - j))) & 0xFF
        buf[:, 20 + j] = (h >> (8 * (3 - j))) & 0xFF
    buf[:, 24] = 8   # bit depth
    buf[:, 25] = 2   # color type: truecolor
    offsets = np.arange(n + 1, dtype=np.int64) * 33
    return buf.reshape(-1), offsets


def make_jpeg_payloads(widths: np.ndarray, heights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimal JPEG payloads: SOI + APP0(JFIF) + SOF0 + EOI (35 bytes) —
    the APP0 segment forces the parser to WALK markers, not peek a fixed
    offset."""
    n = len(widths)
    buf = np.zeros((n, 35), dtype=np.uint8)
    buf[:, 0:2] = [0xFF, 0xD8]                                  # SOI
    buf[:, 2:4] = [0xFF, 0xE0]                                  # APP0
    buf[:, 4:6] = [0x00, 0x10]                                  # len 16
    buf[:, 6:11] = np.frombuffer(b"JFIF\x00", dtype=np.uint8)
    buf[:, 20:22] = [0xFF, 0xC0]                                # SOF0
    buf[:, 22:24] = [0x00, 0x0B]                                # len 11 (1 component)
    buf[:, 24] = 8                                              # precision
    w = widths.astype(np.int64)
    h = heights.astype(np.int64)
    buf[:, 25] = (h >> 8) & 0xFF
    buf[:, 26] = h & 0xFF
    buf[:, 27] = (w >> 8) & 0xFF
    buf[:, 28] = w & 0xFF
    buf[:, 29] = 1                                              # n components
    buf[:, 30:33] = [1, 0x11, 0]                                # comp spec
    buf[:, 33:35] = [0xFF, 0xD9]                                # EOI
    offsets = np.arange(n + 1, dtype=np.int64) * 35
    return buf.reshape(-1), offsets


@dataclass
class _FakeFeatureMixin:
    """Deterministic byte-derived features standing in for a real decoder."""

    dim: int = 32

    def _fake_embed(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        n = len(offsets) - 1
        out = np.zeros((n, self.dim), dtype=np.float32)
        # fully-vectorized deterministic fake: bucket payload bytes by (pos % dim)
        if len(data):
            pos = np.arange(len(data), dtype=np.int64)
            row = np.searchsorted(offsets, pos, side="right") - 1
            col = (pos - offsets[row]) % self.dim
            np.add.at(out, (row, col), data.astype(np.float32))
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out


class ImageFeatures(_FakeFeatureMixin):
    """Actor-pool stage: image payload → feature vector (+resize metadata).

    ``backend="real"`` would decode pixel data via PIL/opencv — not in this
    container, so it raises; ``backend="fake"`` derives deterministic
    features from the bytes; ``backend="real_headers"`` additionally runs a
    REAL pure-numpy JPEG/PNG header decode (:func:`parse_image_dims`) and
    emits ``img_width``/``img_height``/``img_format`` (``png``/``jpeg``/
    ``unknown``) parsed from the payload — honest real decode of the
    dimension headers, fake float features.  Use with
    ``map_batches(ImageFeatures, concurrency=(1, N), batch_size=32)`` —
    small batches, payloads dominate block size.
    """

    def __init__(self, backend: str = "fake", dim: int = 32, resize: tuple[int, int] = (224, 224)):
        self.backend = backend
        self.dim = dim
        self.resize = resize
        if backend == "real":  # pragma: no cover - libs not in container
            raise NotImplementedError(
                "real pixel decode requires PIL/opencv, which are not installed; "
                "use backend='real_headers' (header-only real decode) or 'fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _payload_matrix(batch["payload"])
        emb = self._fake_embed(data, offsets)
        n = batch.num_rows
        # integer payload checksum (lineage/validation column): exact and
        # decoder-independent, so downstream parity checks don't depend on
        # the float feature path
        csum = np.concatenate([[0], np.cumsum(data, dtype=np.int64)])
        byte_sum = csum[offsets[1:]] - csum[offsets[:-1]]
        out = pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), self.dim),
                "out_width": pa.array([self.resize[0]] * n, pa.int32()),
                "out_height": pa.array([self.resize[1]] * n, pa.int32()),
                "n_bytes": pa.array((offsets[1:] - offsets[:-1]).astype(np.int64)),
                "byte_sum": pa.array(byte_sum.astype(np.int64)),
            }
        )
        if self.backend == "real_headers":
            w, h, fmt = parse_image_dims(data, offsets)
            names = np.array(["unknown", "png", "jpeg"], dtype=object)
            out = (
                out.append_column("img_width", pa.array(w.astype(np.int64)))
                .append_column("img_height", pa.array(h.astype(np.int64)))
                .append_column("img_format", pa.array(list(names[fmt]), pa.string()))
            )
        return out


def parse_wav_headers(
    data: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """REAL canonical-WAV header decode in pure numpy (RIFF spec): validates
    the ``RIFF``/``WAVE``/``fmt ``/``data`` magics at their canonical
    offsets, then reads little-endian fields — returns ``(sample_rate,
    n_channels, bits_per_sample, duration_ms)`` per payload, all −1 for
    anything that is not a canonical 44-byte-header WAV.  ``duration_ms =
    data_size · 1000 // byte_rate`` (integer floor, SQL-replayable).  Fully
    vectorized — canonical WAV has fixed field offsets, no chunk walk."""
    n = len(offsets) - 1
    sr = np.full(n, -1, dtype=np.int64)
    ch = np.full(n, -1, dtype=np.int64)
    bits = np.full(n, -1, dtype=np.int64)
    dur = np.full(n, -1, dtype=np.int64)
    if n == 0 or len(data) == 0:
        return sr, ch, bits, dur
    lens = offsets[1:] - offsets[:-1]
    cand = np.flatnonzero(lens >= 44)
    if not len(cand):
        return sr, ch, bits, dur

    def eq(at: int, magic: bytes) -> np.ndarray:
        m = np.frombuffer(magic, dtype=np.uint8)
        idx = offsets[cand, None] + at + np.arange(len(m))
        return (data[idx] == m[None, :]).all(axis=1)

    ok = eq(0, b"RIFF") & eq(8, b"WAVE") & eq(12, b"fmt ") & eq(36, b"data")
    wav = cand[ok]
    if not len(wav):
        return sr, ch, bits, dur

    def le(at: int, nbytes: int) -> np.ndarray:
        b = data[offsets[wav, None] + at + np.arange(nbytes)].astype(np.int64)
        out = np.zeros(len(wav), dtype=np.int64)
        for j in range(nbytes):
            out |= b[:, j] << (8 * j)
        return out

    ch[wav] = le(22, 2)
    sr[wav] = le(24, 4)
    byte_rate = le(28, 4)
    bits[wav] = le(34, 2)
    data_size = le(40, 4)
    dur[wav] = np.where(byte_rate > 0, data_size * 1000 // np.maximum(byte_rate, 1), -1)
    return sr, ch, bits, dur


def make_wav_payloads(
    sample_rates: np.ndarray, n_channels: np.ndarray, n_frames: np.ndarray, bits: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Canonical 16-bit PCM WAV payloads (44-byte header + zeroed sample
    data), vectorized; rows are variable length so the offsets carry it."""
    n = len(sample_rates)
    block = n_channels.astype(np.int64) * (bits // 8)
    data_size = n_frames.astype(np.int64) * block
    total = 44 + data_size
    offsets = np.concatenate([[0], np.cumsum(total)]).astype(np.int64)
    flat = np.zeros(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]

    def put(at: int, magic: bytes):
        m = np.frombuffer(magic, dtype=np.uint8)
        flat[starts[:, None] + at + np.arange(len(m))] = m[None, :]

    def le(at: int, vals: np.ndarray, nbytes: int):
        v = vals.astype(np.int64)
        for j in range(nbytes):
            flat[starts + at + j] = (v >> (8 * j)) & 0xFF

    put(0, b"RIFF")
    le(4, 36 + data_size, 4)
    put(8, b"WAVE")
    put(12, b"fmt ")
    le(16, np.full(n, 16), 4)            # fmt chunk size
    le(20, np.full(n, 1), 2)             # PCM
    le(22, n_channels, 2)
    le(24, sample_rates, 4)
    le(28, sample_rates.astype(np.int64) * block, 4)  # byte rate
    le(32, block, 2)
    le(34, np.full(n, bits), 2)
    put(36, b"data")
    le(40, data_size, 4)
    return flat, offsets


class AudioFeatures(_FakeFeatureMixin):
    """Actor-pool stage: audio payload → frame-level feature summary.

    ``backend="real"`` (sample decode) raises — soundfile/librosa absent;
    ``backend="real_headers"`` runs the REAL canonical-WAV header decode
    (:func:`parse_wav_headers`) and emits ``sample_rate``/``wav_channels``/
    ``bits_per_sample``/``wav_duration_ms`` parsed from the payload bytes."""

    def __init__(self, backend: str = "fake", dim: int = 32, frame_ms: int = 25):
        self.backend = backend
        self.dim = dim
        self.frame_ms = frame_ms
        if backend == "real":  # pragma: no cover
            raise NotImplementedError(
                "real audio decode requires soundfile/librosa, not installed; "
                "use backend='real_headers' (header-only real decode) or 'fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _payload_matrix(batch["payload"])
        emb = self._fake_embed(data, offsets)
        dur = np.asarray(batch["duration_ms"], dtype=np.int64)
        out = pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), self.dim),
                "n_frames": pa.array(np.maximum(dur // self.frame_ms, 0)),
            }
        )
        if self.backend == "real_headers":
            sr, ch, bits, wdur = parse_wav_headers(data, offsets)
            out = (
                out.append_column("sample_rate", pa.array(sr))
                .append_column("wav_channels", pa.array(ch))
                .append_column("bits_per_sample", pa.array(bits))
                .append_column("wav_duration_ms", pa.array(wdur))
            )
        return out


def parse_mp4_headers(
    data: np.ndarray, offsets: np.ndarray, scan_limit: int = 65536
) -> tuple[np.ndarray, np.ndarray]:
    """REAL MP4/ISO-BMFF header decode in pure numpy/Python: walks the
    top-level box chain (``size(4 BE) type(4)``), descends into ``moov``,
    reads ``mvhd`` — movie timescale + duration (version 0: 32-bit fields
    at +20/+24; version 1: 64-bit at +28/+32, ISO 14496-12 §8.2.2).
    Returns ``(timescale, duration_ms)``, −1 where no valid mvhd is found.
    Like the JPEG marker walk, the per-row loop is bounded by HEADER bytes
    (box sizes skip media data; ``scan_limit`` caps pathological files)."""
    n = len(offsets) - 1
    ts = np.full(n, -1, dtype=np.int64)
    dur = np.full(n, -1, dtype=np.int64)
    if n == 0 or len(data) == 0:
        return ts, dur

    def be(pos: int, nbytes: int) -> int:
        v = 0
        for j in range(nbytes):
            v = (v << 8) | int(data[pos + j])
        return v

    for i in range(n):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        hi = min(hi, lo + scan_limit)
        p = lo
        while p + 8 <= hi:
            size = be(p, 4)
            typ = bytes(data[p + 4 : p + 8])
            if typ == b"moov":
                q = p + 8
                moov_end = min(p + size, hi)
                while q + 8 <= moov_end:
                    csize = be(q, 4)
                    ctyp = bytes(data[q + 4 : q + 8])
                    if ctyp == b"mvhd" and q + 32 <= moov_end:
                        version = int(data[q + 8])
                        if version == 0:
                            t, d = be(q + 20, 4), be(q + 24, 4)
                        elif version == 1 and q + 40 <= moov_end:
                            t, d = be(q + 28, 4), be(q + 32, 8)
                        else:
                            break
                        if t > 0:
                            ts[i] = t
                            dur[i] = d * 1000 // t
                        break
                    if csize < 8:
                        break
                    q += csize
                break
            if size < 8:
                break
            p += size
    return ts, dur


def make_mp4_payloads(timescales: np.ndarray, durations: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimal structurally valid MP4 payloads: ``ftyp`` (16 B) + ``moov``
    containing a spec-sized 108-byte version-0 ``mvhd`` — 132 B per row,
    vectorized.  The builder writes real box sizes, so the parser must
    genuinely WALK boxes (ftyp is skipped by its size field)."""
    n = len(timescales)
    buf = np.zeros((n, 132), dtype=np.uint8)

    def put(at: int, magic: bytes):
        buf[:, at : at + len(magic)] = np.frombuffer(magic, dtype=np.uint8)[None, :]

    def be(at: int, vals, nbytes: int):
        v = np.asarray(vals, dtype=np.int64)
        for j in range(nbytes):
            buf[:, at + j] = (v >> (8 * (nbytes - 1 - j))) & 0xFF

    be(0, np.full(n, 16), 4)
    put(4, b"ftypisom")
    be(12, np.full(n, 512), 4)          # minor version
    be(16, np.full(n, 116), 4)          # moov size = 8 + 108
    put(20, b"moov")
    be(24, np.full(n, 108), 4)          # mvhd size (spec v0 size)
    put(28, b"mvhd")
    # version 0 + flags already zero; ctime/mtime zero
    be(44, timescales, 4)
    be(48, durations, 4)
    offsets = np.arange(n + 1, dtype=np.int64) * 132
    return buf.reshape(-1), offsets


class VideoFrameSampler:
    """Actor-pool flat-map: video payload → one row per sampled frame
    (deterministic timestamps; frame payload is a stubbed byte slice).

    ``backend="real_headers"`` takes the clip duration from a REAL MP4
    ``moov/mvhd`` header decode (:func:`parse_mp4_headers`) instead of the
    ``duration_ms`` metadata column (falling back to it when no valid mvhd
    parses) — the sampling grid then derives from the payload BYTES."""

    def __init__(self, backend: str = "fake", every_ms: int = 1000, max_frames: int = 16):
        self.backend = backend
        self.every_ms = every_ms
        self.max_frames = max_frames
        if backend == "real":  # pragma: no cover
            raise NotImplementedError(
                "real frame extraction requires ffmpeg/opencv, not installed; "
                "use backend='real_headers' (header-derived sampling grid) or 'fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized flat-map: per-row frame counts → repeated row indices →
        # one gather of all frame byte ranges (a real decoder would replace
        # only the byte-slice step; the explode plumbing stays identical).
        data, offsets = _payload_matrix(batch["payload"])
        dur = np.asarray(batch["duration_ms"], dtype=np.int64)
        if self.backend == "real_headers":
            _, parsed = parse_mp4_headers(data, offsets)
            dur = np.where(parsed >= 0, parsed, dur)
        n_frames = np.minimum(np.maximum(dur, 0) // self.every_ms, self.max_frames)
        row = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_frames)
        frame = np.arange(row.size, dtype=np.int64) - np.repeat(
            np.cumsum(n_frames) - n_frames, n_frames
        )
        plen = (offsets[1:] - offsets[:-1]).astype(np.int64)
        step = np.maximum(plen // np.maximum(n_frames, 1), 1)
        # Clamp starts too: when n_frames (duration-derived) exceeds the
        # payload length, frame*step overshoots the row's end and unclamped
        # starts would violate gather_substrings' ends>=starts contract —
        # overshooting frames degrade to empty slices instead.
        starts = np.minimum(offsets[:-1][row] + frame * step[row], offsets[1:][row])
        ends = np.minimum(starts + np.minimum(256, step[row]), offsets[1:][row])
        from ..functions.hashing import gather_substrings

        blobs = gather_substrings(data, starts, ends).cast(pa.large_binary())
        return pa.table(
            {
                "media_id": pc.take(batch["media_id"], pa.array(row)),
                "frame_ts_ms": pa.array((frame * self.every_ms).astype(np.int32)),
                "frame_payload": pc.cast(blobs, pa.binary()),
            }
        )

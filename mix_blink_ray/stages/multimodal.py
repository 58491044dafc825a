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

    ``backend="real"`` would decode via PIL/opencv — not in this container,
    so it raises; ``backend="fake"`` derives deterministic features from the
    bytes.  Use with ``map_batches(ImageFeatures, concurrency=(1, N),
    batch_size=32)`` — small batches, payloads dominate block size.
    """

    def __init__(self, backend: str = "fake", dim: int = 32, resize: tuple[int, int] = (224, 224)):
        self.backend = backend
        self.dim = dim
        self.resize = resize
        if backend == "real":  # pragma: no cover - libs not in container
            raise NotImplementedError(
                "real image decode requires PIL/opencv, which are not installed; "
                "use backend='fake'"
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
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), self.dim),
                "out_width": pa.array([self.resize[0]] * n, pa.int32()),
                "out_height": pa.array([self.resize[1]] * n, pa.int32()),
                "n_bytes": pa.array((offsets[1:] - offsets[:-1]).astype(np.int64)),
                "byte_sum": pa.array(byte_sum.astype(np.int64)),
            }
        )


class AudioFeatures(_FakeFeatureMixin):
    """Actor-pool stage: audio payload → frame-level feature summary."""

    def __init__(self, backend: str = "fake", dim: int = 32, frame_ms: int = 25):
        self.backend = backend
        self.dim = dim
        self.frame_ms = frame_ms
        if backend == "real":  # pragma: no cover
            raise NotImplementedError(
                "real audio decode requires soundfile/librosa, not installed; use backend='fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _payload_matrix(batch["payload"])
        emb = self._fake_embed(data, offsets)
        dur = np.asarray(batch["duration_ms"], dtype=np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), self.dim),
                "n_frames": pa.array(np.maximum(dur // self.frame_ms, 0)),
            }
        )


class VideoFrameSampler:
    """Actor-pool flat-map: video payload → one row per sampled frame
    (deterministic timestamps; frame payload is a stubbed byte slice)."""

    def __init__(self, backend: str = "fake", every_ms: int = 1000, max_frames: int = 16):
        self.backend = backend
        self.every_ms = every_ms
        self.max_frames = max_frames
        if backend == "real":  # pragma: no cover
            raise NotImplementedError(
                "real frame extraction requires ffmpeg/opencv, not installed; use backend='fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized flat-map: per-row frame counts → repeated row indices →
        # one gather of all frame byte ranges (a real decoder would replace
        # only the byte-slice step; the explode plumbing stays identical).
        data, offsets = _payload_matrix(batch["payload"])
        dur = np.asarray(batch["duration_ms"], dtype=np.int64)
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

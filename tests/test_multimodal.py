"""Multimodal plumbing tests: real Ray actor-pool stages over binary columns,
stubbed decoders (deterministic fake backend)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mix_blink_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    AudioFeatures,
    ImageFeatures,
    VideoFrameSampler,
    synth_media_batch,
)


def test_media_schema_roundtrip(tmp_path):
    tbl = synth_media_batch(10, "image")
    assert tbl.schema.equals(MEDIA_SCHEMA)
    import pyarrow.parquet as pq

    pq.write_table(tbl, tmp_path / "m.parquet")
    assert pq.read_table(tmp_path / "m.parquet").equals(tbl)


def test_image_features_actor_pool():
    ds = rd.from_arrow(synth_media_batch(40, "image"))
    out = ds.map_batches(
        ImageFeatures, fn_constructor_kwargs={"backend": "fake", "dim": 16},
        batch_format="pyarrow", concurrency=(1, 2), batch_size=8,
    ).to_pandas()
    assert len(out) == 40
    assert set(out.columns) == {"media_id", "feature", "out_width", "out_height", "n_bytes", "byte_sum"}
    assert all(len(f) == 16 for f in out["feature"])
    assert (out["n_bytes"] == 4096).all()
    # deterministic: rerun identical
    out2 = rd.from_arrow(synth_media_batch(40, "image")).map_batches(
        ImageFeatures, fn_constructor_kwargs={"backend": "fake", "dim": 16},
        batch_format="pyarrow", concurrency=(1, 2), batch_size=8,
    ).to_pandas()
    a = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["feature"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_audio_features():
    ds = rd.from_arrow(synth_media_batch(12, "audio"))
    out = ds.map_batches(
        AudioFeatures, fn_constructor_kwargs={"backend": "fake"},
        batch_format="pyarrow", concurrency=(1, 2), batch_size=4,
    ).to_pandas()
    assert (out["n_frames"] == 30_000 // 25).all()


def test_video_frame_sampler_flatmap():
    ds = rd.from_arrow(synth_media_batch(5, "video"))
    out = ds.map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"backend": "fake", "every_ms": 5000},
        batch_format="pyarrow", concurrency=(1, 2), batch_size=4,
    ).to_pandas()
    assert len(out) == 5 * 6  # 30s / 5s = 6 frames each
    assert set(out.columns) == {"media_id", "frame_ts_ms", "frame_payload"}
    assert out["frame_payload"].map(len).max() <= 256


def test_video_frame_sampler_short_payload():
    """Regression (round-2 ADVICE): duration implies more frames than the
    payload has bytes — overshooting starts must clamp to empty slices, not
    raise ValueError from gather_substrings."""
    tbl = synth_media_batch(3, "video", payload_bytes=8)  # 30s dur, 8-byte payload
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            VideoFrameSampler,
            fn_constructor_kwargs={"backend": "fake", "every_ms": 1000, "max_frames": 16},
            batch_format="pyarrow", concurrency=1, batch_size=4,
        )
        .to_pandas()
    )
    assert len(out) == 3 * 16
    lens = out["frame_payload"].map(len)
    assert lens.min() == 0  # overshooting frames degrade to empty slices
    assert lens.max() <= 8


def test_real_backend_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        ImageFeatures(backend="real")
    with pytest.raises(NotImplementedError):
        AudioFeatures(backend="real")
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(backend="real")


def test_image_features_byte_sum_exact():
    """byte_sum must equal the exact integer sum of payload bytes per row,
    including empty payloads (cumsum-difference path, no reduceat edge)."""
    import numpy as np
    import pyarrow as pa

    from mix_blink_ray.stages.multimodal import ImageFeatures, media_table

    rows = [
        {"media_id": "a", "kind": "image", "payload": b"\x01\x02\x03", "mime": "image/jpeg",
         "width": 1, "height": 1, "duration_ms": -1},
        {"media_id": "b", "kind": "image", "payload": b"", "mime": "image/jpeg",
         "width": 1, "height": 1, "duration_ms": -1},
        {"media_id": "c", "kind": "image", "payload": bytes(range(256)), "mime": "image/jpeg",
         "width": 1, "height": 1, "duration_ms": -1},
    ]
    out = ImageFeatures(backend="fake")(media_table(rows))
    got = dict(zip(out["media_id"].to_pylist(), out["byte_sum"].to_pylist()))
    assert got == {"a": 6, "b": 0, "c": sum(range(256))}
    n = dict(zip(out["media_id"].to_pylist(), out["n_bytes"].to_pylist()))
    assert n == {"a": 3, "b": 0, "c": 256}


def test_parse_image_dims_png_jpeg_roundtrip_and_garbage():
    """Pure-numpy header decode: exact roundtrip through the synthetic
    PNG/JPEG builders (random dims up to 16-bit), and -1/unknown for
    garbage, truncated, and SOF-less payloads."""
    import numpy as np

    from mix_blink_ray.stages.multimodal import (
        make_jpeg_payloads,
        make_png_payloads,
        parse_image_dims,
    )

    rng = np.random.RandomState(11)
    w = rng.randint(1, 65535, size=50).astype(np.int64)
    h = rng.randint(1, 65535, size=50).astype(np.int64)
    for builder, fmt_code in [(make_png_payloads, 1), (make_jpeg_payloads, 2)]:
        flat, off = builder(w, h)
        pw, ph, fmt = parse_image_dims(flat, off)
        assert (pw == w).all() and (ph == h).all() and (fmt == fmt_code).all()

    # garbage / truncated / marker-walk dead ends
    bad = [
        b"not an image at all....................",
        b"\x89PNG\r\n\x1a\nIHDRonly20bytes..",          # too short for IHDR fields
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00..........\xff\xd9",  # JPEG, no SOF
        b"\xff\xd8\xff",                                  # truncated after SOI
        b"",
    ]
    flat = np.frombuffer(b"".join(bad), dtype=np.uint8)
    off = np.cumsum([0] + [len(x) for x in bad]).astype(np.int64)
    pw, ph, fmt = parse_image_dims(flat, off)
    assert (fmt == 0).all() and (pw == -1).all() and (ph == -1).all()


def test_image_features_real_headers_actor_pool(ray_session):
    """real_headers backend through the actual map_batches actor pool:
    parsed dims surface alongside the lineage checksums."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mix_blink_ray.stages.multimodal import ImageFeatures, make_jpeg_payloads, make_png_payloads

    w = np.array([640, 31], dtype=np.int64)
    h = np.array([480, 7], dtype=np.int64)
    pf, po = make_png_payloads(w[:1], h[:1])
    jf, jo = make_jpeg_payloads(w[1:], h[1:])

    def as_bin(flat, off):
        return pa.Array.from_buffers(
            pa.large_binary(), len(off) - 1,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
        )

    tbl = pa.table(
        {
            "media_id": pa.array(["p0", "j1"]),
            "payload": pa.concat_arrays([as_bin(pf, po), as_bin(jf, jo)]),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ImageFeatures,
            fn_constructor_kwargs={"backend": "real_headers", "dim": 8},
            batch_format="pyarrow",
            concurrency=(1, 2),
            batch_size=1,
        )
        .to_pandas()
        .sort_values("media_id")
        .set_index("media_id")
    )
    assert out.loc["p0", "img_format"] == "png" and out.loc["j1", "img_format"] == "jpeg"
    assert out.loc["p0", "img_width"] == 640 and out.loc["p0", "img_height"] == 480
    assert out.loc["j1", "img_width"] == 31 and out.loc["j1", "img_height"] == 7
    assert out.loc["p0", "n_bytes"] == 33 and out.loc["j1", "n_bytes"] == 35


def test_parse_wav_headers_roundtrip_and_garbage():
    import numpy as np

    from mix_blink_ray.stages.multimodal import make_wav_payloads, parse_wav_headers

    rng = np.random.RandomState(3)
    sr = rng.choice([8000, 16000, 44100, 48000], size=30).astype(np.int64)
    ch = rng.choice([1, 2], size=30).astype(np.int64)
    frames = rng.randint(0, 500, size=30).astype(np.int64)
    flat, off = make_wav_payloads(sr, ch, frames)
    psr, pch, pbits, pdur = parse_wav_headers(flat, off)
    assert (psr == sr).all() and (pch == ch).all() and (pbits == 16).all()
    want_dur = frames * ch * 2 * 1000 // (sr * ch * 2)
    assert (pdur == want_dur).all()

    bad = [b"RIFFxxxxWAVEnot fmt chunk..............................", b"tiny", b""]
    flat = np.frombuffer(b"".join(bad), dtype=np.uint8)
    off = np.cumsum([0] + [len(x) for x in bad]).astype(np.int64)
    psr, pch, pbits, pdur = parse_wav_headers(flat, off)
    assert (psr == -1).all() and (pdur == -1).all()


def test_parse_mp4_headers_roundtrip_and_garbage():
    import numpy as np

    from mix_blink_ray.stages.multimodal import make_mp4_payloads, parse_mp4_headers

    rng = np.random.RandomState(9)
    ts = rng.choice([600, 1000, 90000], size=25).astype(np.int64)
    dur = rng.randint(0, 10**6, size=25).astype(np.int64)
    flat, off = make_mp4_payloads(ts, dur)
    pts, pdur = parse_mp4_headers(flat, off)
    assert (pts == ts).all()
    assert (pdur == dur * 1000 // ts).all()

    bad = [b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00no moov here....", b"short", b""]
    flat = np.frombuffer(b"".join(bad), dtype=np.uint8)
    off = np.cumsum([0] + [len(x) for x in bad]).astype(np.int64)
    pts, pdur = parse_mp4_headers(flat, off)
    assert (pts == -1).all() and (pdur == -1).all()

"""Pure-stdlib codecs (functions/codecs.py) + the real-mode multimodal
decode stages they unlock."""

import io
import struct
import wave
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from wprdc_etl_ray.functions.codecs import (
    CodecError,
    decode_png,
    decode_wav,
    encode_png,
    png_dimensions,
)


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(5)
    for shape in ((13, 17), (9, 21, 3), (7, 11, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_png(img)
        out = decode_png(data)
        assert out.shape == img.shape
        assert (out == img).all()
        w, h = png_dimensions(data)
        assert (h, w) == img.shape[:2]


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose row r uses filter type filters[r] —
    forward-filtering computed by an independent reference loop."""
    h, w, ch = img.shape
    assert len(filters) == h
    recon = img.reshape(h, w * ch).astype(np.int64)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc_:
            return a
        return b if pb <= pc_ else c

    raw = bytearray()
    for y in range(h):
        f = filters[y]
        raw.append(f)
        for i in range(stride):
            x = recon[y, i]
            left = recon[y, i - ch] if i >= ch else 0
            up = recon[y - 1, i] if y > 0 else 0
            ul = recon[y - 1, i - ch] if (y > 0 and i >= ch) else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - (left + up) // 2
            else:
                v = x - paeth(left, up, ul)
            raw.append(v % 256)

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_filter_types():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    data = _png_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    out = decode_png(data)
    assert (out == img).all()


def test_png_palette():
    plte = bytes(range(48))  # 16 palette entries
    idx = np.array([[0, 1], [15, 7]], np.uint8)
    raw = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    want = np.frombuffer(plte, np.uint8).reshape(16, 3)[idx]
    assert (out == want).all()


def test_png_rejects_garbage():
    with pytest.raises(CodecError):
        decode_png(b"not a png at all")


def _make_wav(samples: np.ndarray, rate: int, width: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(samples.astype(f"<i{width}" if width > 1 else "u1").tobytes())
    return buf.getvalue()


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.default_rng(2)
    samples = rng.integers(-30000, 30000, (500, 2))
    data = _make_wav(samples, 16000, 2)
    out, rate = decode_wav(data)
    assert rate == 16000
    assert out.shape == (500, 2)
    assert (out == samples).all()


def test_image_decode_real_mode_reads_png_dims(ray_session):
    from wprdc_etl_ray.functions.multimodal import ImageDecodeStub

    rng = np.random.default_rng(4)
    rows = []
    for i, (h, w) in enumerate([(12, 34), (56, 7), (240, 320)]):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append({"doc_id": i, "payload": encode_png(img), "want_w": w, "want_h": h})
    t = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            ImageDecodeStub,
            fn_constructor_kwargs={"mode": "real"},
            batch_format="pyarrow",
            concurrency=1,
            batch_size=8,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["width"].tolist() == [r["want_w"] for r in rows]
    assert out["height"].tolist() == [r["want_h"] for r in rows]


def test_decode_real_content_address_is_encoding_invariant(ray_session):
    """Two different ENCODINGS of the same pixels (filter-0 vs mixed
    filters) must share one content address in real mode — pixel-level
    dedup is the invariant fake mode (encoded-byte md5) cannot give."""
    from wprdc_etl_ray.functions.multimodal import DecodeStub

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    enc_a = encode_png(img)
    enc_b = _png_with_filters(img, [4, 3, 2, 1, 0, 1, 2, 4])
    assert enc_a != enc_b
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([enc_a, enc_b], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            DecodeStub,
            fn_constructor_kwargs={"mode": "real"},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert out["content_md5"].nunique() == 1
    assert (out["n_bytes"] == 8 * 8 * 3).all()


def test_audio_features_real_mode(ray_session):
    from wprdc_etl_ray.functions.multimodal import audio_features

    rng = np.random.default_rng(8)
    s0 = rng.integers(-2000, 2000, (300, 1))
    s1 = np.full((100, 2), 1000, np.int64)  # rms exactly 1000.0
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [_make_wav(s0, 8000, 2), _make_wav(s1, 44100, 2)], pa.binary()
            ),
        }
    )
    out = (
        audio_features(rd.from_arrow(t), mode="real", concurrency=1)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["sample_rate"].tolist() == [8000, 44100]
    assert out["n_samples"].tolist() == [300, 100]
    assert out.loc[1, "rms_milli"] == 1_000_000
    want_rms = int(np.sqrt(np.mean(s0[:, 0].astype(np.float64) ** 2)) * 1000)
    assert out.loc[0, "rms_milli"] == want_rms


def test_png_random_filter_sequences_property():
    """Hypothesis-style randomized matrix (seeded loop — no Ray, fast):
    any per-row filter assignment decodes back to the source pixels."""
    rng = np.random.default_rng(77)
    for trial in range(25):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 12))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        filters = rng.integers(0, 5, h).tolist()
        data = _png_with_filters(img, filters)
        out = decode_png(data)
        assert (out == img).all(), (trial, h, w, filters)


def test_bmp_roundtrip_and_dispatch():
    from wprdc_etl_ray.functions.codecs import (
        decode_bmp,
        decode_image,
        encode_bmp,
        image_dimensions,
    )

    rng = np.random.default_rng(12)
    for w in (5, 8, 13):  # 5/13 exercise the 4-byte row padding
        img = rng.integers(0, 256, (7, w, 3), dtype=np.uint8)
        data = encode_bmp(img)
        assert (decode_bmp(data) == img).all()
        assert image_dimensions(data) == (w, 7)
        assert (decode_image(data) == img).all()
    # dispatcher also routes PNG and rejects junk
    png = encode_png(rng.integers(0, 256, (3, 4, 3), dtype=np.uint8))
    assert decode_image(png).shape == (3, 4, 3)
    with pytest.raises(CodecError):
        decode_image(b"GIF89a...")


def test_mixed_format_dataset_through_real_decode(ray_session):
    """PNG and BMP payloads in ONE dataset decode through the same
    real-mode stage; same pixels in different containers share a
    content address."""
    from wprdc_etl_ray.functions.codecs import encode_bmp
    from wprdc_etl_ray.functions.multimodal import DecodeStub, ImageDecodeStub

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([encode_png(img), encode_bmp(img)], pa.binary()),
        }
    )
    dims = (
        rd.from_arrow(t)
        .map_batches(
            ImageDecodeStub,
            fn_constructor_kwargs={"mode": "real"},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert dims["width"].tolist() == [9, 9] and dims["height"].tolist() == [6, 6]
    feats = (
        rd.from_arrow(t)
        .map_batches(
            DecodeStub,
            fn_constructor_kwargs={"mode": "real"},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert feats["content_md5"].nunique() == 1  # container-invariant dedup


def test_gif_roundtrip_lzw_paths():
    """GIF-LZW: constant image (KwKwK case), binary runs, wide palette
    (code width growth past 8 bits), and a 40k-pixel image that
    overflows the 12-bit dictionary (encoder clear/reset)."""
    from wprdc_etl_ray.functions.codecs import (
        decode_gif,
        decode_image,
        encode_gif,
        image_dimensions,
    )

    rng = np.random.default_rng(3)
    cases = [
        (np.zeros((9, 7), np.uint8), np.array([[10, 20, 30], [0, 0, 0]], np.uint8)),
        (rng.integers(0, 2, (16, 11)).astype(np.uint8),
         np.array([[255, 0, 0], [0, 255, 0]], np.uint8)),
        (rng.integers(0, 200, (23, 31)).astype(np.uint8),
         rng.integers(0, 256, (200, 3), dtype=np.uint8)),
        (rng.integers(0, 250, (80, 90)).astype(np.uint8),
         rng.integers(0, 256, (250, 3), dtype=np.uint8)),
    ]
    for idx, pal in cases:
        data = encode_gif(idx, pal)
        assert (decode_gif(data) == pal[idx]).all()
        assert (decode_image(data) == pal[idx]).all()
        assert image_dimensions(data) == (idx.shape[1], idx.shape[0])


def test_gif_skips_extensions_and_rejects_interlace():
    import struct as _struct

    from wprdc_etl_ray.functions.codecs import CodecError, decode_gif, encode_gif

    idx = np.array([[0, 1], [1, 0]], np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    data = encode_gif(idx, pal)
    # splice a graphic-control extension between header+GCT and the frame
    head_len = 13 + 2 * 3
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = data[:head_len] + gce + data[head_len:]
    assert (decode_gif(spliced) == pal[idx]).all()

    # interlace flag set -> clear error
    pos = head_len
    desc = bytearray(data)
    assert desc[pos] == 0x2C
    desc[pos + 9] |= 0x40
    with pytest.raises(CodecError):
        decode_gif(bytes(desc))


def _box(btype: bytes, payload: bytes) -> bytes:
    import struct as _s

    return _s.pack(">I", 8 + len(payload)) + btype + payload


def _make_mp4(w, h, timescale, duration, frame_counts):
    """Minimal hand-built ISO-BMFF tree: ftyp + moov>trak>(tkhd,
    mdia>(mdhd, minf>stbl>stts))."""
    import struct as _s

    tkhd = b"\x00" + b"\x00" * 3 + b"\x00" * 76 + _s.pack(">II", w << 16, h << 16)
    mdhd = b"\x00" + b"\x00" * 3 + _s.pack(">IIII", 0, 0, timescale, duration) + b"\x00" * 4
    stts = (
        b"\x00" * 4
        + _s.pack(">I", len(frame_counts))
        + b"".join(_s.pack(">II", c, 512) for c in frame_counts)
    )
    stbl = _box(b"stbl", _box(b"stts", stts))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _box(b"mdhd", mdhd) + minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _box(b"moov", trak)


def test_mp4_metadata_parse():
    from wprdc_etl_ray.functions.codecs import parse_mp4_meta

    data = _make_mp4(640, 360, 30_000, 90_000, [50, 25])
    m = parse_mp4_meta(data)
    assert m["width"] == 640 and m["height"] == 360
    assert m["n_frames"] == 75
    assert m["duration_ms"] == 3000  # 90000 / 30000 s
    with pytest.raises(CodecError):
        parse_mp4_meta(b"\x00\x00\x00\x08junk")


def test_video_meta_stub_real_mode(ray_session):
    from wprdc_etl_ray.functions.multimodal import VideoMetaStub

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [_make_mp4(320, 240, 1000, 5000, [120]), _make_mp4(1920, 1080, 600, 600, [2])],
                pa.binary(),
            ),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            VideoMetaStub,
            fn_constructor_kwargs={"mode": "real", "max_frames": 8},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["width"].tolist() == [320, 1920]
    assert out["n_frames"].tolist() == [120, 2]
    assert out["duration_ms"].tolist() == [5000, 1000]
    assert out["sampled_frames"].tolist() == [8, 2]


def test_png_long_filter_runs_vectorized():
    """Round-5 unfilter vectorizes RUNS of None/Up rows (2-D cumsum);
    a long Up run must reconstruct byte-exactly."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 9, 3), dtype=np.uint8)
    filters = [0] * 4 + [2] * 10 + [3] * 3 + [4] * 5 + [2] * 2
    data = _png_with_filters(img, filters)
    out = decode_png(data)
    assert np.array_equal(out, img)


def test_mjpeg_mp4_roundtrip_and_sample_table():
    """REAL video pixels: MJPEG samples wrapped in a from-scratch MP4
    container decode back within the flat-quant JPEG error bound; the
    sample-table walk (stsd/stsz/stsc/stco) maps every sample."""
    from wprdc_etl_ray.functions.codecs import (
        CodecError,
        decode_video_frames,
        encode_mp4_mjpeg,
        extract_mp4_samples,
        parse_mp4_meta,
    )

    rng = np.random.default_rng(3)
    frames = []
    for i in range(5):
        gx = np.linspace(0, 255, 32)[None, :, None]
        gy = np.linspace(0, 255, 24)[:, None, None]
        img = ((gx + gy) / 2 + i * 8 + rng.normal(0, 5, (24, 32, 3))).clip(0, 255)
        frames.append(img.astype(np.uint8))
    mp4 = encode_mp4_mjpeg(frames, fps=10)

    meta = parse_mp4_meta(mp4)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 24, 5)
    assert meta["duration_ms"] == 500

    fourcc, ranges = extract_mp4_samples(mp4)
    assert fourcc == "jpeg" and len(ranges) == 5

    px = decode_video_frames(mp4)
    assert px.shape == (5, 24, 32, 3)
    for i in range(5):
        err = np.abs(px[i].astype(int) - frames[i].astype(int)).mean()
        assert err < 12, (i, err)

    sel = decode_video_frames(mp4, indices=[0, 4])
    assert np.array_equal(sel[0], px[0]) and np.array_equal(sel[1], px[4])

    # an H.264 sample entry must raise naming the codec, not mis-decode
    h264 = mp4.replace(b"jpeg", b"avc1", 1)
    with pytest.raises(CodecError, match="avc1"):
        decode_video_frames(h264)

"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The container has no PIL/ffmpeg, so ``mode='fake'`` (the oracle-checked
default) emits deterministic byte-derived features — but ``mode='real'``
is now WIRED for the formats the engine can decode with pure
stdlib+numpy (functions/codecs.py): PNG/BMP/GIF/baseline-JPEG images,
PCM WAV audio, and MJPEG-in-MP4 video (real sampled-frame pixels via
the ISO-BMFF sample table + the from-scratch JPEG decoder). Real mode
on an
undecodable payload raises ``CodecError`` naming the row, exactly as a
libpng-backed stage would. The Ray-side plumbing is shared: binary
columns stay in ``batch_format="pyarrow"`` end-to-end (pandas
object-dtype round-trips are the documented pitfall for large binary),
batch sizes are small because payload rows are wide, and decode state
lives in actor ``__init__``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def attach_payload(batch: pa.Table, source_col: str = "text") -> pa.Table:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    source text — a deterministic stand-in for image/audio bytes)."""
    payload = batch.column(source_col).cast(pa.binary())
    return batch.append_column("payload", payload)


class DecodeStub:
    """Actor-pool decode stage.

    ``mode='fake'`` emits deterministic pseudo-features (byte length +
    md5 content address of the ENCODED bytes — the content-addressing
    step every multimodal pipeline needs). ``mode='real'`` decodes each
    payload as PNG (functions/codecs.py, stdlib zlib + numpy — no PIL)
    and content-addresses the DECODED pixel buffer: two different
    encodings of the same image share one address, which is the dedup
    invariant real multimodal pipelines need."""

    def __init__(self, mode: str = "fake"):
        self.mode = mode
        if mode not in ("fake", "real"):
            raise ValueError(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            from .codecs import CodecError, decode_image

            payload = batch.column("payload")
            arr = (
                payload.combine_chunks()
                if isinstance(payload, pa.ChunkedArray)
                else payload
            )
            ids = batch.column("doc_id")
            n_bytes, digests = [], []
            # Null payloads emit null feature rows (fake-mode tolerance);
            # a malformed payload raises naming the offending doc_id so a
            # 100-TB run's error points at the row, not just the stage.
            for i, v in enumerate(arr):
                if not v.is_valid:
                    n_bytes.append(None)
                    digests.append(None)
                    continue
                try:
                    px = decode_image(v.as_py())
                except CodecError as e:
                    raise CodecError(
                        f"doc_id={ids[i].as_py()!r}: {e}"
                    ) from e
                buf = px.tobytes()
                n_bytes.append(len(buf))
                digests.append(hashlib.md5(buf).hexdigest())
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_bytes": pa.array(n_bytes, pa.int64()),
                    "content_md5": pa.array(digests, pa.string()),
                }
            )
        payload = batch.column("payload")
        n_bytes = pc.binary_length(payload).cast(pa.int64())
        # content address: md5 per payload (inherently a per-row digest;
        # hashlib releases the GIL). Digests read the Arrow value buffer
        # through zero-copy memoryview slices — no to_pylist() copy of
        # every payload into Python bytes objects.
        arr = payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        if arr.null_count:
            arr = arr.fill_null(b"")
        offs = arr.buffers()[1]
        data = arr.buffers()[2]
        off = memoryview(offs).cast("i" if arr.type == pa.binary() else "q")
        mv = memoryview(data) if data is not None else memoryview(b"")
        base = arr.offset
        digests = pa.array(
            [
                hashlib.md5(mv[off[base + i] : off[base + i + 1]]).hexdigest()
                for i in range(len(arr))
            ],
            pa.string(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": n_bytes,
                "content_md5": digests,
            }
        )


def multimodal_features(
    ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 512
) -> ray.data.Dataset:
    """payload attach (stateless) → decode (actor pool, small batches
    because payload rows are wide)."""
    with_payload = ds.map_batches(attach_payload, batch_format="pyarrow")
    return with_payload.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class ImageDecodeStub:
    """Image-decode stage (actor pool): payload bytes → typed dimension
    metadata. ``mode='fake'`` derives deterministic dimensions from the
    payload (width = 16 + first_byte % 240, height = 16 + n_bytes % 240)
    — a pure function of the bytes, so the driver oracle can reproduce
    it in SQL; ``mode='real'`` reads REAL dimensions from the PNG IHDR
    (codecs.png_dimensions — O(33 bytes) per payload, no inflate).
    Output schema is identical in both modes, so the downstream
    resize/frame-sample stages run unchanged. The payload column stays
    Arrow binary end to end."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            from .codecs import CodecError, image_dimensions

            payload = batch.column("payload")
            arr = (
                payload.combine_chunks()
                if isinstance(payload, pa.ChunkedArray)
                else payload
            )
            ids = batch.column("doc_id")
            dims: list[tuple[int | None, int | None]] = []
            for i, v in enumerate(arr):
                if not v.is_valid:
                    dims.append((None, None))
                    continue
                try:
                    dims.append(image_dimensions(v.as_py()))
                except CodecError as e:
                    raise CodecError(
                        f"doc_id={ids[i].as_py()!r}: {e}"
                    ) from e
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "payload": arr,
                    "width": pa.array([w for w, _ in dims], pa.int64()),
                    "height": pa.array([h for _, h in dims], pa.int64()),
                }
            )
        import numpy as np

        payload = batch.column("payload")
        arr = payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        if arr.null_count:
            arr = arr.fill_null(b"")
        n = pc.binary_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
        # first byte per payload, vectorized from the value buffer
        offs = np.frombuffer(
            arr.buffers()[1], dtype=np.int32 if arr.type == pa.binary() else np.int64
        )
        data = arr.buffers()[2]
        buf = (
            np.frombuffer(data, dtype=np.uint8) if data is not None else np.zeros(0, np.uint8)
        )
        base = arr.offset
        starts = offs[base : base + len(arr)]
        first = np.where(n > 0, buf[np.minimum(starts, max(len(buf) - 1, 0))], 0)
        width = 16 + (first.astype(np.int64) % 240)
        height = 16 + (n % 240)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": arr,
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
            }
        )


def resize_meta(batch: pa.Table, max_side: int = 64) -> pa.Table:
    """Resize planning (stateless, vectorized): target dims preserving
    aspect ratio with the long side clamped to ``max_side`` — exact
    integer math (floor), so the oracle matches. A real resize would
    map the payload through the codec here; the metadata contract is
    what downstream stages consume."""
    import numpy as np

    w = batch.column("width").to_numpy(zero_copy_only=False)
    h = batch.column("height").to_numpy(zero_copy_only=False)
    long_side = np.maximum(w, h)
    scale_needed = long_side > max_side
    out_w = np.where(scale_needed, np.maximum(1, (w * max_side) // long_side), w)
    out_h = np.where(scale_needed, np.maximum(1, (h * max_side) // long_side), h)
    t = batch.drop_columns([c for c in ("payload",) if c in batch.schema.names])
    t = t.append_column("out_width", pa.array(out_w.astype("int64"), pa.int64()))
    return t.append_column("out_height", pa.array(out_h.astype("int64"), pa.int64()))


def frame_sample_plan(batch: pa.Table, every: int = 16, max_frames: int = 4) -> pa.Table:
    """Frame-sampling plan for video-like payloads: n_frames =
    1 + n_bytes // ``every`` (fake frame index), sampled =
    min(``max_frames``, n_frames) — the uniform-stride sampling layout a
    real ffmpeg stage would fill with actual frames."""
    n = pc.binary_length(batch.column("payload")).cast(pa.int64())
    import numpy as np

    nb = n.to_numpy(zero_copy_only=False)
    n_frames = 1 + nb // every
    sampled = np.minimum(max_frames, n_frames)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_frames": pa.array(n_frames, pa.int64()),
            "sampled_frames": pa.array(sampled, pa.int64()),
        }
    )


def multimodal_pipeline(
    ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 512, max_side: int = 64
) -> ray.data.Dataset:
    """The full multimodal chain: attach payload → image decode (actor
    pool) → resize plan → frame-sample plan, joined on doc_id inside
    one streaming pipeline (payload stays Arrow binary until dropped)."""
    with_payload = ds.map_batches(attach_payload, batch_format="pyarrow")
    decoded = with_payload.map_batches(
        ImageDecodeStub,
        fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )

    def combine(batch: pa.Table) -> pa.Table:
        frames = frame_sample_plan(batch)
        resized = resize_meta(batch, max_side=max_side)
        out = resized.append_column("n_frames", frames.column("n_frames"))
        return out.append_column("sampled_frames", frames.column("sampled_frames"))

    return decoded.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)


class VideoMetaStub:
    """Video-metadata stage (actor pool): payload bytes → typed
    dimensions + REAL frame count/duration. ``mode='real'`` parses the
    ISO-BMFF box tree (codecs.parse_mp4_meta — tkhd/mdhd/stts, no video
    codec needed), making the frame-sample plan exact; pixel-level
    frame extraction is real for MJPEG tracks (VideoFrameSampler /
    codecs.decode_video_frames) while H.264/H.265 stay an honest
    plug-point. ``mode='fake'`` derives the same columns from the
    bytes."""

    def __init__(self, mode: str = "fake", every: int = 16, max_frames: int = 4):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.every = every
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        payload = batch.column("payload")
        arr = (
            payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        )
        if arr.null_count:
            arr = arr.fill_null(b"")
        ws, hs, nf, dur = [], [], [], []
        for v in arr:
            data = v.as_py()
            if self.mode == "real":
                from .codecs import parse_mp4_meta

                m = parse_mp4_meta(data)
                ws.append(m["width"])
                hs.append(m["height"])
                nf.append(m["n_frames"])
                dur.append(m["duration_ms"])
            else:
                first = data[0] if data else 0
                ws.append(16 + first % 240)
                hs.append(16 + len(data) % 240)
                nf.append(1 + len(data) // self.every)
                dur.append((1 + len(data) // self.every) * 40)
        sampled = np.minimum(self.max_frames, np.asarray(nf, np.int64))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_frames": pa.array(nf, pa.int64()),
                "duration_ms": pa.array(dur, pa.int64()),
                "sampled_frames": pa.array(sampled, pa.int64()),
            }
        )


class VideoFrameSampler:
    """Frame-SAMPLING stage with real pixels (actor pool): payload →
    one row per sampled frame (doc_id, frame_idx, width, height,
    frame_md5 content address of the DECODED pixel buffer).

    ``mode='real'`` extracts the sampled samples' bytes via the full
    ISO-BMFF sample table (stsd/stsz/stsc/stco) and decodes MJPEG
    frames through the from-scratch JPEG decoder
    (codecs.decode_video_frames) — only the SAMPLED frames' byte
    ranges are touched, the classic stride-sample access pattern.
    H.264/H.265 tracks raise a CodecError naming the codec and doc_id
    (native-decoder plug-point). ``mode='fake'`` derives the same
    schema deterministically from the bytes so pipelines are testable
    without fixtures. Sampling: ``max_frames`` frames evenly strided
    across the track."""

    def __init__(self, mode: str = "fake", max_frames: int = 4):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.max_frames = max_frames

    def _indices(self, n_frames: int) -> list[int]:
        # integer stride math ((i·n)//k) — exact, and reproducible in a
        # SQL oracle without float-rounding hazards
        k = min(self.max_frames, n_frames)
        if k == 0:
            return []
        return sorted({(i * n_frames) // k for i in range(k)})

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id")
        payload = batch.column("payload")
        arr = (
            payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        )
        out_id, out_fi, out_w, out_h, out_md5 = [], [], [], [], []
        for i, v in enumerate(arr):
            if not v.is_valid:
                continue  # null payloads contribute no frames
            data = v.as_py()
            doc = ids[i].as_py()
            if self.mode == "real":
                from .codecs import CodecError, decode_video_frames, parse_mp4_meta

                try:
                    meta = parse_mp4_meta(data)
                    idx = self._indices(meta["n_frames"])
                    if not idx:  # frameless track: contributes no rows,
                        continue  # like a null payload
                    px = decode_video_frames(data, indices=idx)
                except CodecError as e:
                    raise CodecError(f"doc_id={doc!r}: {e}") from e
                for j, fi in enumerate(idx):
                    out_id.append(doc)
                    out_fi.append(fi)
                    out_w.append(px.shape[2])
                    out_h.append(px.shape[1])
                    out_md5.append(hashlib.md5(px[j].tobytes()).hexdigest())
            else:
                first = data[0] if data else 0
                n_frames = 1 + len(data) // 16
                for fi in self._indices(n_frames):
                    out_id.append(doc)
                    out_fi.append(fi)
                    out_w.append(16 + first % 240)
                    out_h.append(16 + len(data) % 240)
                    out_md5.append(
                        hashlib.md5(data + str(fi).encode()).hexdigest()
                    )
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_fi, pa.int64()),
                "width": pa.array(out_w, pa.int64()),
                "height": pa.array(out_h, pa.int64()),
                "frame_md5": pa.array(out_md5, pa.string()),
            }
        )


class AudioDecodeStub:
    """Audio-decode stage (actor pool): payload bytes → (sample_rate,
    n_samples, rms_milli). ``mode='real'`` decodes PCM WAV via the
    stdlib ``wave`` parser (codecs.decode_wav) and computes integer-
    milli RMS over the first channel; ``mode='fake'`` derives the same
    three columns deterministically from the bytes (rate = 8000 +
    (first_byte % 5)·2000, n_samples = n_bytes // 2, rms from a byte
    checksum) so pipelines are testable without audio fixtures."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        payload = batch.column("payload")
        arr = (
            payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        )
        if arr.null_count:
            arr = arr.fill_null(b"")
        rates, counts, rms = [], [], []
        for v in arr:
            data = v.as_py()
            if self.mode == "real":
                from .codecs import decode_wav

                samples, rate = decode_wav(data)
                x = samples[:, 0].astype(np.float64)
                r = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                rates.append(rate)
                counts.append(samples.shape[0])
                rms.append(int(r * 1000))
            else:
                first = data[0] if data else 0
                rates.append(8000 + (first % 5) * 2000)
                counts.append(len(data) // 2)
                rms.append(sum(data[:64]) % 32768)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sample_rate": pa.array(rates, pa.int64()),
                "n_samples": pa.array(counts, pa.int64()),
                "rms_milli": pa.array(rms, pa.int64()),
            }
        )


def audio_features(
    ds: ray.data.Dataset, mode: str = "fake", concurrency: int = 4, batch_size: int = 256
) -> ray.data.Dataset:
    """payload → audio metadata via the actor-pool decode stage (small
    batches — audio payloads are wide rows)."""
    return ds.map_batches(
        AudioDecodeStub,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )

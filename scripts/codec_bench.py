"""Codec throughput benchmark (round-4 verdict item 6).

Measures decode MB/s (of DECODED pixel/sample bytes) per from-scratch
codec so the real-mode multimodal stage has a stated per-core capacity
in BASELINE.md. PNG is measured per filter regime — the encoder's
filter choice dominates decode cost (None/Up/Sub rows are fully
vectorized; Average/Paeth are left-sequential byte scans).

Usage: python scripts/codec_bench.py [SIDE]   (default 256 → 256×256 RGB)
Prints one JSON line: {"codec": MB/s, ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wprdc_etl_ray.functions import codecs, codecs_jpeg  # noqa: E402


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Forward-filter every row with one filter type (reference loop,
    mirrors tests/test_codecs.py) and wrap as a PNG."""
    import struct

    h, w, c = img.shape
    bpp = c
    arr = img.astype(np.int64)
    flat = arr.reshape(h, w * c)
    out = bytearray()

    def paeth(a, b, c_):
        p = a + b - c_
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c_)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c_

    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        line = flat[y]
        out.append(ftype)
        if ftype == 0:
            row = line % 256
        elif ftype == 1:
            row = line.copy()
            row[bpp:] = (line[bpp:] - line[:-bpp]) % 256
        elif ftype == 2:
            row = (line - prev) % 256
        else:
            row = np.zeros(w * c, np.int64)
            for i in range(w * c):
                left = int(line[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                pred = (left + up) // 2 if ftype == 3 else paeth(left, up, ul)
                row[i] = (int(line[i]) - pred) % 256
        out.extend(row.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def bench(fn, payload: bytes, out_bytes: int, reps: int = 5) -> float:
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        fn(payload)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        if dt > 1.0 and r >= 1:  # slow codec: 2 reps are enough signal
            break
    return round(out_bytes / best / 1e6, 2)  # MB of DECODED output/sec


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(5)
    # smooth gradient + noise: compressible like a real photo, not flat
    gx = np.linspace(0, 255, side)[None, :, None]
    gy = np.linspace(0, 255, side)[:, None, None]
    img = ((gx + gy) / 2 + rng.normal(0, 12, (side, side, 3))).clip(0, 255).astype(np.uint8)
    px = img.size

    res: dict[str, float] = {}
    for ftype, name in ((0, "png_none"), (1, "png_sub"), (2, "png_up"),
                        (3, "png_average"), (4, "png_paeth")):
        data = _png_with_filter(img, ftype)
        out = codecs.decode_png(data)
        assert np.array_equal(out, img), name
        res[name] = bench(codecs.decode_png, data, px)

    bmp = codecs.encode_bmp(img)
    res["bmp"] = bench(codecs.decode_bmp, bmp, px)

    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, (side, side)).astype(np.uint8)
    gif = codecs.encode_gif(idx, pal)
    res["gif"] = bench(codecs.decode_gif, gif, px)

    jpg = codecs_jpeg.encode_jpeg(img)
    res["jpeg"] = bench(codecs_jpeg.decode_jpeg, jpg, px)

    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(rng.integers(-2000, 2000, 16000 * 10, dtype=np.int16).tobytes())
    wav = buf.getvalue()
    res["wav"] = bench(codecs.decode_wav, wav, 16000 * 10 * 2)

    print(json.dumps({"unit": "MB_decoded_per_sec_per_core", "side": side, **res}))


if __name__ == "__main__":
    main()

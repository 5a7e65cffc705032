"""Baseline JPEG codec (functions/codecs_jpeg.py): component-level
independent checks + bounded round-trips + dispatcher wiring."""

import numpy as np
import pytest

from wprdc_etl_ray.functions.codecs import CodecError, decode_image, image_dimensions
from wprdc_etl_ray.functions.codecs_jpeg import (
    ZIGZAG,
    build_decode_table,
    decode_jpeg,
    encode_jpeg,
    fdct_blocks,
    idct_blocks,
    jpeg_dimensions,
    _AC_COUNTS,
    _AC_SYMS,
    _DC_COUNTS,
    _DC_SYMS,
)

# hand-typed ITU-T T.81 Figure A.6 zigzag, independent of the module's
_ZZ_REF = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_spec_table():
    assert ZIGZAG.tolist() == _ZZ_REF
    assert sorted(_ZZ_REF) == list(range(64))  # a permutation


def test_idct_matches_direct_summation():
    """Matrix IDCT == the O(64^2) DCT-III definition, coded separately."""
    rng = np.random.default_rng(7)
    X = rng.normal(0, 50, (3, 8, 8))

    def c(k):
        return np.sqrt(0.125) if k == 0 else 0.5

    direct = np.zeros_like(X)
    for b in range(3):
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (
                            c(u) * c(v) * X[b, u, v]
                            * np.cos((2 * y + 1) * u * np.pi / 16)
                            * np.cos((2 * x + 1) * v * np.pi / 16)
                        )
                direct[b, y, x] = s
    assert np.allclose(idct_blocks(X), direct, atol=1e-9)
    # and FDCT inverts it
    assert np.allclose(fdct_blocks(idct_blocks(X)), X, atol=1e-9)


def test_huffman_tables_canonical_and_prefix_free():
    for counts, syms in ((_DC_COUNTS, _DC_SYMS), (_AC_COUNTS, _AC_SYMS)):
        table = build_decode_table(counts, syms)
        assert len(table) == len(syms)
        codes = sorted((ln, code) for (ln, code) in table)
        # prefix-free: no code is a prefix of another
        as_bits = [format(code, f"0{ln}b") for ln, code in codes]
        for i, a in enumerate(as_bits):
            for b in as_bits[i + 1 :]:
                assert not b.startswith(a) and not a.startswith(b)
        # the all-ones code of the used length must be unused (spec)
        ln = codes[-1][0]
        assert codes[-1][1] != (1 << ln) - 1


def test_jpeg_roundtrip_bounded_error():
    """Flat quant table q ⇒ |Δcoefficient| ≤ q/2 ⇒ tight pixel bound on
    smooth content; exercised gray, RGB 4:4:4 and 4:2:0, odd sizes."""
    x = np.linspace(0, 4 * np.pi, 41)  # odd width: edge padding path
    y = np.linspace(0, 3 * np.pi, 31)
    img = ((np.sin(y)[:, None] * np.cos(x)[None, :] * 0.5 + 0.5) * 255).astype(np.uint8)

    out = decode_jpeg(encode_jpeg(img, q=2))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    rgb = np.stack([img, img[::-1], np.full_like(img, 90)], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, q=2))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 6

    out = decode_jpeg(encode_jpeg(rgb, q=2, subsample=True))
    assert out.shape == rgb.shape  # 4:2:0: chroma averaged, luma still tight
    lum = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    lum2 = 0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
    assert np.abs(lum - lum2).max() <= 10


def test_jpeg_noise_roundtrip_reasonable():
    """Random noise is the worst case — still bounded by q and the
    basis norms (loose sanity bound)."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, q=2))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16


def test_jpeg_dispatch_and_dims_and_errors():
    img = np.full((10, 18), 128, np.uint8)
    data = encode_jpeg(img, q=2)
    assert jpeg_dimensions(data) == (18, 10)
    assert image_dimensions(data) == (18, 10)
    assert decode_image(data).shape == (10, 18)
    with pytest.raises(CodecError):
        decode_jpeg(b"\xff\xd8\xff\xc2" + b"\x00\x06" + b"\x08\x00\x08\x00\x08")
    with pytest.raises(CodecError):
        decode_jpeg(b"not a jpeg")

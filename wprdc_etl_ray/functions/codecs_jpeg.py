"""Baseline JPEG (JFIF) codec — pure stdlib + numpy, no libjpeg.

Decoder: baseline sequential DCT, 8-bit, arbitrary sampling factors
(4:4:4 and 4:2:0 tested), DQT/DHT/SOF0/SOS/DRI markers, byte
unstuffing, restart-marker DC resets, batch matrix IDCT (all 8×8
blocks through two matmuls), nearest-neighbor chroma upsampling,
BT.601 YCbCr→RGB. Progressive (SOF2) and arithmetic coding raise
CodecError.

Encoder (the test/reference side): 4:4:4 or 4:2:0, grayscale or RGB.
It emits CUSTOM canonical Huffman tables (every DC category a 4-bit
code, every AC run/size symbol an 8-bit code — valid JPEG: tables ride
in DHT, and the all-ones code stays unused) so no hand-typed Annex-K
constants can be silently wrong, and a caller-chosen FLAT quantization
value so round-trip error is analytically bounded (|Δcoef| ≤ q/2 ⇒
bounded pixel error — the tests assert it).

Component-level independent checks live in tests/test_codecs_jpeg.py:
the zigzag table against a hand-typed copy, the matrix IDCT against
the direct O(64²) DCT-III summation, Huffman canonical codes against a
prefix-free scan."""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

# --- shared tables -----------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)

# DCT-II basis: C[k, n] = s(k) * cos((2n+1) k pi / 16); IDCT = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16)


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(N, 8, 8) dequantized coefficients → (N, 8, 8) samples (batch
    two-matmul IDCT; +128 level shift and clamping are the caller's)."""
    return np.einsum("kv,nkl,lw->nvw", _C, coefs, _C)


def fdct_blocks(samples: np.ndarray) -> np.ndarray:
    return np.einsum("kv,nvw,lw->nkl", _C, samples, _C)


# --- canonical Huffman -------------------------------------------------------


def build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """DHT counts/symbols → {(length, code): symbol} (canonical order)."""
    table = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


# Encoder-side fixed-length canonical tables (legal custom DHT):
_DC_SYMS = list(range(12))  # categories 0..11, all 4-bit codes
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB, ZRL, run/size — 162 symbols, all 8-bit codes


def _fixed_table(symbols: list[int], length: int):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    enc = {sym: (length, i) for i, sym in enumerate(symbols)}
    return counts, enc


_DC_COUNTS, _DC_ENC = _fixed_table(_DC_SYMS, 4)
_AC_COUNTS, _AC_ENC = _fixed_table(_AC_SYMS, 8)


# --- bit IO ------------------------------------------------------------------


class _BitReader:
    """Entropy-segment reader: FF00 unstuffing, RSTn detection."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt in (0xD9,):
                    # marker: pad with zero bits; caller consumes marker
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    self.pos += 2  # tolerate other stuffing
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8
        # drop already-consumed history bits: without this mask the
        # Python int grows by 8 bits per input byte FOREVER and every
        # shift/or becomes O(stream-size) — the r4 decoder's 20 s/image
        # was this quadratic blow-up, not the Huffman loop itself
        self.bitbuf &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.bitbuf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def align_to_marker(self):
        """Drop buffered bits and consume an RSTn marker at self.pos."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _huff_lut(table: dict) -> tuple[list, list]:
    """16-bit-peek lookup table: every (length, code) entry fills its
    2^(16-length) slots with (symbol, length); length 0 marks invalid.
    One peek + one list index decodes any symbol — the textbook JPEG
    fast path, replacing the bit-by-bit prefix walk."""
    sym_a = np.zeros(1 << 16, np.int32)
    ln_a = np.zeros(1 << 16, np.uint8)
    for (length, code), s in table.items():
        shift = 16 - length
        start = code << shift
        sym_a[start : start + (1 << shift)] = s  # vectorized slice fill
        ln_a[start : start + (1 << shift)] = length
    # plain lists: per-symbol list indexing in the entropy loop beats
    # numpy scalar indexing by ~3×
    return sym_a.tolist(), ln_a.tolist()


def _huff_decode(reader: _BitReader, lut: tuple[list, list]) -> int:
    sym, ln = lut
    v = reader.peek16()
    length = ln[v]
    if length == 0:
        raise CodecError("invalid Huffman code")
    reader.skip(length)
    return sym[v]


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder -----------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W) gray or (H, W, 3) RGB uint8."""
    if data[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG (no SOI)")
    try:
        return _decode_jpeg_body(data)
    except (struct.error, IndexError) as e:
        raise CodecError(f"malformed JPEG: {e}") from e


def _decode_jpeg_body(data: bytes) -> np.ndarray:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps = None
    H = W = 0
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise CodecError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec != 0:
                    raise CodecError("16-bit quant tables not supported")
                qt[tid] = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = build_decode_table(counts, symbols)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _, H, W, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise CodecError(f"non-baseline JPEG (SOF 0x{marker:02x}) not supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            pos += seglen
            return _decode_scan(data, pos, comps, sel, qt, huff, H, W, restart)
        pos += seglen
    raise CodecError("no SOS marker found")


def _decode_scan(data, pos, comps, sel, qt, huff, H, W, restart) -> np.ndarray:
    if comps is None or H == 0:
        raise CodecError("SOS before SOF")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    reader = _BitReader(data, pos)
    # one 16-bit-peek LUT per distinct Huffman table in this scan
    luts = {key: _huff_lut(tab) for key, tab in huff.items()}
    # collect quantized coefficient blocks per component (plain Python
    # lists in the entropy loop — per-element numpy writes cost ~100 ns
    # each; the batch np.array conversion below is one vectorized pass)
    blocks: dict[int, list] = {i: [] for i in range(len(comps))}
    pred = [0] * len(comps)
    mcu_count = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align_to_marker()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = luts[(0, sel[c["id"]][0])]
                ac_tab = luts[(1, sel[c["id"]][1])]
                for _ in range(c["h"] * c["v"]):
                    coef = [0] * 64
                    t = _huff_decode(reader, dc_tab)
                    diff = _extend(reader.read_bits(t), t)
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise CodecError("AC run past block end")
                        coef[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    blocks[ci].append(coef)
            mcu_count += 1
    # dequantize + un-zigzag + batch IDCT per component, assemble planes
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        arr = (
            np.array(blocks[ci], np.int64)
            if blocks[ci]
            else np.zeros((0, 64), np.int64)
        )
        dez = np.zeros_like(arr)
        dez[:, ZIGZAG] = arr * q  # zigzag index i lives at raster ZIGZAG[i]
        pix = idct_blocks(dez.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        bw = mcux * c["h"]  # blocks per row for this component
        ph, pw = mcuy * c["v"] * 8, bw * 8
        plane = np.zeros((ph, pw), np.uint8)
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = pix[i]
                        i += 1
        # upsample to full resolution (nearest) and crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:H, :W])
    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from SOF0/2 without entropy decode."""
    if data[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise CodecError("bad marker stream")
        marker = data[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            _, h, w = struct.unpack(">BHH", data[pos + 4 : pos + 9])
            return int(w), int(h)
        if marker == 0xD9 or marker == 0xDA:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + seglen
    raise CodecError("no SOF marker found")


# --- encoder (reference/test side) -------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int) -> int:
    dc = int(coef[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = _DC_ENC[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    zero_run = 0
    while k < 64:
        v = int(coef[k])
        if v == 0:
            zero_run += 1
        else:
            while zero_run >= 16:
                ln, code = _AC_ENC[0xF0]
                bw.write(code, ln)
                zero_run -= 16
            s = _category(v)
            ln, code = _AC_ENC[(zero_run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            zero_run = 0
        k += 1
    if zero_run:
        ln, code = _AC_ENC[0x00]
        bw.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate), FDCT, quantize, zigzag."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = fdct_blocks(blocks)
    # quantize in RASTER order with the raster-expanded table, then take
    # zigzag order for entropy coding
    qraster = np.zeros(64, np.int64)
    qraster[ZIGZAG] = q
    qz = np.round(coefs.reshape(-1, 64) / qraster)
    return qz[:, ZIGZAG].astype(np.int64), ph // 8, pw // 8


def encode_jpeg(img: np.ndarray, q: int = 4, subsample: bool = False) -> bytes:
    """uint8 (H, W) gray / (H, W, 3) RGB → baseline JPEG with a FLAT
    quantization table of value ``q`` and fixed-length custom Huffman
    tables. ``subsample=True`` emits 4:2:0 chroma."""
    img = np.ascontiguousarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qtab = np.full(64, q, np.int64)  # zigzag order

    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(qtab.astype(np.uint8))
    # DHT: DC class0 id0, AC class1 id0
    out += (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(_DC_SYMS), 0x00)
        + bytes(_DC_COUNTS)
        + bytes(_DC_SYMS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(_AC_SYMS), 0x10)
        + bytes(_AC_COUNTS)
        + bytes(_AC_SYMS)
    )
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, (sh, sv) in zip(planes, samps):
        # pad plane so its block grid covers the MCU grid
        need_h, need_w = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        zz, bh, bw_ = _plane_blocks(p, qtab)
        comp_blocks.append((zz, bw_, sh, sv))

    writer = _BitWriter()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (zz, bw_, sh, sv) in enumerate(comp_blocks):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bw_ + (mx * sh + bx)
                        pred[ci] = _encode_block(writer, zz[bi], pred[ci])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)

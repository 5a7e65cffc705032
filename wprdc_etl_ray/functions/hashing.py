"""Shared deterministic, engine-agnostic hash kernels for the text
operators (simhash, fingerprint, quality, minhash).

Design rule: every hash used by an oracle-checked operator must be
computable BOTH as a vectorized numpy kernel (this module) and in ANSI
SQL on DuckDB (the driver's oracle side). Two primitives satisfy that:

- **md5 word hash** — uint64 = big-endian first 8 bytes of
  ``md5(utf8(word))``. SQL: ``('0x' || substr(md5(w), 1, 16))::UBIGINT``.
  numpy side hashes each UNIQUE token once (``np.unique`` first —
  vocabulary is Zipf-small relative to the token stream; NOT
  ``pd.factorize``, which NUL-truncates keys) and scatters through the
  codes; there is no per-row/per-doc Python loop.
- **Horner polynomial hash mod 2^64** with base B=1099511628211 —
  ``acc = (acc*B + x) mod 2^64``. SQL: ``list_reduce`` over HUGEINTs.
  numpy side evaluates ALL segments (documents / sliding windows) of a
  flat value array at once via the modular prefix trick:
  ``H(s, L) = B^(s+L-1) * (G[s+L] - G[s])`` where
  ``G = cumsum(v * Binv^position)`` — uint64 wraparound IS the mod, and
  B is odd so ``Binv = B^-1 mod 2^64`` exists.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

HORNER_B = 1099511628211  # FNV-1a 64 prime (odd -> invertible mod 2^64)
_B = np.uint64(HORNER_B)
_BINV = np.uint64(pow(HORNER_B, -1, 1 << 64))


def split_flat(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-split every doc; return (flat word array, per-doc counts).

    Same semantics as ``str.split()`` / DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')`` with empty → 0 words."""
    if len(texts) == 0:  # empty batch: dtype may not be string-like
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    words_per_doc = texts.fillna("").str.split()
    lens = words_per_doc.map(len).to_numpy(dtype=np.int64)
    flat = np.concatenate(
        [np.asarray(w, dtype=object) for w in words_per_doc if w]
        or [np.array([], dtype=object)]
    )
    return flat, lens


def codepoints_flat(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Unicode code points of every doc concatenated (one utf-32 encode
    of the joined batch — no per-doc loop) + per-doc char counts."""
    s = texts.fillna("")
    lens = s.str.len().to_numpy(dtype=np.int64)
    joined = "".join(s.tolist())
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    return cp, lens


def md5_word_hashes(words: np.ndarray) -> np.ndarray:
    """uint64 md5-prefix hash per token (see module docstring). md5 runs
    once per UNIQUE token; the per-token path is a numpy gather.

    Deduplication uses ``np.unique`` (true Python string comparison) —
    NOT ``pd.factorize``, whose C string hashtable NUL-truncates keys
    and would collide tokens differing only past an embedded NUL
    (caught by the hypothesis property test)."""
    if len(words) == 0:
        return np.array([], dtype=np.uint64)
    vocab, codes = np.unique(words, return_inverse=True)
    vh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(w).encode("utf-8")).digest()[:8], "big")
            for w in vocab
        ),
        dtype=np.uint64,
        count=len(vocab),
    )
    return vh[codes]


def _starts(lens: np.ndarray) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)


def segment_sums(x: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-segment sums of a flat array (segments given by lens;
    zero-length segments sum to 0 — the np.add.reduceat empty-segment
    pitfall handled by reducing over non-empty segments only)."""
    out = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return out
    out[nz] = np.add.reduceat(x.astype(np.int64), _starts(lens)[nz])
    return out


def _prefix_tables(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bpow, Gz): B^i table and zero-led modular prefix sums of v*Binv^i."""
    T = len(v)
    one = np.array([1], dtype=np.uint64)
    if T <= 1:
        bpow = one[:T] if T else one[:0]
        ipow = bpow
    else:
        bpow = np.concatenate([one, np.cumprod(np.full(T - 1, _B, np.uint64))])
        ipow = np.concatenate([one, np.cumprod(np.full(T - 1, _BINV, np.uint64))])
    Gz = np.concatenate([np.zeros(1, np.uint64), np.cumsum(v * ipow)])
    return bpow, Gz


def horner_per_segment(v: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Horner hash mod 2^64 of each segment of the flat array ``v``
    (segment i = the next ``lens[i]`` values). Empty segments → 0.
    Equivalent to ``list_reduce(seg, (a,x) -> (a*B + x) % 2^64)``."""
    out = np.zeros(len(lens), dtype=np.uint64)
    if len(v) == 0:
        return out
    bpow, Gz = _prefix_tables(v)
    starts = _starts(lens)
    nz = lens > 0
    s, L = starts[nz], lens[nz]
    out[nz] = bpow[s + L - 1] * (Gz[s + L] - Gz[s])
    return out


def window_horner(v: np.ndarray, lens: np.ndarray, window: int) -> tuple[np.ndarray, np.ndarray]:
    """ALL sliding-window Horner hashes per segment (window length
    ``min(window, seg_len)``, so short segments yield ONE whole-segment
    hash; empty segments yield zero windows). Returns (flat window-hash
    array, windows-per-segment counts). Fully vectorized: one prefix
    table + one gather."""
    D = len(lens)
    if len(v) == 0:
        return np.array([], dtype=np.uint64), np.zeros(D, dtype=np.int64)
    bpow, Gz = _prefix_tables(v)
    starts = _starts(lens)
    nz = lens > 0
    w = np.minimum(lens, window)
    m = np.where(nz, lens - w + 1, 0).astype(np.int64)  # windows per segment
    total = int(m.sum())
    if total == 0:
        return np.array([], dtype=np.uint64), m
    # flat window-start index: for segment i, starts[i] .. starts[i]+m[i]-1
    seg_of = np.repeat(np.arange(D), m)
    first = np.concatenate([[0], np.cumsum(m)[:-1]])
    win_start = starts[seg_of] + (np.arange(total) - first[seg_of])
    win_w = w[seg_of]
    ends = win_start + win_w - 1
    H = bpow[ends] * (Gz[ends + 1] - Gz[win_start])
    return H, m


def min_window_horner(v: np.ndarray, lens: np.ndarray, window: int = 8) -> np.ndarray:
    """Per segment: the MIN (unsigned) Horner hash over all sliding
    windows of length ``min(window, seg_len)`` — a winnowing-style
    sketch. Zero-length segments → 0. One ``np.minimum.reduceat`` over
    ``window_horner``'s flat hash array."""
    out = np.zeros(len(lens), dtype=np.uint64)
    H, m = window_horner(v, lens, window)
    if len(H) == 0:
        return out
    first = np.concatenate([[0], np.cumsum(m)[:-1]])
    out[m > 0] = np.minimum.reduceat(H, first[m > 0])
    return out


def to_signed(u: np.ndarray) -> np.ndarray:
    """uint64 -> int64 two's-complement view (the SQL side does
    ``CASE WHEN v >= 2^63 THEN v - 2^64 END::BIGINT``)."""
    return u.astype(np.uint64).view(np.int64)


# --- Bloom filter (vectorized, shared by dedup's scale path) -----------------

def _mix64(u: np.ndarray) -> np.ndarray:
    """murmur3/splitmix 64-bit finalizer — diffuses ALL input bits into
    the low bits (a plain multiply-mask probe would only see the key's
    low log2(m) bits, collapsing the k probes to one)."""
    u = (u ^ (u >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    u = (u ^ (u >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return u ^ (u >> np.uint64(33))


class BloomFilter:
    """Fixed-size Bloom filter over 64-bit hashes, fully vectorized
    (Kirsch–Mitzenmacher double hashing: probe_i = h1 + i·h2 mod m with
    h1, h2 independent mixes of the key; m a power of two).
    Picklable/broadcastable: state is one uint8 bit array + two ints —
    O(m/8) bytes regardless of how many keys went in. FP rate at the
    default 16 bits/key with k=8 probes is ~1e-3."""

    def __init__(self, n_keys: int, bits_per_key: int = 16, k: int = 8):
        m = 1 << max(10, int(np.ceil(np.log2(max(1, n_keys) * bits_per_key))))
        self.m_mask = np.uint64(m - 1)
        self.k = k
        self.bits = np.zeros(m >> 3, dtype=np.uint8)

    def _probes(self, h: np.ndarray, i: int) -> np.ndarray:
        u = h.astype(np.uint64)
        h1 = _mix64(u)
        h2 = _mix64(u ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        return (h1 + np.uint64(i) * h2) & self.m_mask

    def add(self, h: np.ndarray) -> None:
        for i in range(self.k):
            p = self._probes(h, i)
            np.bitwise_or.at(self.bits, p >> np.uint64(3),
                             np.left_shift(np.uint8(1), (p & np.uint64(7)).astype(np.uint8)))

    def contains(self, h: np.ndarray) -> np.ndarray:
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            p = self._probes(h, i)
            bit = np.left_shift(np.uint8(1), (p & np.uint64(7)).astype(np.uint8))
            out &= (self.bits[p >> np.uint64(3)] & bit) != 0
            if not out.any():
                break
        return out

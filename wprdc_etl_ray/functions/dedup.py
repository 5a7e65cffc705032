"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification,
embedding-cosine near-dup.

Scale shapes (the part that matters at 100 TB):
- exact: hash-partition on a content hash, keep-first per group — only
  the 8-byte hash + id shuffles when ``payload=False`` (default; the
  text payload re-shuffles for REPEATED hashes only);
- MinHash/LSH: shingle → minhash signature per batch (vectorized),
  explode to (band, band_hash) rows, bucket the bands, emit candidate
  pairs per bucket — classic banded LSH where the shuffle carries band
  keys, not documents; ``minhash_near_dups`` verifies candidates with a
  distributed exact-Jaccard stage;
- SimHash: 64-bit signature per doc; ``simhash_near_dups`` buckets by
  8-bit bands — pigeonhole-EXACT for Hamming ≤ bands-1 — and verifies
  the true distance in-bucket (xor + popcount LUT);
- verification: n-gram Jaccard on candidate PAIRS only (never all
  pairs), co-located by one pair_id shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.partition import hash_strings
from .relational import bucketed_group_map

# Per-WORKER-PROCESS instance memo for cheap-state stages (hash tables,
# marker dicts, rng coefficient arrays). Ray reuses worker processes
# across map_batches stages within a session, so a memoized plain
# function gets the "setup once per worker" property WITHOUT paying an
# actor-pool process spawn per operator invocation (measured 2-3 s per
# query at small scale). Stages with genuinely heavy state (models,
# codecs) should still be callable CLASSES passed with concurrency=N —
# the actor pool pins state to dedicated processes and bounds its
# memory; both paths exist below.
_STAGE_MEMO: dict = {}


def _memoized(cls, **kwargs):
    def fn(batch):
        key = (cls.__name__, tuple(sorted(kwargs.items())))
        inst = _STAGE_MEMO.get(key)
        if inst is None:
            inst = _STAGE_MEMO.setdefault(key, cls(**kwargs))
        return inst(batch)

    return fn

# --- exact dedup -------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    payload: bool = False,
    repeated_filter: str = "exact",
    bloom_bits_per_key: int = 16,
) -> ray.data.Dataset:
    """One representative (min id) per distinct text. Exact, not
    probabilistic — hash collisions are resolved on the actual text.

    ``payload=False`` (default, the scale path) is TWO-PHASE: phase 1
    shuffles ONLY (id, 8-byte content hash) and resolves every hash with
    a single row directly; phase 2 re-scans and shuffles the text
    payload ONLY for rows whose hash repeats (true duplicates + rare
    collisions), grouping by the actual text inside the bucket. The wide
    text column never rides the exchange for unique documents — at a
    low-duplication corpus the shuffle shrinks from O(corpus bytes) to
    O(16 bytes · rows + dup bytes).

    ``repeated_filter`` picks how phase 2 recognizes repeated hashes:

    - ``"exact"`` — the repeated-hash set is a sorted int64 array,
      broadcast once (``ray.put``); driver + per-worker memory is
      O(8 B · repeated hashes).
    - ``"bloom"`` — a fixed-size Bloom filter (hashing.BloomFilter,
      O(2 B · repeated hashes) total, built streaming from the phase-1
      output without ever materializing the hash set on the driver).
      A false positive only routes that row through phase 2, where the
      group-by-actual-text resolves it alone — the RESULT is identical
      to exact mode by construction (both the singles filter and the
      phase-2 filter consult the same Bloom instance, so no row is
      emitted twice or dropped). This is the at-scale mode.

    ``payload=True`` is the one-pass variant (single scan, wide
    shuffle) — better when the input is already narrow or duplication
    is extreme."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(text_col)).astype(np.int64)
        return batch.select([id_col, text_col]).append_column("_h", pa.array(h))

    def add_hash_narrow(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(text_col)).astype(np.int64)
        return batch.select([id_col]).append_column("_h", pa.array(h))

    def keep_first(bucket: pd.DataFrame) -> pd.DataFrame:
        rep = bucket.groupby(text_col, sort=False)[id_col].min().reset_index()
        return rep[[id_col]]

    if payload:
        hashed = ds.map_batches(add_hash, batch_format="pyarrow")
        # one task per hash bucket (not per distinct text) — vectorized
        return bucketed_group_map(hashed, ["_h"], keep_first, num_buckets=64)

    # ---- phase 1: narrow shuffle of (id, hash) only ----
    narrow = ds.map_batches(add_hash_narrow, batch_format="pyarrow")

    def per_hash(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("_h", sort=False)[id_col].agg(["count", "min"]).reset_index()
        return g.rename(columns={"count": "_n", "min": id_col})

    stats = bucketed_group_map(narrow, ["_h"], per_hash, num_buckets=64)

    def multi_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(_pc.greater(batch.column("_n"), 1)).select(["_h"])

    multi_ds = stats.map_batches(multi_only, batch_format="pyarrow")

    if repeated_filter == "bloom":
        from .hashing import BloomFilter

        # stats executes once; repeated hashes stay in the object store
        # and stream into a FIXED-SIZE bit array — the driver never
        # holds the hash set itself
        stats = stats.materialize()
        multi_ds = stats.map_batches(multi_only, batch_format="pyarrow").materialize()
        n_rep = multi_ds.count()
        bf = BloomFilter(max(1, n_rep), bits_per_key=bloom_bits_per_key)
        if n_rep:
            for batch in multi_ds.iter_batches(batch_format="pyarrow"):
                bf.add(batch.column("_h").to_numpy(zero_copy_only=False))
        mref = ray.put(bf)
        have_repeats = n_rep > 0

        def is_repeated(h: np.ndarray) -> np.ndarray:
            return ray.get(mref).contains(h)

    else:
        # repeated hashes (true dups + collisions): small side, broadcast
        multi = multi_ds.to_pandas()
        have_repeats = not multi.empty
        harr = multi["_h"].to_numpy() if have_repeats else np.array([], dtype=np.int64)
        mref = ray.put(np.sort(harr))

        def is_repeated(h: np.ndarray) -> np.ndarray:
            return np.isin(h, ray.get(mref))

    # singles = count-1 hashes NOT flagged repeated: under bloom, a
    # false-positive single is excluded here and re-resolved (alone) by
    # phase 2 — the same filter instance decides both sides, so the
    # output set is identical to exact mode
    def singles_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        one = batch.filter(_pc.equal(batch.column("_n"), 1))
        h = one.column("_h").to_numpy(zero_copy_only=False)
        return one.filter(pa.array(~is_repeated(h))).select([id_col])

    singles = stats.map_batches(singles_only, batch_format="pyarrow")
    if not have_repeats:
        return singles

    # ---- phase 2: payload shuffle for flagged rows only ----
    def colliding(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(text_col)).astype(np.int64)
        mask = is_repeated(h)
        return (
            batch.select([id_col, text_col])
            .append_column("_h", pa.array(h))
            .filter(pa.array(mask))
        )

    dups = ds.map_batches(colliding, batch_format="pyarrow")
    resolved = bucketed_group_map(dups, ["_h"], keep_first, num_buckets=16)
    return singles.union(resolved)


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Per-batch MinHash signatures over word 3-shingles (actor-pool stage).

    ``__init__`` draws the permutation coefficients once per actor from a
    FIXED seed (signatures must agree across actors). ``__call__`` is
    fully batch-vectorized — NO per-document Python loop:

    1. split all texts, hash the flat word array once (SipHash),
    2. shingle hash = rolling polynomial combine of k adjacent word
       hashes over the flat array (invalid cross-doc positions sliced
       out per doc via boundary arithmetic),
    3. the (a*x + b) permutation family is one (num_perm × n_shingles)
       outer product in uint64 (wraparound ≡ mod 2^64 — a valid hash
       family; min is dominated by high bits),
    4. per-doc min via ``np.minimum.reduceat`` at doc boundaries.
    """

    _C1 = np.uint64(0x9E3779B97F4A7C15)
    _C2 = np.uint64(0xC2B2AE3D27D4EB4F)
    _C3 = np.uint64(0x165667B19E3779F9)

    def __init__(self, num_perm: int = 64, shingle_len: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        if shingle_len != 3:
            raise ValueError("vectorized path implements k=3 shingles")
        self.k = shingle_len

    def _shingles_flat(self, texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        """All docs' shingle hashes concatenated + per-doc counts."""
        if len(texts) == 0:  # empty batch: dtype may not be string-like
            return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
        words_per_doc = texts.fillna("").str.split()
        lens = words_per_doc.map(len).to_numpy(dtype=np.int64)
        flat = np.concatenate(
            [np.asarray(w, dtype=object) for w in words_per_doc if w]
            or [np.array([], dtype=object)]
        )
        wh = (
            pd.util.hash_array(flat).astype(np.uint64)
            if len(flat)
            else np.array([], dtype=np.uint64)
        )
        k = self.k
        # rolling combine over the flat array; positions crossing doc
        # boundaries are excluded by the per-doc index ranges below
        if len(wh) >= k:
            sh_global = wh[: -(k - 1)] * self._C1 + wh[1:-1] * self._C2 + wh[2:] * self._C3
        else:
            sh_global = np.array([], dtype=np.uint64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        m = np.where(lens >= k, lens - k + 1, 1)  # ≥1 shingle per doc
        # gather indices: for doc i, positions starts[i] .. starts[i]+m[i]-1
        idx = np.repeat(starts, m) + (
            np.arange(int(m.sum())) - np.repeat(np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        )
        small = np.repeat(lens < k, m)  # fallback shingle for short docs
        sh = np.empty(int(m.sum()), dtype=np.uint64)
        ok = ~small
        if ok.any():
            sh[ok] = sh_global[idx[ok]]
        if small.any():
            # short doc: single shingle = wraparound sum of its word
            # hashes. Reduceat over NON-EMPTY doc starts only (the
            # segment_sums pattern): clipping empty-doc starts into the
            # array would shift segment boundaries and truncate the sum
            # of a doc followed by a trailing empty doc, making the
            # signature depend on batch composition.
            fb_per_doc = np.zeros(len(lens), dtype=np.uint64)
            nonempty = lens > 0
            if len(wh) and nonempty.any():
                fb_per_doc[nonempty] = np.add.reduceat(wh, starts[nonempty])
            doc_of = np.repeat(np.arange(len(lens)), m)
            sh[small] = fb_per_doc[doc_of[small]]
        return sh, m

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "sig": pd.Series([], dtype=object)}
            )
        sh, m = self._shingles_flat(batch["text"])
        # one outer product for the whole batch, then per-doc min
        v = self.a[:, None] * sh[None, :] + self.b[:, None]  # (P, S) mod 2^64
        bounds = np.concatenate([[0], np.cumsum(m)[:-1]])
        sigs = np.minimum.reduceat(v, bounds, axis=1)  # (P, n_docs)
        sigs = sigs.T.astype(np.int64)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "sig": list(sigs)}
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_len: int = 3,
    concurrency: int | None = None,
    distinct: bool = True,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs via banded LSH.

    signature → split into ``bands`` bands of ``num_perm // bands``
    rows → hash each band → ``groupby (band_id, band_hash)`` → all
    bucket-mates are candidates. Returns (doc_a, doc_b) with
    doc_a < doc_b, distinct."""
    rows = num_perm // bands

    if concurrency:
        sigs = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={"num_perm": num_perm, "shingle_len": shingle_len},
            batch_format="pandas",
            concurrency=concurrency,
            batch_size=2048,
        )
    else:  # cheap state: task pool + per-worker memo (see _memoized)
        sigs = ds.map_batches(
            _memoized(MinHasher, num_perm=num_perm, shingle_len=shingle_len),
            batch_format="pandas",
            batch_size=2048,
        )

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sig = np.stack(batch["sig"].to_numpy())  # (n, num_perm)
        n = len(batch)
        out_doc = np.repeat(batch["doc_id"].to_numpy(), bands)
        band_id = np.tile(np.arange(bands), n)
        bh = np.empty(n * bands, dtype=np.int64)
        for b in range(bands):
            seg = sig[:, b * rows : (b + 1) * rows]
            bh[b::bands] = pd.util.hash_pandas_object(
                pd.DataFrame(seg), index=False
            ).to_numpy().astype(np.int64)
        return pd.DataFrame({"doc_id": out_doc, "band_id": band_id, "band_hash": bh})

    banded = sigs.map_batches(explode_bands, batch_format="pandas")

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # collision buckets (>=2 docs per (band_id, band_hash)) are rare
        # by construction; the loop below runs only over those
        sizes = bucket.groupby(["band_id", "band_hash"], sort=False)["doc_id"].nunique()
        hot = sizes[sizes >= 2]
        if hot.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        sub = bucket.set_index(["band_id", "band_hash"]).loc[hot.index]
        out_a, out_b = [], []
        for _, grp in sub.groupby(level=[0, 1], sort=False):
            ids = np.unique(grp["doc_id"].to_numpy())
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a).astype("int64"),
                "doc_b": np.concatenate(out_b).astype("int64"),
            }
        ).drop_duplicates(ignore_index=True)

    cand = bucketed_group_map(
        banded, ["band_id", "band_hash"], pairs_in_bucket, num_buckets=64
    )
    if not distinct:
        # caller dedups (e.g. minhash_near_dups drops duplicates on the
        # already-driver-resident pair list) — skip one exchange
        return cand

    # global distinct pairs (a pair can match in several bands/buckets)
    def distinct_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(ignore_index=True)

    return bucketed_group_map(cand, ["doc_a", "doc_b"], distinct_pairs, num_buckets=16)


# --- SimHash -----------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per document (actor-pool stage), fully batch-
    vectorized — NO per-document Python loop — and SQL-oracle-checkable:

    - token hash = md5-prefix uint64 (hashing.md5_word_hashes; DuckDB
      ``('0x'||substr(md5(w),1,16))::UBIGINT``),
    - bit j of the signature = 1 iff
      ``sum over tokens of (+1 if (h>>j)&1 else -1) > 0``
      (duplicate tokens vote once per occurrence),
    - empty docs → 0; output is the int64 two's-complement view.

    The per-bit votes for ALL docs are one ``(tokens, 64)`` bit matrix
    plus one ``np.add.reduceat`` at doc boundaries."""

    def __init__(self):
        self.shifts = np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .hashing import md5_word_hashes, split_flat, to_signed

        flat, lens = split_flat(batch["text"])
        wh = md5_word_hashes(flat)
        out = np.zeros(len(batch), dtype=np.uint64)
        nz = lens > 0
        if nz.any():
            bits = ((wh[:, None] >> self.shifts) & np.uint64(1)).astype(np.int32)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
            counts = np.add.reduceat(bits, starts[nz], axis=0)  # (docs, 64)
            votes = 2 * counts.astype(np.int64) - lens[nz, None]
            out[nz] = ((votes > 0).astype(np.uint64) << self.shifts).sum(axis=1)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "simhash": to_signed(out)}
        )


def simhash_signatures(
    ds: ray.data.Dataset, concurrency: int | None = None
) -> ray.data.Dataset:
    if concurrency:
        return ds.map_batches(
            SimHasher, batch_format="pandas", concurrency=concurrency, batch_size=2048
        )
    return ds.map_batches(
        _memoized(SimHasher), batch_format="pandas", batch_size=2048
    )


_POPCOUNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def simhash_near_dups(
    ds: ray.data.Dataset,
    max_hamming: int = 7,
    bands: int = 8,
    concurrency: int | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Near-duplicate pairs by SimHash Hamming distance — EXACT, not
    probabilistic, via pigeonhole banding: the 64-bit signature splits
    into ``bands`` equal bit-bands; any pair within Hamming distance
    ``bands - 1`` must agree EXACTLY on at least one band, so grouping
    by (band_id, band_value) and verifying the true Hamming distance
    inside the bucket has guaranteed recall 1.0 for
    ``max_hamming <= bands - 1`` (enforced).

    Scale shape: the shuffle carries (doc_id, sig, band key) — never
    text; within-bucket verification is a vectorized xor + byte-LUT
    popcount. Caveat: a band value shared by many documents (e.g. the
    all-zero signature of empty docs) makes an O(m²) bucket — pre-filter
    degenerate documents upstream if the corpus has them in bulk.
    Output: (doc_a < doc_b, hamming)."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"exact recall requires max_hamming <= bands-1 ({bands - 1}); "
            f"got {max_hamming} — raise bands or lower the threshold"
        )
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    sigs = simhash_signatures(ds, concurrency=concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sig = batch["simhash"].to_numpy().astype(np.uint64)
        n = len(batch)
        out_doc = np.repeat(batch["doc_id"].to_numpy(), bands)
        out_sig = np.repeat(sig, bands)
        band_id = np.tile(np.arange(bands, dtype=np.int64), n)
        band_val = (out_sig >> (band_id * width).astype(np.uint64)) & np.uint64(
            (1 << width) - 1
        )
        return pd.DataFrame(
            {
                "doc_id": out_doc,
                "sig": out_sig.view(np.int64),
                "band_id": band_id,
                "band_val": band_val.view(np.int64),
            }
        )

    banded = sigs.map_batches(explode, batch_format="pandas")

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b, outs_h = [], [], []
        for _, grp in bucket.groupby(["band_id", "band_val"], sort=False):
            if len(grp) < 2:
                continue
            g = grp.drop_duplicates("doc_id")
            ids = g["doc_id"].to_numpy()
            sg = g["sig"].to_numpy().astype(np.uint64)
            ia, ib = np.triu_indices(len(ids), k=1)
            x = sg[ia] ^ sg[ib]
            hd = _POPCOUNT[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
            keep = hd <= max_hamming
            outs_a.append(np.minimum(ids[ia], ids[ib])[keep])
            outs_b.append(np.maximum(ids[ia], ids[ib])[keep])
            outs_h.append(hd[keep])
        if not outs_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(outs_a).astype("int64"),
                "doc_b": np.concatenate(outs_b).astype("int64"),
                "hamming": np.concatenate(outs_h).astype("int64"),
            }
        )

    cand = bucketed_group_map(
        banded, ["band_id", "band_val"], pairs_in_bucket, num_buckets=num_buckets
    )

    # a pair can verify in several bands: global distinct
    def distinct_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(ignore_index=True)

    return bucketed_group_map(cand, ["doc_a", "doc_b"], distinct_pairs, num_buckets=16)


# --- n-gram Jaccard verification --------------------------------------------


def ngram_jaccard_verify(
    candidates: pd.DataFrame,
    docs: pd.DataFrame,
    n: int = 3,
    threshold: float = 0.8,
) -> pd.DataFrame:
    """Verify candidate pairs with exact word-n-gram Jaccard. Runs on the
    (small) candidate set; ``docs`` is the broadcastable id→text map."""
    texts = dict(zip(docs["doc_id"], docs["text"]))

    def grams(t: str) -> set:
        w = (t or "").split()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    cache: dict[int, set] = {}

    def g(doc):
        if doc not in cache:
            cache[doc] = grams(texts.get(doc, ""))
        return cache[doc]

    rows = []
    for a, b in zip(candidates["doc_a"], candidates["doc_b"]):
        ga, gb = g(a), g(b)
        inter = len(ga & gb)
        union = len(ga | gb) or 1
        j = inter / union
        if j >= threshold:
            rows.append((a, b, round(j, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64"}
    )


def _gram_set(text: str, n: int) -> set:
    w = (text or "").split()
    if len(w) < n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


_EMPTY_PAIRS = {
    "doc_a": pa.array([], pa.int64()),
    "doc_b": pa.array([], pa.int64()),
    "jaccard": pa.array([], pa.int64()),
}


def verify_jaccard_pairs(
    docs: ray.data.Dataset,
    pairs: "ray.data.Dataset | pd.DataFrame",
    n: int = 3,
    threshold_micro: int = 800_000,
    num_buckets: int = 16,
    pairs_broadcast_cap: int = 1_000_000,
) -> ray.data.Dataset:
    """Distributed exact word-n-gram Jaccard verification of candidate
    pairs — the pair list stays a DATASET (no unbounded driver-resident
    pair structure):

    1. one NARROW exchange on (doc_a, doc_b) dedups candidate pairs
       (a pair can match in several LSH bands) and explodes each to two
       (pair, side, doc_id) rows — 4×int64 per row, never text;
    2. a partitioned hash join on doc_id attaches each side's text —
       the corpus streams through the join, partitioned by doc_id;
    3. one exchange on the pair key co-locates each pair's two texts;
       the exact set intersection runs per bucket over NUMPY arrays
       (single merge, no per-pair DataFrame indexing) with a per-doc
       gram cache.

    Auto small-side path (the cdc exchange='auto' pattern): when the
    candidate set is at most ``pairs_broadcast_cap`` rows (16 B each —
    the cap bounds driver memory at ~16 MB), steps 1–2 collapse to a
    single ``ray.put`` broadcast + per-batch merge, skipping the join's
    actor-pool spawn, which dominates at small scale. Results are
    identical; only the data movement differs.

    Jaccard is exported in exact integer micro-units:
    ``(inter*2e6 + union) // (2*union)`` — round-half-up without
    touching floats, so the DuckDB oracle matches bit-for-bit."""
    from .relational import bucketed_group_map, hash_join

    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            return ray.data.from_arrow(pa.table(_EMPTY_PAIRS))
        pairs = ray.data.from_pandas(
            pairs[["doc_a", "doc_b"]].astype({"doc_a": "int64", "doc_b": "int64"})
        )
    else:
        # candidate generation runs once; blocks stay in the object
        # store (small: pair rows only), NOT on the driver
        pairs = pairs.materialize()
        if pairs.count() == 0:
            return ray.data.from_arrow(pa.table(_EMPTY_PAIRS))

    # ---- (1) distinct pairs -> (pair, side) long rows, all-narrow ----
    def distinct_explode(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_a", "doc_b"]].drop_duplicates(ignore_index=True)
        return pd.concat(
            [
                b.assign(doc_id=b["doc_a"].to_numpy(), side=0),
                b.assign(doc_id=b["doc_b"].to_numpy(), side=1),
            ],
            ignore_index=True,
        )

    if pairs.count() <= pairs_broadcast_cap:
        # ---- small side: broadcast the deduped long rows once ----
        long_df = pairs.to_pandas()[["doc_a", "doc_b"]].drop_duplicates(
            ignore_index=True
        )
        long_df = pd.concat(
            [
                long_df.assign(doc_id=long_df["doc_a"].to_numpy(), side=0),
                long_df.assign(doc_id=long_df["doc_b"].to_numpy(), side=1),
            ],
            ignore_index=True,
        )
        lref = ray.put(long_df)

        def attach(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[["doc_id", "text"]].merge(ray.get(lref), on="doc_id")

        joined = docs.map_batches(attach, batch_format="pandas")
    else:
        # exchange="direct", not auto: the sort path's map_groups emits
        # zero-SCHEMA empty blocks, which crash acero inside the join
        # below; the direct exchange's finalize never emits empty blocks
        long = bucketed_group_map(
            pairs,
            ["doc_a", "doc_b"],
            distinct_explode,
            num_buckets=num_buckets,
            exchange="direct",
        )

        # ---- (2) attach texts: corpus partitioned by doc_id ----
        joined = hash_join(
            long,
            docs.select_columns(["doc_id", "text"]),
            on="doc_id",
            num_partitions=num_buckets,
        )

    # ---- (3) co-locate pair sides, verify over numpy arrays ----
    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        a = b.loc[b["side"] == 0, ["doc_a", "doc_b", "text"]].rename(
            columns={"text": "text_a"}
        )
        bb = b.loc[b["side"] == 1, ["doc_a", "doc_b", "text"]].rename(
            columns={"text": "text_b"}
        )
        m = a.merge(bb, on=["doc_a", "doc_b"])
        if m.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "jaccard": pd.Series([], dtype="int64"),
                }
            )
        da = m["doc_a"].to_numpy()
        db = m["doc_b"].to_numpy()
        ta = m["text_a"].to_numpy(dtype=object)
        tb = m["text_b"].to_numpy(dtype=object)
        cache: dict[int, set] = {}

        def g(doc_id: int, text) -> set:
            s = cache.get(doc_id)
            if s is None:
                s = cache.setdefault(doc_id, _gram_set(text, n))
            return s

        # the per-pair set intersection is the inherent work; the loop
        # indexes flat numpy arrays only (no DataFrame .loc)
        out_a, out_b, out_j = [], [], []
        for i in range(len(m)):
            ga, gb = g(int(da[i]), ta[i]), g(int(db[i]), tb[i])
            inter = len(ga & gb)
            uni = len(ga | gb) or 1
            j = (inter * 2_000_000 + uni) // (2 * uni)
            if j >= threshold_micro:
                out_a.append(da[i])
                out_b.append(db[i])
                out_j.append(j)
        return pd.DataFrame(
            {
                "doc_a": np.asarray(out_a, dtype="int64"),
                "doc_b": np.asarray(out_b, dtype="int64"),
                "jaccard": np.asarray(out_j, dtype="int64"),
            }
        )

    return bucketed_group_map(
        joined, ["doc_a", "doc_b"], per_bucket, num_buckets=num_buckets
    )


def minhash_near_dups(
    docs: ray.data.Dataset,
    threshold_micro: int = 800_000,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    concurrency: int | None = None,
    pairs_broadcast_cap: int = 1_000_000,
) -> ray.data.Dataset:
    """Near-duplicate pairs = LSH candidates VERIFIED by exact word-
    n-gram Jaccard ≥ threshold — the full two-stage dedup pipeline.

    The verified output is deterministic and (unlike raw band
    candidates) SQL-expressible, so it carries the DuckDB oracle for the
    whole MinHash path. Caveat stated plainly: LSH recall is
    probabilistic — with 16 bands × 4 rows, a true pair at Jaccard 0.8
    is missed with p≈2e-4 (≈3e-8 at 0.9); the oracle compares exactly
    because the test corpus' true pairs all sit ≥0.9."""
    cand = minhash_lsh_candidates(
        docs, num_perm=num_perm, bands=bands, concurrency=concurrency, distinct=False
    )
    # cand stays a Dataset: verify dedups it and (above the bounded
    # broadcast cap) joins texts in with no driver-resident pair list
    return verify_jaccard_pairs(
        docs,
        cand,
        n=n,
        threshold_micro=threshold_micro,
        pairs_broadcast_cap=pairs_broadcast_cap,
    )


# --- exact n-gram Jaccard similarity join (prefix filtering) -----------------


def _distinct_shingle_rows(
    batch: pd.DataFrame, n: int, t_micro: int, prefix_only: bool
) -> pd.DataFrame:
    """Per-doc DISTINCT word-n-gram hashes as (shingle, doc_id, set_size)
    rows — fully batch-vectorized (flat word array → rolling shingle
    combine → one lexsort for per-doc distinct + per-doc hash order).

    ``prefix_only=True`` keeps only each doc's PREFIX under the global
    hash order: p = s - ceil(t·s) + 1 of its s distinct shingles — the
    prefix-filtering principle (public similarity-join literature:
    SSJoin / All-Pairs / PPJoin): any two sets with Jaccard ≥ t share at
    least one token in their p-prefixes under ANY fixed total order on
    the token universe. Short docs (< n words) take one whole-doc
    shingle; empty docs hash the empty gram — both mirror
    ``_gram_set``'s semantics so the verify stage agrees."""
    if len(batch) == 0:
        return pd.DataFrame(
            {
                "shingle": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "set_size": pd.Series([], dtype="int64"),
            }
        )
    hasher = _STAGE_MEMO.get(("MinHasher-shingle", n))
    if hasher is None:
        hasher = _STAGE_MEMO.setdefault(
            ("MinHasher-shingle", n), MinHasher(shingle_len=n)
        )
    sh, m = hasher._shingles_flat(batch["text"])
    D = len(batch)
    doc_of = np.repeat(np.arange(D), m)
    order = np.lexsort((sh, doc_of))
    d2, s2 = doc_of[order], sh[order]
    uniq = np.empty(len(d2), dtype=bool)
    uniq[:1] = True
    np.logical_or(d2[1:] != d2[:-1], s2[1:] != s2[:-1], out=uniq[1:])
    dd, ss = d2[uniq], s2[uniq]
    sizes = np.bincount(dd, minlength=D)  # distinct-shingle count per doc
    if prefix_only:
        first = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        rank = np.arange(len(dd)) - first[dd]  # 0-based hash-order rank
        alpha = (t_micro * sizes + 999_999) // 1_000_000  # ceil(t·s)
        p = sizes - alpha + 1
        keep = rank < p[dd]
        dd, ss = dd[keep], ss[keep]
    ids = batch["doc_id"].to_numpy()
    return pd.DataFrame(
        {
            "shingle": ss.view(np.int64),
            "doc_id": ids[dd].astype("int64"),
            "set_size": sizes[dd].astype("int64"),
        }
    )


def _pairs_per_shingle(bucket: pd.DataFrame) -> pd.DataFrame:
    """All (doc_a < doc_b) pairs sharing a blocking shingle. Runs once
    per bucket; the loop is over multi-doc shingle GROUPS only."""
    sizes = bucket.groupby("shingle", sort=False)["doc_id"].nunique()
    hot = sizes[sizes >= 2]
    if hot.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        )
    sub = bucket.set_index("shingle").loc[hot.index]
    out_a, out_b = [], []
    for _, grp in sub.groupby(level=0, sort=False):
        ids = np.unique(grp["doc_id"].to_numpy())
        a, b = np.triu_indices(len(ids), k=1)
        out_a.append(ids[a])
        out_b.append(ids[b])
    return pd.DataFrame(
        {
            "doc_a": np.concatenate(out_a).astype("int64"),
            "doc_b": np.concatenate(out_b).astype("int64"),
        }
    ).drop_duplicates(ignore_index=True)


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold_micro: int = 800_000,
    n: int = 3,
    order: str = "hash",
    num_buckets: int = 64,
    pairs_broadcast_cap: int = 1_000_000,
) -> ray.data.Dataset:
    """EXACT n-gram Jaccard similarity self-join: every pair of documents
    with word-n-gram Jaccard ≥ threshold — no LSH, no probabilistic
    recall. Candidate generation uses PREFIX FILTERING (the classic
    similarity-join bound): under a fixed global order on shingles, a
    pair at Jaccard ≥ t must share a shingle within each side's
    (s - ceil(t·s) + 1)-prefix, so only prefix shingles are emitted as
    blocking keys and grouped — the shuffle carries (shingle, doc_id)
    int64 rows, never text. Candidates then run the standard distributed
    exact-Jaccard verify (pair dedup → text join → per-bucket set
    intersection), giving precision 1 on the true gram strings; recall
    is exact modulo 64-bit shingle-hash collisions (~N²·2⁻⁶⁴).

    ``order`` picks the global shingle order:

    - ``"hash"`` (default) — the hash value itself; zero extra passes.
      Caveat: a corpus-hot shingle that lands in many prefixes makes an
      O(m²) candidate bucket (e.g. thousands of empty/boilerplate docs).
    - ``"df"`` — ascending document frequency (ties by hash): one extra
      narrow count pass + a hash join, and every prefix then holds each
      doc's RAREST shingles, collapsing hot buckets — the skewed-corpus
      path. Output is identical (any total order is correct).

    Output: (doc_a < doc_b, jaccard in integer micro-units)."""
    if order not in ("hash", "df"):
        raise ValueError(f"order must be 'hash' or 'df', got {order!r}")
    t_micro = threshold_micro

    if order == "hash":
        prefix_rows = docs.map_batches(
            lambda b: _distinct_shingle_rows(b, n, t_micro, prefix_only=True),
            batch_format="pandas",
            batch_size=2048,
        )
    else:
        # all distinct (shingle, doc_id, set_size) rows — narrow int64s
        all_rows = docs.map_batches(
            lambda b: _distinct_shingle_rows(b, n, t_micro, prefix_only=False),
            batch_format="pandas",
            batch_size=2048,
        ).materialize()  # feeds BOTH the df count and the prefix join;
        # narrow (3×int64) rows in the object store, never the driver

        def partial_df(b: pd.DataFrame) -> pd.DataFrame:
            # in-batch partial pre-agg BEFORE the exchange; rows are
            # already per-doc distinct, so count == document frequency
            g = b.groupby("shingle", sort=False).size().reset_index(name="df")
            g["df"] = g["df"].astype("int64")
            return g

        def sum_df(bucket: pd.DataFrame) -> pd.DataFrame:
            # same-schema + idempotent: serves as BOTH the receiver
            # combiner (pre_reduce) and the final per-bucket kernel
            return bucket.groupby("shingle", sort=False)["df"].sum().reset_index()

        dfreq = bucketed_group_map(
            all_rows.map_batches(partial_df, batch_format="pandas"),
            ["shingle"],
            sum_df,
            num_buckets=num_buckets,
            exchange="direct",
            pre_reduce=sum_df,
        )
        from .relational import hash_join

        # hash_join clamps partitions to cluster CPUs (aggregator
        # actors deadlock when overscheduled on a small cluster)
        with_df = hash_join(all_rows, dfreq, on="shingle", num_partitions=num_buckets)

        def take_prefix(bucket: pd.DataFrame) -> pd.DataFrame:
            b = bucket.sort_values(["doc_id", "df", "shingle"], kind="stable")
            sizes = b["set_size"].to_numpy()
            rank = b.groupby("doc_id", sort=False).cumcount().to_numpy()
            alpha = (t_micro * sizes + 999_999) // 1_000_000
            keep = rank < (sizes - alpha + 1)
            return b.loc[keep, ["shingle", "doc_id", "set_size"]]

        prefix_rows = bucketed_group_map(
            with_df,
            ["doc_id"],
            take_prefix,
            num_buckets=num_buckets,
            exchange="direct",
        )

    cand = bucketed_group_map(
        prefix_rows,
        ["shingle"],
        _pairs_per_shingle,
        num_buckets=num_buckets,
        exchange="direct",
    )
    return verify_jaccard_pairs(
        docs,
        cand,
        n=n,
        threshold_micro=t_micro,
        pairs_broadcast_cap=pairs_broadcast_cap,
    )


# --- embedding-cosine near-dup ----------------------------------------------


def embedding_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    n_blocks: int | None = None,
) -> ray.data.Dataset:
    """EXACT near-duplicate pairs by embedding cosine ≥ threshold.

    Block-pair partitioned (similarity.blocked_near_dup_pairs): no
    driver materialization and no full-matrix broadcast — per-task
    memory is two id-hash blocks, the result streams as a Dataset.
    Output: (vec_a < vec_b, cosine in exact micro-int units)."""
    from .similarity import blocked_near_dup_pairs

    return blocked_near_dup_pairs(
        ds, threshold=threshold, id_col=id_col, n_blocks=n_blocks
    )


# --- streaming exact dedup ----------------------------------------------------


@ray.remote
class DedupStateActor:
    """Shard of the global seen-hash set for STREAMING dedup (one actor
    owns hashes with ``h % num_actors == aid``). State is O(unique
    hashes · 8 B) sharded across the pool — the standard streaming-dedup
    memory shape; at 10^11+ uniques plug a spillable store (RocksDB)
    behind the same two methods.

    State is an LSM-style list of SORTED int64 runs: one stable argsort
    per call yields both the intra-call first-occurrence positions
    (first element of each equal-run = smallest original index) and
    sorted needles for membership probes (sorted needles probe ~7×
    faster than random order — cache locality); new values append as a
    fresh run, with adjacent runs merged geometrically (amortized
    O(log R) merges per element). No Python loop over hashes anywhere.
    Measured on this host: 3.3 M hashes/s/actor vs 2.0 M/s for the
    CPython set loop at 20 M hashes / 50% dup rate (numbers + the DRAM
    control in BASELINE.md — this VM's ~5 GB/s memory floor caps the
    numpy side; the gap widens on real hardware)."""

    def __init__(self):
        self.runs: list[np.ndarray] = []

    def _compact(self) -> None:
        # geometric merge: keep run sizes strictly doubling, so an
        # element is merged O(log R) times over its lifetime
        while len(self.runs) > 1 and 2 * len(self.runs[-1]) >= len(self.runs[-2]):
            b = self.runs.pop()
            a = self.runs.pop()
            m = np.concatenate([a, b])
            m.sort(kind="stable")
            self.runs.append(m)

    def first_seen(self, hashes: np.ndarray) -> np.ndarray:
        """Mark hashes seen; return the boolean mask of FIRST sightings
        (duplicates within one call keep only their first position)."""
        h = np.asarray(hashes, dtype=np.int64)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        # start of each equal-run; stable sort => that element carries
        # the SMALLEST original index = the call's first occurrence
        bound = np.empty(len(hs), dtype=bool)
        bound[0] = True
        np.not_equal(hs[1:], hs[:-1], out=bound[1:])
        ss = hs[bound]  # sorted distinct values
        firstpos = order[bound]  # their first original positions
        member = np.zeros(len(ss), dtype=bool)
        for run in self.runs:
            pos = np.searchsorted(run, ss)
            ok = pos < len(run)
            member[ok] |= run[pos[ok]] == ss[ok]
        new_sorted = ss[~member]
        out = np.zeros(len(h), dtype=bool)
        if len(new_sorted):
            out[firstpos[~member]] = True
            self.runs.append(new_sorted)
            self._compact()
        return out

    def size(self) -> int:
        return sum(len(r) for r in self.runs)


class StreamingDeduper:
    """Streaming exact dedup over a (possibly unbounded) sequence of
    Datasets: rows whose content hash was already seen — in ANY earlier
    batch or dataset — are dropped; first sightings pass through.

    Which duplicate of a text survives depends on arrival order (inherent
    to streaming); the SET of surviving texts is exact and deterministic.
    Use batch ``exact_dedup`` when a deterministic representative (min
    id) is required."""

    def __init__(self, text_col: str = "text", num_actors: int = 8):
        self.text_col = text_col
        self.actors = [DedupStateActor.remote() for _ in range(num_actors)]

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        actors, A, text_col = self.actors, len(self.actors), self.text_col

        def fn(batch: pa.Table) -> pa.Table:
            h = hash_strings(batch.column(text_col)).astype(np.int64)
            owner = (h.astype(np.uint64) % np.uint64(A)).astype(np.int64)
            keep = np.zeros(len(h), dtype=bool)
            refs, slots = [], []
            for a in range(A):
                idx = np.flatnonzero(owner == a)
                if len(idx):
                    refs.append(actors[a].first_seen.remote(h[idx]))
                    slots.append(idx)
            for idx, r in zip(slots, ray.get(refs)):
                keep[idx] = r
            return batch.filter(pa.array(keep))

        return ds.map_batches(fn, batch_format="pyarrow")

    def unique_count(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def _doc_ngram_rows(batch: pd.DataFrame, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT word-n-gram hashes (Horner over md5 word hashes)
    as parallel (doc_index, gram_hash) arrays — one flat pass, one
    lexsort, no per-doc loop. Docs shorter than ``n`` words take one
    whole-doc gram; empty docs take none (matches the SQL oracle's
    ``CASE len(t)`` ladder)."""
    from .hashing import md5_word_hashes, split_flat, window_horner

    flat, lens = split_flat(batch["text"])
    wh = md5_word_hashes(flat)
    H, m = window_horner(wh, lens, n)
    if len(H) == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.uint64)
    doc_of = np.repeat(np.arange(len(lens)), m)
    order = np.lexsort((H, doc_of))
    d2, h2 = doc_of[order], H[order]
    uniq = np.empty(len(d2), dtype=bool)
    uniq[:1] = True
    np.logical_or(d2[1:] != d2[:-1], h2[1:] != h2[:-1], out=uniq[1:])
    return d2[uniq], h2[uniq]


def decontaminate(
    ds: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    n: int = 5,
    bloom: bool = False,
) -> ray.data.Dataset:
    """Benchmark decontamination (the GPT-3/PaLM-style n-gram-overlap
    filter): flag every training document sharing at least one word
    ``n``-gram with the evaluation corpus. Returns one row per training
    doc: (doc_id, n_overlap, contaminated) where ``n_overlap`` counts
    the doc's DISTINCT n-grams that appear anywhere in the eval set.

    Scale shape: the eval side is benchmark-sized by nature — its
    distinct n-gram hashes are aggregated per batch, collected ONCE to
    the driver (8 bytes per distinct eval gram) and broadcast via
    ``ray.put``; the training corpus then STREAMS through a stateless
    membership kernel (sorted-array searchsorted) — no shuffle, no
    train-side materialization. ``bloom=True`` swaps the broadcast for
    a Bloom filter over the same hashes (O(bits) regardless of eval
    size; ~1e-3 FP rate over-drops, never under-drops — the safe
    direction for decontamination). Reference analog: extends
    wprdc-etl pipeline/pipeline.py::Pipeline's per-record validation
    gates to corpus-level membership filters."""
    import ray as _ray

    def eval_grams(batch: pd.DataFrame) -> pd.DataFrame:
        _, h = _doc_ngram_rows(batch, n)
        return pd.DataFrame({"gram": np.unique(h).view(np.int64)})

    ev = (
        eval_ds.map_batches(eval_grams, batch_format="pandas")
        .to_pandas()["gram"]
        .to_numpy()
        .view(np.uint64)
    )
    ev = np.unique(ev)
    if bloom:
        from .hashing import BloomFilter

        bf = BloomFilter(len(ev))
        bf.add(ev)
        ref = _ray.put(bf)
    else:
        ref = _ray.put(ev)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        side = _ray.get(ref)
        d, h = _doc_ngram_rows(batch, n)
        if bloom:
            hit = side.contains(h) if len(h) else np.zeros(0, dtype=bool)
        elif len(h):
            pos = np.searchsorted(side, h)
            pos_c = np.minimum(pos, max(len(side) - 1, 0))
            hit = (pos < len(side)) & (side[pos_c] == h) if len(side) else np.zeros(len(h), bool)
        else:
            hit = np.zeros(0, dtype=bool)
        n_overlap = np.bincount(d[hit], minlength=len(batch)).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_overlap": n_overlap,
                "contaminated": (n_overlap > 0).astype(np.int64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")

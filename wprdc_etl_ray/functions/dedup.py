"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification,
embedding-cosine near-dup.

Scale shapes (the part that matters at 100 TB):
- exact: hash-partition on a content hash, keep-first per group — only
  the 8-byte hash + id shuffles when ``payload=False``;
- MinHash/LSH: shingle → minhash signature per batch (vectorized),
  explode to (band, band_hash) rows, ``groupby`` the bands, emit
  candidate pairs per bucket — classic banded LSH where the shuffle
  carries band keys, not documents;
- SimHash: 64-bit signature per doc, bucket by bit-prefix;
- verification: n-gram Jaccard on candidate PAIRS only (never all
  pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.partition import hash_strings
from .relational import bucketed_group_map

# --- exact dedup -------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One representative (min id) per distinct text.

    Hash-partitions on a 64-bit content hash; hash collisions are
    resolved inside the group by grouping on the actual text, so the
    result is exact, not probabilistic."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(text_col)).astype(np.int64)
        return batch.select([id_col, text_col]).append_column("_h", pa.array(h))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def keep_first(bucket: pd.DataFrame) -> pd.DataFrame:
        rep = bucket.groupby(text_col, sort=False)[id_col].min().reset_index()
        return rep[[id_col]]

    # one task per hash bucket (not per distinct text) — vectorized inside
    return bucketed_group_map(hashed, ["_h"], keep_first, num_buckets=64)


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
            # hashes (reduceat over clipped doc starts; empty docs → 0)
            fb_per_doc = np.zeros(len(lens), dtype=np.uint64)
            if len(wh):
                seg_sums = np.add.reduceat(wh, np.minimum(starts, len(wh) - 1))
                nonempty = lens > 0
                fb_per_doc[nonempty] = seg_sums[nonempty]
            doc_of = np.repeat(np.arange(len(lens)), m)
            sh[small] = fb_per_doc[doc_of[small]]
        return sh, m

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
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
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Candidate near-duplicate pairs via banded LSH.

    signature → split into ``bands`` bands of ``num_perm // bands``
    rows → hash each band → ``groupby (band_id, band_hash)`` → all
    bucket-mates are candidates. Returns (doc_a, doc_b) with
    doc_a < doc_b, distinct."""
    rows = num_perm // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_len": shingle_len},
        batch_format="pandas",
        concurrency=concurrency,
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


def simhash_signatures(ds: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher, batch_format="pandas", concurrency=concurrency, batch_size=2048
    )


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


# --- embedding-cosine near-dup ----------------------------------------------


def embedding_near_dups(
    ds: ray.data.Dataset, threshold: float = 0.95, id_col: str = "vec_id"
) -> pd.DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Streams batches against a broadcast normalized matrix (numpy matmul
    per batch) — the brute-force baseline; the scale path buckets by
    coarse quantizer first (see similarity.ivf_topk)."""
    import ray as _ray

    full = _to_matrix(ds, id_col)
    ids, mat = full
    ref = _ray.put((ids, mat))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, m = _ray.get(ref)
        q = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
        sims = q @ m.T  # (batch, N)
        qa, nb = np.nonzero(sims >= threshold)
        qa_ids = batch[id_col].to_numpy()[qa]
        nb_ids = all_ids[nb]
        keep = qa_ids < nb_ids  # dedupe + drop self
        return pd.DataFrame(
            {
                "vec_a": qa_ids[keep].astype("int64"),
                "vec_b": nb_ids[keep].astype("int64"),
                "cosine": np.round(sims[qa, nb][keep], 6).astype("float64"),
            }
        )

    out = ds.map_batches(fn, batch_format="pandas")
    pdf = out.to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return pdf.sort_values(["vec_a", "vec_b"], ignore_index=True)


def _to_matrix(ds: ray.data.Dataset, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    # the embedding side being broadcast must be small enough to pin in
    # the object store (contract of a broadcast join); ids+matrix only
    rows = ds.select_columns([id_col, "embedding"]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
    order = np.argsort(ids)
    return ids[order], mat[order]

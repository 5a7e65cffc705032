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
import pyarrow.compute as pc

import ray.data

from ..stages.partition import hash_strings

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

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        rep = group.groupby(text_col, sort=False)[id_col].min().reset_index()
        return rep[[id_col]]

    return hashed.groupby("_h").map_groups(keep_first, batch_format="pandas")


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Per-batch MinHash signatures over word shingles (actor-pool stage).

    ``__init__`` draws the permutation coefficients once per actor from
    a FIXED seed (signatures must agree across actors); ``__call__`` is
    vectorized: shingle hashing via pandas/np, the (a*x+b) mod p
    min-reduction via one numpy outer product per batch."""

    def __init__(self, num_perm: int = 64, shingle_len: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_len

    def shingle_hashes(self, text: str) -> np.ndarray:
        words = text.split()
        if len(words) < self.k:
            grams = [" ".join(words)] if words else [""]
        else:
            grams = [" ".join(words[i : i + self.k]) for i in range(len(words) - self.k + 1)]
        return pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        x = np.unique(self.shingle_hashes(text))
        # (num_perm, n_shingles) affine transform mod Mersenne prime
        v = (np.outer(self.a, x) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t or "") for t in batch["text"]])
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "sig": list(sigs.astype(np.int64))}
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

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # distinct pairs (a pair can match in several bands)
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# --- SimHash -----------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per document (actor-pool stage): sum token-hash
    bit vectors weighted ±1, vectorized via unpackbits."""

    def __init__(self):
        pass

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch["text"].fillna("")):
            words = np.asarray(t.split(), dtype=object)
            if len(words) == 0:
                out[i] = 0
                continue
            h = pd.util.hash_array(words).view(np.uint64)
            bits = np.unpackbits(h.view(np.uint8)).reshape(len(h), 64)
            score = bits.sum(axis=0) * 2 - len(h)  # (+1/-1 vote per bit)
            out[i] = np.packbits((score > 0).astype(np.uint8)).view(np.uint64)[0]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "simhash": out.astype(np.int64)}
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

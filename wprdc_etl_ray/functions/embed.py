"""Deterministic document embeddings via the hashing trick — the
model-free stand-in for a neural embedder that lets the full
documents → embed → ANN/near-dup pipeline run (and be oracle-checked)
without any model weights in the container.

Definition (engine-agnostic, see functions/hashing.py):
- token hash h = md5-prefix uint64;
- bucket = h % dim;  sign = +1 if the top bit of h is set else -1;
- embedding[b] = Σ sign over the doc's tokens landing in bucket b
  (duplicate tokens vote per occurrence) — an INTEGER vector;
- `norm_sq` = Σ embedding[b]² and `nnz` = #{b: embedding[b] ≠ 0} are
  exact integers, which is what the SQL oracle compares; consumers that
  need unit vectors L2-normalize downstream (cosine is scale-invariant,
  so ANN over the raw integer vectors is equivalent).

Vectorized: one flat token-hash array per batch + ``np.add.at`` scatter
into the (docs × dim) matrix — no per-document Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .hashing import md5_word_hashes, split_flat


def feature_hash_matrix(texts: pd.Series, dim: int = 64) -> np.ndarray:
    """(n_docs × dim) integer embedding matrix for a batch of texts."""
    flat, lens = split_flat(texts)
    out = np.zeros((len(lens), dim), dtype=np.int64)
    if len(flat):
        wh = md5_word_hashes(flat)
        bucket = (wh % np.uint64(dim)).astype(np.int64)
        sign = np.where((wh >> np.uint64(63)) & np.uint64(1), 1, -1).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        np.add.at(out, (doc_of, bucket), sign)
    return out


def feature_hash_embed(
    ds: ray.data.Dataset, dim: int = 64, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Embed every document; output (id, embedding list<int64>, norm_sq,
    nnz). Stateless vectorized kernel — one task-pool map."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        m = feature_hash_matrix(batch["text"], dim=dim)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "embedding": list(m),
                "norm_sq": (m * m).sum(axis=1),
                "nnz": (m != 0).sum(axis=1).astype("int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def embed_stats(ds: ray.data.Dataset, dim: int = 64) -> ray.data.Dataset:
    """The oracle-comparable projection of the embedding (exact
    integers: norm_sq, nnz) — see module docstring."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        m = feature_hash_matrix(batch["text"], dim=dim)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "norm_sq": (m * m).sum(axis=1),
                "nnz": (m != 0).sum(axis=1).astype("int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")

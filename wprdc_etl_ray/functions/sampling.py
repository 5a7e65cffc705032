"""Deterministic sampling / splitting operators for training-data
pipelines (reference analog: none — wprdc-etl has no sampling stage;
these are the train/val-split and corpus-subsample staples a 100-TB
data engine needs, built on the same engine-agnostic md5 hash as the
text operators so every result is SQL-oracle-checkable).

Scale shapes:
- ``hash_sample`` is embarrassingly parallel: one ``map_batches``
  filter on a per-row hash threshold — no shuffle, no state, stable
  under re-runs and repartitioning (membership depends only on the key).
- ``stratified_split`` ships (key, stratum) int64/str rows through ONE
  narrow exchange on the stratum; per-stratum ranking runs inside the
  bucket. Exact per-stratum quotas require co-locating a stratum's keys
  (inherent); a stratum too large for one task should use
  ``hash_sample`` per stratum instead (approximate quota, zero
  co-location) — the docstring trade-off, stated plainly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .hashing import md5_word_hashes

__all__ = ["key_hash_u64", "hash_sample", "stratified_split"]


def key_hash_u64(keys: np.ndarray) -> np.ndarray:
    """uint64 md5-prefix hash of each key's decimal-string form —
    identical in DuckDB as
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 16))::UBIGINT``."""
    return md5_word_hashes(np.asarray([str(k) for k in keys], dtype=object))


def sample_threshold(frac: float) -> int:
    """The integer hash threshold for a Bernoulli(frac) hash sample,
    computed ONCE in exact integer arithmetic (no float compare at row
    time — both engines compare against the same literal)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    # clamp to UBIGINT max: frac=1.0 keeps every key except one whose
    # hash is exactly 2^64-1 (probability 2^-64 per key) — both engines
    # compare against the same clamped literal, so results still agree
    return min(int(frac * float(1 << 64)), (1 << 64) - 1)


def hash_sample(
    ds: ray.data.Dataset, frac: float, key_col: str = "doc_id"
) -> ray.data.Dataset:
    """Deterministic Bernoulli sample: keep a row iff
    ``md5_u64(str(key)) < frac * 2^64``. No RNG, no shuffle — the same
    key is kept or dropped in EVERY run, dataset, and engine, which is
    what makes corpus subsamples reproducible and joinable (sampling
    two tables by the same key yields aligned rows)."""
    thr = np.uint64(sample_threshold(frac))

    def fn(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(batch.column(key_col).to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_split(
    ds: ray.data.Dataset,
    by: str,
    val_frac: float,
    key_col: str = "doc_id",
    num_buckets: int = 32,
    split_col: str = "split",
) -> ray.data.Dataset:
    """EXACT stratified train/val split: within every stratum (the
    ``by`` column), rank keys by (md5 hash, key) and label the first
    ``floor(val_frac * n_stratum)`` as ``'val'``, the rest ``'train'``.
    Per-stratum proportions are exact (not in expectation), the
    assignment is deterministic, and adding a NEW stratum never
    reshuffles existing ones (ranks depend only on intra-stratum
    hashes).

    One narrow exchange on the stratum key; the per-stratum argsort
    runs inside the bucket. A stratum must fit one task — for
    pathologically large strata use ``hash_sample`` per stratum
    (approximate quota, no co-location) instead.

    Output: (key_col, by, split_col)."""
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    from .relational import bucketed_group_map

    narrow = ds.select_columns([key_col, by])

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="int64"),
                    by: pd.Series([], dtype="object"),
                    split_col: pd.Series([], dtype="object"),
                }
            )
        out = []
        for stratum, grp in b.groupby(by, sort=False):
            keys = grp[key_col].to_numpy()
            gh = key_hash_u64(keys)
            order = np.lexsort((keys, gh))  # (hash, key) ascending
            n_val = int(np.floor(val_frac * len(keys)))
            split = np.full(len(keys), "train", dtype=object)
            split[order[:n_val]] = "val"
            out.append(
                pd.DataFrame({key_col: keys, by: stratum, split_col: split})
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_map(narrow, [by], per_bucket, num_buckets=num_buckets)


def cap_per_key(
    ds: ray.data.Dataset,
    by: str,
    cap: int,
    key_col: str = "doc_id",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Deterministic per-group cap — "at most ``cap`` documents per
    source/domain", the anti-over-representation staple of corpus
    curation. Within each group the KEPT rows are the ``cap`` smallest
    by (md5 hash, key): a uniform, rerun-stable choice (no RNG), and
    raising the cap only ADDS rows (nested, like ``hash_sample``
    thresholds).

    Rides ``topk_per_key``'s partial-aggregation shape: every batch
    pre-reduces to its local cap winners, the shuffle moves at most
    ``cap`` rows per (group, batch), and the per-bucket head(k) is its
    own combiner — receiver memory O(cap · groups/bucket).

    Output: the input columns (projected to key_col + by)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from .relational import topk_per_key

    narrow = ds.select_columns([key_col, by])

    def add_h(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(batch.column(key_col).to_numpy(zero_copy_only=False))
        return batch.append_column("_h", pa.array(h, pa.uint64()))

    hashed = narrow.map_batches(add_h, batch_format="pyarrow")
    kept = topk_per_key(
        hashed,
        [by],
        ["_h", key_col],
        cap,
        descending=False,
        num_buckets=num_buckets,
    )
    return kept.drop_columns(["_h"])


def mixture_sample(
    ds: ray.data.Dataset,
    weights: dict,
    by: str,
    key_col: str = "doc_id",
    default: float = 0.0,
) -> ray.data.Dataset:
    """Weighted multi-source mixture: keep a row of stratum ``s`` with
    probability ``weights[s]`` (deterministic Bernoulli on the md5 of
    its key; strata absent from ``weights`` use ``default``). This is
    the "up-weight books, down-weight web" corpus-mixing staple — one
    shuffle-free vectorized filter, reproducible across runs/engines,
    and nested per-stratum (raising one weight only adds that
    stratum's rows).

    Note: hash thresholds SHARE the key hash across strata, so the
    kept set of a stratum at weight w equals ``hash_sample(w)``
    restricted to that stratum — mixtures compose with global samples."""
    thr_by_stratum = {
        s: np.uint64(sample_threshold(float(w))) for s, w in weights.items()
    }
    dflt = np.uint64(sample_threshold(float(default)))

    def fn(batch: pa.Table) -> pa.Table:
        h = key_hash_u64(batch.column(key_col).to_numpy(zero_copy_only=False))
        strata = batch.column(by).to_numpy(zero_copy_only=False)
        # per-row thresholds via dictionary codes (vectorized lookup)
        uniq, codes = np.unique(strata, return_inverse=True)
        lut = np.array(
            [thr_by_stratum.get(s, dflt) for s in uniq], dtype=np.uint64
        )
        return batch.filter(pa.array(h < lut[codes]))

    return ds.map_batches(fn, batch_format="pyarrow")

"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The corpus-scale companion to ``similarity.kmeans_lite`` (which trains
on a bounded driver-side sample for IVF): here EVERY vector
participates in every iteration, the way semantic-cluster dedup or
corpus bucketing needs it, while the driver only ever holds k×d
centroid numbers.

Per iteration, one ``map_batches`` pass over the Dataset computes, per
batch, the per-cluster partial (count, per-dimension sum) — k×(d+1)
numbers per batch, independent of batch size — and the driver reduces
those partials and floor-divides into the next centroids. No shuffle at
all: the only data movement is the tiny partial rows. At 10^10 vectors
the reduce is num_batches × k × d ints on the driver; past that,
pre-sum partials per actor (a combiner ``map_batches`` stage) or route
them through ``relational.bucketed_group_map`` — same plumbing.

Exactness (the oracle trick, see hashing.py): embeddings are quantized
to integer micro-units first, so every distance (‖x‖² − 2x·c + ‖c‖²)
and every centroid update (floor(sum/count)) is integer-valued
arithmetic below 2^53 — numpy float64 and DuckDB DOUBLE compute them
bit-identically, ties broken by lowest cluster id in both engines.
Assignments are therefore exactly reproducible in SQL (the
``q_kmeans`` oracle chains one CTE per iteration).

Reference analog: wprdc-etl has no clustering; this generalizes its
schema-validated load stage to the "bucket the corpus" step of a
training-data pipeline (dedup clusters, mixture balancing, IVF cells).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import list_col_matrix

SCALE = 1_000_000.0


def _quantize(col) -> np.ndarray:
    """float list column → integer micro-units, as exact float64."""
    return np.floor(list_col_matrix(col).astype(np.float64) * SCALE + 0.5)


def _assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ‖q−c‖² with first-index (lowest cid) tie-break — all
    terms integral-valued float64, so the comparison is exact."""
    d2 = (
        (q * q).sum(axis=1)[:, None]
        - 2.0 * (q @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    return d2.argmin(axis=1)


def kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Lloyd's k-means; returns (id_col, cluster[, keep_cols…]) for
    every vector.

    Deterministic init: the k vectors with the SMALLEST ids, cluster
    index = rank of the id. ``n_iter`` centroid updates run over the
    full corpus, then a final pass assigns labels under the last
    centroids. An emptied cluster keeps its previous centroid.

    The narrow (id, embedding) projection is materialized once up
    front: an iterative algorithm consumes the Dataset n_iter+2 times,
    and Ray Data re-executes the whole upstream per consumption —
    pinning the projection in the (spillable) object store turns that
    into one read. This is the standard residency trade for iterative
    work; drop ``.materialize()`` to trade re-read CPU for memory."""
    ds = ds.select_columns(
        [id_col, emb_col] + [c for c in (keep_cols or []) if c != id_col]
    ).materialize()

    # --- init: k smallest ids (narrow candidate pass, k rows per batch)
    def min_k(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, emb_col]).take(pa.array(np.sort(order)))

    cand = ds.map_batches(min_k, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r[id_col])
    init = cand[:k]
    if len(init) < k:
        raise ValueError(f"k={k} but only {len(init)} vectors")
    cents = np.floor(
        np.asarray([r[emb_col] for r in init], np.float64) * SCALE + 0.5
    )
    kk, dim = cents.shape

    for _ in range(n_iter):
        cref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            q = _quantize(batch.column(emb_col))
            a = _assign(q, c)
            sums = np.zeros((kk, dim), np.float64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=kk).astype(np.float64)
            live = np.flatnonzero(counts)
            # flat (cluster, dim, s, n) rows: k×d numbers per batch
            n_rows = len(live) * dim
            return pa.table(
                {
                    "cluster": pa.array(
                        np.repeat(live, dim).astype(np.int64), pa.int64()
                    ),
                    "dim": pa.array(np.tile(np.arange(dim), len(live)), pa.int64()),
                    "s": pa.array(sums[live].reshape(n_rows), pa.float64()),
                    "n": pa.array(
                        np.repeat(counts[live], dim), pa.float64()
                    ),
                }
            )

        rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
        sums = np.zeros((kk, dim), np.float64)
        counts = np.zeros(kk, np.float64)
        for r in rows:
            sums[r["cluster"], r["dim"]] += r["s"]
            if r["dim"] == 0:
                counts[r["cluster"]] += r["n"]
        live = counts > 0
        # floor(sum/count) with ONE double division — the identical IEEE
        # operation the SQL oracle performs, so both floor identically
        cents = np.where(
            live[:, None], np.floor(sums / np.maximum(counts, 1.0)[:, None]), cents
        )

    cref = ray.put(cents)

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        a = _assign(_quantize(batch.column(emb_col)), c)
        cols = {
            id_col: batch.column(id_col),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        }
        for kc in keep_cols or []:
            cols[kc] = batch.column(kc)
        return pa.table(cols)

    return ds.map_batches(label, batch_format="pyarrow")

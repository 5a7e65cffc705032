"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exact baseline: the query matrix is
``ray.put`` once and every batch does one numpy matmul against it —
no shuffle, embarrassingly parallel, the right shape for "score 10^10
rows against a handful of queries". The IVF variant is the scale path
when the QUERY set is large: coarse-quantize both sides, co-locate by
centroid bucket, and only compare within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)


def brute_force_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    exclude: int | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k of one query vector against the dataset.

    Per batch: normalized matmul → local top-k (small); global top-k is
    a driver-side merge of per-batch candidates (k × num_batches rows —
    tiny). Scores rounded to 6 dp for engine-agnostic comparison."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    qref = ray.put(q)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        mat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ qv
        ids = batch[id_col].to_numpy()
        if exclude is not None:
            keep = ids != exclude
            ids, sims = ids[keep], sims[keep]
        take = min(k, len(ids))
        idx = np.argpartition(-sims, take - 1)[:take] if take else np.array([], int)
        return pd.DataFrame({id_col: ids[idx], "cosine": sims[idx]})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["cosine", id_col], ascending=[False, True], ignore_index=True
    ).head(k)
    cand["cosine"] = np.floor(cand["cosine"] * 1_000_000 + 0.5).astype("int64")
    return cand.reset_index(drop=True)


def all_pairs_nn(
    ds: ray.data.Dataset, id_col: str = "vec_id"
) -> ray.data.Dataset:
    """For every vector: its nearest neighbor (excluding self) by cosine.

    The full (small) reference matrix is broadcast once; each batch of
    queries is one matmul. Integer output → exact oracle comparison."""
    from .dedup import _to_matrix

    ids, mat = _to_matrix(ds, id_col)
    ref = ray.put((ids, mat))

    def nn(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, m = ray.get(ref)
        q = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = q @ m.T
        qids = batch[id_col].to_numpy()
        # mask self-matches
        self_pos = np.searchsorted(all_ids, qids)
        rows = np.arange(len(qids))
        valid = (self_pos < len(all_ids)) & (all_ids[np.minimum(self_pos, len(all_ids) - 1)] == qids)
        sims[rows[valid], self_pos[valid]] = -np.inf
        # deterministic argmax: max cosine, ties -> smallest neighbor id
        best_sim = sims.max(axis=1)
        is_best = sims >= best_sim[:, None]
        nn_idx = np.where(is_best, np.arange(len(all_ids))[None, :], len(all_ids)).min(axis=1)
        return pd.DataFrame(
            {
                id_col: qids,
                "nn_id": all_ids[nn_idx],
                "cosine": np.floor(best_sim * 1_000_000 + 0.5).astype("int64"),
            }
        )

    return ds.map_batches(nn, batch_format="pandas")


def ivf_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    seed: int = 7,
) -> pd.DataFrame:
    """IVF-style approximate top-k: k-means-lite centroids (fixed seed,
    a few Lloyd iterations over a sample), assign vectors to cells in a
    vectorized pass, then search only the ``n_probe`` cells closest to
    the query. The scale path: cell assignment is the partition key, so
    a big query batch shuffles once by cell instead of scanning all."""
    sample = np.stack(
        [np.asarray(r["embedding"], np.float64) for r in ds.take(min(2048, 100 * n_cells))]
    )
    sample = _normalize(sample)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(5):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
        cent = _normalize(cent)

    q = np.asarray(query, np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(cent @ q))[:n_probe].tolist())
    cref = ray.put((cent, probe, q))

    def cell_topk(batch: pd.DataFrame) -> pd.DataFrame:
        centroids, probe_cells, qv = ray.get(cref)
        mat = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        cells = (mat @ centroids.T).argmax(axis=1)
        mask = np.isin(cells, list(probe_cells))
        if not mask.any():
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"), "cosine": pd.Series([], dtype="float64")})
        sims = mat[mask] @ qv
        ids = batch[id_col].to_numpy()[mask]
        take = min(k, len(ids))
        idx = np.argpartition(-sims, take - 1)[:take]
        return pd.DataFrame({id_col: ids[idx], "cosine": sims[idx]})

    cand = ds.map_batches(cell_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["cosine", id_col], ascending=[False, True], ignore_index=True
    ).head(k)
    cand["cosine"] = np.floor(cand["cosine"] * 1_000_000 + 0.5).astype("int64")
    return cand.reset_index(drop=True)

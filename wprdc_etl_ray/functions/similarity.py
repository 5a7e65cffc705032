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


def list_col_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix WITHOUT a
    to_pylist() Python-object copy: flatten the child values buffer and
    reshape (valid for fixed-length embedding lists; ragged input falls
    back to a per-row build)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not hasattr(arr, "flatten"):
        # Ray tensor-extension array (pandas-born block): already (n, d)
        return np.asarray(arr.to_numpy(), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    if n == 0:
        return flat.reshape(0, 0)
    if len(flat) % n == 0:
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if (widths == widths[0]).all():
            return flat.reshape(n, -1)
    return np.stack([np.asarray(x, np.float64) for x in arr.to_pylist()])


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

    def local_topk(batch) -> pd.DataFrame:
        # pyarrow batch + list_col_matrix: the embedding column never
        # round-trips through the pandas tensor-extension encoding (its
        # parquet metadata only reconstructs in workers that already
        # registered the extension dtype — a scheduling-dependent trap)
        qv = ray.get(qref)
        mat = _normalize(list_col_matrix(batch.column("embedding")))
        sims = mat @ qv
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if exclude is not None:
            keep = ids != exclude
            ids, sims = ids[keep], sims[keep]
        take = min(k, len(ids))
        idx = np.argpartition(-sims, take - 1)[:take] if take else np.array([], int)
        return pd.DataFrame({id_col: ids[idx], "cosine": sims[idx]})

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["cosine", id_col], ascending=[False, True], ignore_index=True
    ).head(k)
    cand["cosine"] = np.floor(cand["cosine"] * 1_000_000 + 0.5).astype("int64")
    return cand.reset_index(drop=True)


# --- exact block-pair all-pairs operators ------------------------------------
#
# The scale-safe replacement for "broadcast the whole matrix": split the
# N vectors into n_blocks blocks (block = vec_id % n_blocks), replicate
# each row once per partner block, and co-locate every unordered block
# PAIR (i,j) in one task. Per-task compute memory is O(2N/n_blocks · d)
# — set n_blocks so two blocks fit a worker heap; total compute is the
# inherent O(N²·d) matmul work, spread over n_blocks(n_blocks+1)/2
# independent tasks; communication is O(N·n_blocks·d) — no driver
# materialization, no full-matrix broadcast anywhere.
#
# Receiver-side bound (the honest number): the replicated rows ride the
# direct exchange, whose actors buffer at most ``spill_rows`` embedding
# rows in heap (the rest spills to node-local parquet) and whose
# finalize streams ONE bucket at a time. We size num_buckets to the
# number of block-pair groups, so finalize peak is O(one block pair)
# = O(2N/n_blocks · d) — matching the per-task compute bound — and we
# pass a small spill budget because embedding rows are wide.

_EMBED_SPILL_ROWS = 500_000  # ~256 MB heap at d=64 float64 per actor


def _pair_group_buckets(n_blocks: int) -> int:
    """One exchange bucket per block-pair group (hash collisions merge
    a few groups — harmless; finalize applies the kernel per group)."""
    return min(4096, n_blocks * (n_blocks + 1) // 2)


def _replicate_to_block_pairs(
    ds: ray.data.Dataset, id_col: str, n_blocks: int
) -> ray.data.Dataset:
    import pyarrow as pa

    def rep(batch: pa.Table) -> pa.Table:
        # stays Arrow: the embedding column must remain list<float>
        # through the exchange (a pandas round-trip would re-encode it
        # as a tensor-extension column)
        b = (
            batch.column(id_col).to_numpy(zero_copy_only=False) % n_blocks
        ).astype(np.int64)
        outs = []
        for other in range(n_blocks):  # loop over BLOCKS, not rows
            i = np.minimum(b, other)
            j = np.maximum(b, other)
            t = batch.append_column("_pg", pa.array(i * n_blocks + j, pa.int64()))
            t = t.append_column("_blk", pa.array(b, pa.int64()))
            outs.append(t)
        return pa.concat_tables(outs)

    return ds.map_batches(rep, batch_format="pyarrow")


def _auto_blocks(ds: ray.data.Dataset, n_blocks: int | None) -> int:
    """Adaptive block count: ~50k vectors per block (a 64-dim float64
    block ≈ 26 MB, so a block-PAIR task holds ~50 MB) — parquet row
    count is metadata-only. Any value is correct; this sizes task
    memory/replication to the input."""
    if n_blocks is not None:
        return n_blocks
    n = ds.count()
    return int(max(2, min(64, -(-n // 50_000) + 1)))


def blocked_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    n_blocks: int | None = None,
) -> ray.data.Dataset:
    """EXACT all-pairs cosine ≥ threshold, block-pair partitioned (see
    above). Output (vec_a < vec_b, cosine micro-int), each pair emitted
    exactly once — pair (a,b) lives only in group (min,max of their
    blocks). Streams: the result is a Dataset, never driver-collected."""

    n_blocks = _auto_blocks(ds, n_blocks)
    rep = _replicate_to_block_pairs(ds, id_col, n_blocks)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        pg = int(g["_pg"].iloc[0])
        i, j = pg // n_blocks, pg % n_blocks
        A = g[g["_blk"] == i]
        B = g[g["_blk"] == j] if i != j else A
        if A.empty or B.empty:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype="int64"),
                    "vec_b": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="int64"),
                }
            )
        ma = _normalize(np.stack(A["embedding"].to_numpy()).astype(np.float64))
        mb = _normalize(np.stack(B["embedding"].to_numpy()).astype(np.float64))
        ia = A[id_col].to_numpy()
        ib = B[id_col].to_numpy()
        sims = ma @ mb.T
        ra, rb = np.nonzero(sims >= threshold)
        va, vb = ia[ra], ib[rb]
        c = sims[ra, rb]
        if i == j:
            # both orders of each pair are in sims: keep one, drop self
            keep = va < vb
            va, vb, c = va[keep], vb[keep], c[keep]
        else:
            # each cross-block pair appears exactly once: just orient
            va, vb = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame(
            {
                "vec_a": va.astype("int64"),
                "vec_b": vb.astype("int64"),
                "cosine": np.floor(c * 1_000_000 + 0.5).astype("int64"),
            }
        )

    from .relational import grouped_pandas_map

    return grouped_pandas_map(
        rep,
        ["_pg"],
        per_group,
        num_buckets=_pair_group_buckets(n_blocks),
        spill_rows=_EMBED_SPILL_ROWS,
    )


def all_pairs_nn(
    ds: ray.data.Dataset, id_col: str = "vec_id", n_blocks: int | None = None
) -> ray.data.Dataset:
    """For every vector: its exact nearest neighbor (excluding self) by
    cosine — block-pair partitioned (no full-matrix broadcast).

    Each block-pair task emits ONE candidate (best partner in the other
    block) per vector per side; the global winner is a narrow
    arg-max reduce over the N·n_blocks candidate rows (max cosine, ties
    → smallest neighbor id — same total order as the SQL oracle)."""
    from .relational import latest_per_key

    n_blocks = _auto_blocks(ds, n_blocks)
    rep = _replicate_to_block_pairs(ds, id_col, n_blocks)

    def best_of(qi, qm, ti, tm, same: bool) -> pd.DataFrame:
        sims = qm @ tm.T
        if same:
            # mask self-matches by id equality
            eq = qi[:, None] == ti[None, :]
            sims[eq] = -np.inf
        best = sims.max(axis=1)
        # ties -> smallest target id: among argmax columns take min id
        is_best = sims >= best[:, None]
        big = np.iinfo(np.int64).max
        nn_ids = np.where(is_best, ti[None, :], big).min(axis=1)
        ok = np.isfinite(best)
        return pd.DataFrame(
            {
                id_col: qi[ok],
                "nn_id": nn_ids[ok].astype("int64"),
                "cosine": best[ok],
            }
        )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        pg = int(g["_pg"].iloc[0])
        nb = n_blocks
        i, j = pg // nb, pg % nb
        A = g[g["_blk"] == i]
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype="int64"),
                "nn_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if i == j:
            if len(A) < 2:
                return empty
            ma = _normalize(np.stack(A["embedding"].to_numpy()).astype(np.float64))
            ia = A[id_col].to_numpy()
            return best_of(ia, ma, ia, ma, same=True)
        B = g[g["_blk"] == j]
        if A.empty or B.empty:
            return empty
        ma = _normalize(np.stack(A["embedding"].to_numpy()).astype(np.float64))
        mb = _normalize(np.stack(B["embedding"].to_numpy()).astype(np.float64))
        ia, ib = A[id_col].to_numpy(), B[id_col].to_numpy()
        return pd.concat(
            [best_of(ia, ma, ib, mb, False), best_of(ib, mb, ia, ma, False)],
            ignore_index=True,
        )

    from .relational import grouped_pandas_map

    cand = grouped_pandas_map(
        rep,
        ["_pg"],
        per_group,
        num_buckets=_pair_group_buckets(n_blocks),
        spill_rows=_EMBED_SPILL_ROWS,
    )

    def neg(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_neg_nn"] = -batch["nn_id"]
        return batch

    winners = latest_per_key(
        cand.map_batches(neg, batch_format="pandas"),
        [id_col],
        ["cosine", "_neg_nn"],
        num_buckets=8,
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col].astype("int64"),
                "nn_id": batch["nn_id"].astype("int64"),
                "cosine": np.floor(
                    batch["cosine"].to_numpy() * 1_000_000 + 0.5
                ).astype("int64"),
            }
        )

    return winners.map_batches(finish, batch_format="pandas")


def kmeans_lite(sample: np.ndarray, n_cells: int, seed: int = 7) -> np.ndarray:
    """Deterministic fixed-seed k-means-lite (5 Lloyd iterations on
    normalized vectors). Shared by the index build AND the driver-side
    oracle so both assign identical cells."""
    sample = _normalize(np.asarray(sample, np.float64))
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(5):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfIndex:
    """Persisted IVF index: coarse k-means centroids + a CELL-PARTITIONED
    parquet layout (hive dirs ``cell=<c>/``) written once with
    ``write_parquet(partition_cols=['cell'])``.

    Build is one streaming pass (bounded centroid-training sample +
    vectorized cell assignment per batch); queries load only the tiny
    centroid table plus the ``n_probe`` probed cells' FILES — partition
    pruning at the read, so a query touches O(n_probe/n_cells) of the
    data instead of scanning all vectors. This is the persisted scale
    path the brute-force operators fall back from."""

    def __init__(self, index_dir: str, centroids: np.ndarray, id_col: str):
        self.index_dir = index_dir
        self.centroids = centroids
        self.id_col = id_col

    @staticmethod
    def train_centroids(
        ds: ray.data.Dataset, n_cells: int, seed: int = 7, sample_size: int | None = None
    ) -> np.ndarray:
        """k-means-lite on a BOUNDED sample (standard quantizer training:
        the sample, not the corpus, fits driver memory)."""
        n = sample_size or min(4096, 128 * n_cells)
        sample = np.stack([np.asarray(r["embedding"], np.float64) for r in ds.take(n)])
        return kmeans_lite(sample, n_cells, seed=seed)

    @classmethod
    def build(
        cls,
        ds: ray.data.Dataset,
        index_dir: str,
        n_cells: int = 16,
        seed: int = 7,
        id_col: str = "vec_id",
        centroids: np.ndarray | None = None,
    ) -> "IvfIndex":
        import json
        import os

        cent = (
            np.asarray(centroids, np.float64)
            if centroids is not None
            else cls.train_centroids(ds, n_cells, seed=seed)
        )
        cref = ray.put(cent)

        def assign(batch: "pa.Table") -> "pa.Table":
            # stays Arrow end to end: the written cell files keep the
            # plain list<float> schema (no pandas tensor-extension
            # metadata, which poisons later to_pandas in fresh workers)
            import pyarrow as pa

            c = ray.get(cref)
            mat = _normalize(list_col_matrix(batch.column("embedding")))
            cell = (mat @ c.T).argmax(axis=1).astype("int32")
            return batch.append_column("cell", pa.array(cell, pa.int32()))

        # RESUMABLE build: cells go through the partitioned sink (one
        # dir + one _SUCCESS marker per cell); ``centroids.json`` is
        # written LAST as the whole-index commit marker. A crashed
        # build re-run (same deterministic centroids) skips every cell
        # already marked complete.
        from ..sources.sinks import resumable_write

        os.makedirs(index_dir, exist_ok=True)
        resumable_write(
            ds.map_batches(assign, batch_format="pyarrow"),
            os.path.join(index_dir, "cells"),
            partition_col="cell",
        )
        with open(os.path.join(index_dir, "centroids.json"), "w") as f:
            json.dump({"id_col": id_col, "centroids": cent.tolist(), "layout": 2}, f)
        return cls(index_dir, cent, id_col)

    @classmethod
    def is_complete(cls, index_dir: str) -> bool:
        """True iff a finished CURRENT-layout index lives here (the
        commit marker exists and is layout-2 — older layouts rebuild)."""
        import json
        import os

        path = os.path.join(index_dir, "centroids.json")
        if not os.path.exists(path):
            return False
        with open(path) as f:
            return json.load(f).get("layout") == 2

    @classmethod
    def open(cls, index_dir: str) -> "IvfIndex":
        import json
        import os

        with open(os.path.join(index_dir, "centroids.json")) as f:
            meta = json.load(f)
        return cls(index_dir, np.asarray(meta["centroids"], np.float64), meta["id_col"])

    def _cell_files(self, c: int) -> list[str]:
        import glob as _glob
        import os

        return _glob.glob(
            os.path.join(self.index_dir, "cells", "data", f"cell={c}", "*.parquet")
        )

    def probe_cells(self, query: np.ndarray, n_probe: int) -> list[int]:
        q = np.asarray(query, np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        return np.argsort(-(self.centroids @ q))[:n_probe].tolist()

    def query_batch(
        self, queries: np.ndarray, k: int = 5, n_probe: int = 4,
        as_dataset: bool = False,
    ):
        """Top-k for MANY queries — the IVF scale path: queries are
        grouped by probed cell, each touched cell's files are scanned
        ONCE for all of its queries (one Ray task per cell, matmul of
        cell-matrix × cell-queries), and the per-cell candidates merge
        through the DISTRIBUTED ``topk_per_key`` exchange — the driver
        never concatenates the k × n_probe candidate rows per query. A
        cell untouched by any query is never read.

        Returns (qid, vec_id, cosine micro) with exactly min(k, hits)
        rows per query. ``as_dataset=True`` (the 10^6-query path)
        returns the merged Dataset unmaterialized; the default returns
        a DataFrame ordered by (qid, -cosine, vec_id) for small query
        sets."""

        q = np.asarray(queries, np.float64)
        q = q / np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
        order = np.argsort(-(q @ self.centroids.T), axis=1)[:, :n_probe]
        by_cell: dict[int, list[int]] = {}
        for qid, cells in enumerate(order):
            for c in cells:
                by_cell.setdefault(int(c), []).append(qid)

        @ray.remote
        def scan_cell(files: list[str], sub_q: np.ndarray, qids: np.ndarray, id_col: str):
            # one cell = one task's worth: read directly with pyarrow
            import pyarrow as pa2
            import pyarrow.parquet as pq2

            tabs = [pq2.read_table(f, columns=[id_col, "embedding"]) for f in files]
            tab = pa2.concat_tables(tabs) if len(tabs) > 1 else tabs[0]
            ids = tab.column(id_col).to_numpy(zero_copy_only=False)
            mat = _normalize(list_col_matrix(tab.column("embedding")))
            sims = sub_q @ mat.T  # (q_in_cell, cell_rows)
            take = min(k, sims.shape[1])
            idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            rows = np.repeat(qids, take)
            return pd.DataFrame(
                {
                    "qid": rows,
                    id_col: ids[idx].ravel().astype("int64"),
                    "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
                }
            )

        refs = []
        for c, qids in by_cell.items():
            files = self._cell_files(c)
            if not files:
                continue
            refs.append(
                scan_cell.remote(files, q[qids], np.asarray(qids, np.int64), self.id_col)
            )
        if not refs:
            empty = pd.DataFrame(
                {"qid": pd.Series([], dtype="int64"),
                 self.id_col: pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="int64")}
            )
            return ray.data.from_pandas(empty) if as_dataset else empty

        from .relational import topk_per_key

        # per-cell candidate frames become Dataset blocks (zero-copy
        # from the task outputs); the global per-query top-k runs
        # through the exchange with top-k as its own combiner
        cand = ray.data.from_pandas_refs(refs)
        winners = topk_per_key(
            cand, ["qid"], ["cosine", self.id_col], k, descending=[True, False]
        )

        def to_micro(batch: pd.DataFrame) -> pd.DataFrame:
            batch["cosine"] = np.floor(
                batch["cosine"].to_numpy() * 1_000_000 + 0.5
            ).astype("int64")
            return batch

        winners = winners.map_batches(to_micro, batch_format="pandas")
        if as_dataset:
            return winners
        out = winners.to_pandas()
        return out.sort_values(
            ["qid", "cosine", self.id_col], ascending=[True, False, True],
            kind="stable", ignore_index=True,
        )

    def query(
        self, query: np.ndarray, k: int = 5, n_probe: int = 4
    ) -> pd.DataFrame:
        """Read ONLY the probed cells' partitions; exact top-k inside."""
        dirs = [
            f for c in self.probe_cells(query, n_probe) for f in self._cell_files(c)
        ]
        if not dirs:
            return pd.DataFrame(
                {self.id_col: pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="int64")}
            )
        subset = ray.data.read_parquet(dirs, columns=[self.id_col, "embedding"])
        return brute_force_topk(subset, query, k=k, id_col=self.id_col)


def ivf_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    seed: int = 7,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """Approximate top-k via the persisted IVF index. ``index_dir``
    caches the built index — repeat queries skip the build and read only
    probed cells; ``None`` builds into a fresh temp dir (tests)."""
    import os
    import tempfile

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="ivf_")
    if os.path.exists(os.path.join(index_dir, "centroids.json")):
        idx = IvfIndex.open(index_dir)
    else:
        idx = IvfIndex.build(ds, index_dir, n_cells=n_cells, seed=seed, id_col=id_col)
    return idx.query(query, k=k, n_probe=n_probe)


def lsh_planes(dim: int, n_planes: int = 16, seed: int = 99) -> np.ndarray:
    """Fixed-seed random hyperplanes for cosine LSH — shared by the Ray
    signature stage and the driver-side SQL oracle generator."""
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim))


def cosine_lsh_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 99,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """APPROXIMATE near-dup pairs by cosine via random-hyperplane LSH —
    the sub-quadratic ANN path (the exact block-pair join does the full
    O(N²) matmul work; this one only compares vectors whose sign
    signatures collide in some band).

    signature bit j = sign(dot(v, plane_j)); split into ``bands`` bands;
    vectors sharing any band's bits are candidates; candidates are
    VERIFIED by true cosine ≥ threshold inside the bucket. Deterministic
    (fixed-seed planes), so the driver oracle reproduces the exact same
    bucketing + verification in SQL — it checks the pipeline, and
    recall vs the exact join is the documented LSH tradeoff
    (P[candidate] = 1-(1-(1-θ/π)^(bits/band))^bands).

    Scale shape: the shuffle carries (id, band key, embedding-as-list);
    per-bucket work is an m×m matmul over the bucket's collisions only."""
    if n_planes % bands:
        raise ValueError("bands must divide n_planes")
    width = n_planes // bands
    first = ds.take(1)
    dim = len(first[0]["embedding"])
    planes = lsh_planes(dim, n_planes, seed)
    pref = ray.put(planes)
    shifts = np.arange(n_planes, dtype=np.uint64)

    def sign_bands(batch: "pa.Table"):
        import pyarrow as pa

        pl = ray.get(pref)
        mat = list_col_matrix(batch.column("embedding"))
        bits = (mat @ pl.T) > 0  # (n, n_planes)
        sig = (bits.astype(np.uint64) << shifts[None, :]).sum(axis=1)
        outs = []
        for b in range(bands):
            bv = (sig >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            t = batch.append_column("band_id", pa.array(np.full(len(sig), b), pa.int64()))
            t = t.append_column("band_val", pa.array(bv.astype(np.int64), pa.int64()))
            outs.append(t)
        import pyarrow as pa2

        return pa2.concat_tables(outs)

    banded = ds.map_batches(sign_bands, batch_format="pyarrow")

    from .relational import bucketed_group_map

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame | None:
        outs_a, outs_b, outs_c = [], [], []
        for _, grp in bucket.groupby(["band_id", "band_val"], sort=False):
            if len(grp) < 2:
                continue
            g = grp.drop_duplicates(id_col)
            ids = g[id_col].to_numpy()
            mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
            sims = mat @ mat.T
            ia, ib = np.triu_indices(len(ids), k=1)
            c = sims[ia, ib]
            keep = c >= threshold
            outs_a.append(np.minimum(ids[ia], ids[ib])[keep])
            outs_b.append(np.maximum(ids[ia], ids[ib])[keep])
            outs_c.append(c[keep])
        if not outs_a:
            return None
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(outs_a).astype("int64"),
                "vec_b": np.concatenate(outs_b).astype("int64"),
                "cosine": np.floor(np.concatenate(outs_c) * 1_000_000 + 0.5).astype(
                    "int64"
                ),
            }
        )

    cand = bucketed_group_map(
        banded, ["band_id", "band_val"], pairs_in_bucket, num_buckets=num_buckets
    )

    def distinct_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(ignore_index=True)

    return bucketed_group_map(cand, ["vec_a", "vec_b"], distinct_pairs, num_buckets=16)


def label_centroids(
    ds: ray.data.Dataset, label_col: str = "label", vec_col: str = "embedding"
) -> ray.data.Dataset:
    """Per-label embedding centroid — the k-means / IVF-training
    building block — in EXACT integer micro-units so the DuckDB oracle
    is bit-for-bit: each element is quantized ``floor(v·10^6 + 0.5)``
    BEFORE aggregation (integer sums are associative; float means are
    not — the same order-of-addition policy as the revenue queries),
    then ``centroid = floor(Σ/n)``.

    Scale shape: one partial pre-agg per batch (a (labels × dims) int
    matrix via ``np.add.at`` scatter — no per-row loop), so the shuffle
    carries O(labels·dims) rows per block regardless of corpus size;
    emitted long-form (label, dim, centroid_micro) for engine-agnostic
    comparison. ``dim`` is 1-based (SQL ``generate_subscripts``)."""
    from .relational import grouped_agg

    def partial(batch: pa.Table) -> "pd.DataFrame":
        import pandas as pd

        M = list_col_matrix(batch.column(vec_col))
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        if len(M) == 0 or M.size == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "dim": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        micro = np.floor(M * 1_000_000 + 0.5).astype(np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        L, d = len(uniq), micro.shape[1]
        sums = np.zeros((L, d), dtype=np.int64)
        np.add.at(sums, codes, micro)
        counts = np.bincount(codes, minlength=L).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(uniq.astype(np.int64), d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), L),
                "s": sums.ravel(),
                "n": np.repeat(counts, d),
            }
        )

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        [("s", "sum", "s"), ("n", "sum", "n")],
    )

    def finish(b):
        import pandas as pd

        return pd.DataFrame(
            {
                "label": b["label"].astype("int64"),
                "dim": b["dim"].astype("int64"),
                # int64 // floors, matching the oracle's FLOOR(double ratio)
                "centroid_micro": b["s"].to_numpy() // b["n"].to_numpy(),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")

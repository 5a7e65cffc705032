"""Range-clustered storage layout + zone-map data skipping.

At 100 TB the cheapest query is the one that never reads most files:
``cluster_write`` re-lays a dataset out as range-partitioned parquet on
one column (boundaries from the engine's EXACT distributed quantiles),
recording per-file min/max zone maps in ``_CLUSTER.json``;
``cluster_plan`` then resolves a value interval to the overlapping
files only, and ``cluster_read`` reads just those plus a residual
vectorized filter. The write is one hash exchange (each range bucket
folded and written by its owning task — the secondary-index shape) and
the manifest publishes atomically last, so a crashed write leaves
nothing visible.

This is the explicit form of what Delta/Iceberg call clustering/Z-order
(single-column case) — the companion to the hash layout the CDC table
uses: hash for point lookups by key, range for scans by measure.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from .pack import exact_quantiles
from .relational import bucketed_group_map, filter_batches

_META = "_CLUSTER.json"


def cluster_write(
    ds: ray.data.Dataset,
    root: str,
    column: str,
    num_files: int = 8,
) -> dict:
    """Write ``ds`` range-clustered on ``column`` (int64) into
    ``root/part-NNN.parquet`` with per-file zone maps. ``num_files``
    should be a power of two so the quantile fractions are float-exact.
    Null ``column`` rows land in bucket 0 (zone maps ignore them, so
    planning stays correct for non-null predicates)."""
    qs = [i / num_files for i in range(1, num_files)]
    bounds = exact_quantiles(ds, column, qs).column("value").to_numpy(
        zero_copy_only=False
    )
    os.makedirs(root, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        # cast through Arrow so nulls become NaN even for an ALL-null
        # block (whose to_numpy would otherwise yield object Nones)
        v = batch.column(column).cast(pa.float64()).to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, np.nan_to_num(v, nan=np.float64("-inf")), side="right")
        return batch.append_column("_range", pa.array(b.astype(np.int64)))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        stats = []
        for b, grp in g.groupby("_range", sort=False):
            b = int(b)
            out = grp.drop(columns=["_range"])
            path = os.path.join(root, f"part-{b:03d}.parquet")
            tmp = f"{path}.{os.getpid()}.tmp"
            pq.write_table(
                pa.Table.from_pandas(
                    out.sort_values(column, ignore_index=True), preserve_index=False
                ),
                tmp,
            )
            os.replace(tmp, path)
            nn = out[column].dropna()
            stats.append(
                {
                    "file": f"part-{b:03d}.parquet",
                    "rows": len(out),
                    "vmin": int(nn.min()) if len(nn) else None,
                    "vmax": int(nn.max()) if len(nn) else None,
                }
            )
        return pd.DataFrame(stats, columns=["file", "rows", "vmin", "vmax"])

    stats = bucketed_group_map(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["_range"],
        write_bucket,
        num_buckets=num_files,
    ).to_pandas()
    files = sorted(stats.to_dict("records"), key=lambda r: r["file"])
    meta = {"column": column, "files": files}
    tmp = os.path.join(root, ".meta.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _META))
    return {"root": root, "files": len(files), "rows": int(stats["rows"].sum())}


def cluster_plan(root: str, lo=None, hi=None) -> list[str]:
    """Files whose [vmin, vmax] zone overlaps [lo, hi] (None = open).

    An all-null zone is pruned only when a bound exists (nulls can't
    satisfy a range bound); an UNBOUNDED plan keeps it — null rows are
    part of a full scan (matches cluster_read's residual semantics)."""
    with open(os.path.join(root, _META)) as f:
        meta = json.load(f)
    bounded = lo is not None or hi is not None
    keep = []
    for rec in meta["files"]:
        if rec["vmin"] is None:  # all-null file
            if bounded:
                continue  # no non-null value can match a bound
            keep.append(os.path.join(root, rec["file"]))
            continue
        if lo is not None and rec["vmax"] < lo:
            continue
        if hi is not None and rec["vmin"] > hi:
            continue
        keep.append(os.path.join(root, rec["file"]))
    return keep


def _interleave16(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton-interleave two 16-bit rank spaces into one 32-bit z-value
    (vectorized bit spreading)."""

    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64) & np.uint64(0xFFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
        return x

    return (spread(a) << np.uint64(1)) | spread(b)


def zorder_write(
    ds: ray.data.Dataset,
    root: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
) -> dict:
    """Z-ORDER two int64 columns: each value maps to its 16-bit global
    RANK space (boundaries from the exact distributed quantiles — rank
    space, not value space, so skewed distributions still interleave
    evenly), ranks Morton-interleave into a z-value, files are z-ranges,
    and ``_CLUSTER.json`` records BOTH columns' min/max per file — a
    predicate on EITHER column (or both) prunes. The multi-dimensional
    upgrade of :func:`cluster_write`."""
    n_ranks = 256  # 8-bit rank per column is plenty for file-level zones
    qs = [i / n_ranks for i in range(1, n_ranks)]
    ba = exact_quantiles(ds, col_a, qs).column("value").to_numpy(zero_copy_only=False)
    bb = exact_quantiles(ds, col_b, qs).column("value").to_numpy(zero_copy_only=False)
    os.makedirs(root, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        va = batch.column(col_a).to_numpy(zero_copy_only=False)
        vb = batch.column(col_b).to_numpy(zero_copy_only=False)
        ra = np.searchsorted(ba, va, side="right")
        rb = np.searchsorted(bb, vb, side="right")
        z = _interleave16(ra, rb)
        # file = top bits of z (z-range partitioning)
        shift = np.uint64(max(0, 2 * 8 - int(np.log2(num_files))))
        b = (z >> shift).astype(np.int64) % num_files
        return batch.append_column("_range", pa.array(b))

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        stats = []
        for b, grp in g.groupby("_range", sort=False):
            b = int(b)
            out = grp.drop(columns=["_range"])
            path = os.path.join(root, f"part-{b:03d}.parquet")
            tmp = f"{path}.{os.getpid()}.tmp"
            pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
            os.replace(tmp, path)
            rec = {"file": f"part-{b:03d}.parquet", "rows": len(out)}
            for c, tag in ((col_a, "a"), (col_b, "b")):
                nn = out[c].dropna()
                rec[f"{tag}min"] = int(nn.min()) if len(nn) else None
                rec[f"{tag}max"] = int(nn.max()) if len(nn) else None
            stats.append(rec)
        return pd.DataFrame(
            stats, columns=["file", "rows", "amin", "amax", "bmin", "bmax"]
        )

    stats = bucketed_group_map(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["_range"],
        write_bucket,
        num_buckets=num_files,
    ).to_pandas()
    files = sorted(stats.to_dict("records"), key=lambda r: r["file"])
    meta = {"zorder": [col_a, col_b], "files": files}
    tmp = os.path.join(root, ".meta.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _META))
    return {"root": root, "files": len(files), "rows": int(stats["rows"].sum())}


def zorder_plan(
    root: str, a_lo=None, a_hi=None, b_lo=None, b_hi=None
) -> list[str]:
    """Files whose per-column zones overlap every requested interval.

    Null semantics: a null can never satisfy a range bound, so a file
    whose zone is all-null in a BOUNDED column is pruned — but an
    all-null zone in an UN-bounded column keeps the file, matching a
    plain ``filter`` over the same data (a one-sided query must not
    drop rows where the other column is null)."""
    with open(os.path.join(root, _META)) as f:
        meta = json.load(f)
    a_bounded = a_lo is not None or a_hi is not None
    b_bounded = b_lo is not None or b_hi is not None
    keep = []
    for rec in meta["files"]:
        if a_bounded and rec["amin"] is None:
            continue
        if b_bounded and rec["bmin"] is None:
            continue
        if a_lo is not None and rec["amax"] < a_lo:
            continue
        if a_hi is not None and rec["amin"] > a_hi:
            continue
        if b_lo is not None and rec["bmax"] < b_lo:
            continue
        if b_hi is not None and rec["bmin"] > b_hi:
            continue
        keep.append(os.path.join(root, rec["file"]))
    return keep


def zorder_read(
    root: str,
    a_lo=None,
    a_hi=None,
    b_lo=None,
    b_hi=None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Zone-pruned 2-D range scan + residual vectorized filter.

    Null semantics match a plain ``filter``: only columns that carry a
    bound require validity — a one-sided query keeps rows where the
    un-predicated column is null (see ``zorder_plan``)."""
    import pyarrow.compute as pc

    with open(os.path.join(root, _META)) as f:
        meta = json.load(f)
    col_a, col_b = meta["zorder"]
    files = zorder_plan(root, a_lo, a_hi, b_lo, b_hi)
    if not files:
        schema = pq.read_schema(os.path.join(root, meta["files"][0]["file"]))
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    ds = ray.data.read_parquet(files, columns=columns)

    def residual(t: pa.Table) -> pa.BooleanArray:
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        for c, lo, hi in ((col_a, a_lo, a_hi), (col_b, b_lo, b_hi)):
            if lo is None and hi is None:
                continue
            mask = pc.and_(mask, pc.is_valid(t.column(c)))
            if lo is not None:
                mask = pc.and_(mask, pc.greater_equal(t.column(c), lo))
            if hi is not None:
                mask = pc.and_(mask, pc.less_equal(t.column(c), hi))
        return mask

    return filter_batches(ds, residual)


def cluster_read(
    root: str, lo=None, hi=None, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Zone-map-pruned range scan: read only the overlapping files, then
    a residual vectorized filter for exactness at the boundaries."""
    import pyarrow.compute as pc

    with open(os.path.join(root, _META)) as f:
        meta = json.load(f)
    column = meta["column"]
    files = cluster_plan(root, lo, hi)
    if not files:
        schema = pq.read_schema(os.path.join(root, meta["files"][0]["file"]))
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    ds = ray.data.read_parquet(files, columns=columns)

    def residual(t: pa.Table) -> pa.BooleanArray:
        c = t.column(column)
        if lo is None and hi is None:  # unbounded scan keeps null rows
            return pa.array(np.ones(t.num_rows, dtype=bool))
        mask = pc.is_valid(c)
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(c, lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(c, hi))
        return mask

    return filter_batches(ds, residual)

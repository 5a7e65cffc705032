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
        v = batch.column(column).to_numpy(zero_copy_only=False)
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
    """Files whose [vmin, vmax] zone overlaps [lo, hi] (None = open)."""
    with open(os.path.join(root, _META)) as f:
        meta = json.load(f)
    keep = []
    for rec in meta["files"]:
        if rec["vmin"] is None:  # all-null file: no non-null value matches
            continue
        if lo is not None and rec["vmax"] < lo:
            continue
        if hi is not None and rec["vmin"] > hi:
            continue
        keep.append(os.path.join(root, rec["file"]))
    return keep


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
        mask = pc.is_valid(c)
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(c, lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(c, hi))
        return mask

    return filter_batches(ds, residual)

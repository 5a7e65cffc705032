"""Secondary (inverted) index over a payload column, maintained
INCREMENTALLY from the change-data-feed.

The committed table is hash-partitioned by ``conv_id`` — a point read
by any OTHER column (``tool``, ``role``…) is a full scan. This module
materializes ``{root}/indexes/{column}/`` mapping value → conv_id with
a per-pair turn count, hash-bucketed by value, so a lookup reads ONE
bucket file and then only the owning partitions of the matching
conversations (two bounded reads instead of a scan).

Why counts, not just pairs: incremental maintenance needs removals. A
conversation stops matching a value only when its LAST turn carrying
it goes away — the pre/post-image change feed (``table_changes``,
``pre_images=True``) yields exactly the ±1 per-turn deltas
(update_preimage/delete → −1 on the old value, update_postimage/insert
→ +1 on the new), and the index folds them in, pruning pairs at
count ≤ 0. Refresh cost scales with the CHANGE RATE, not table size —
the same IVM contract as ``incremental_conv_stats``, applied to an
access path. Epoch-stamped bucket files publish atomically per
refresh; the index manifest records the epoch the index reflects, and
a crashed refresh leaves the previous index intact.

Reference analog: CKAN datastore auto-indexes its key fields
(wprdc-etl delegates to Postgres); this is the explicit, incremental
version for a lake layout.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..errors import InvalidConfigError
from ..state.manifest import load_manifest
from .cdc import read_transcripts, table_changes

N_BUCKETS = 16


def _index_dir(table_root: str, column: str) -> str:
    return os.path.join(table_root, "indexes", column)


def _bucket_of(values: np.ndarray, n: int) -> np.ndarray:
    from ..stages.partition import hash_strings

    h = hash_strings(pa.array(values.astype(object), pa.string()))
    return (h % np.uint64(n)).astype(np.int64)


def _load_meta(idx_dir: str) -> dict | None:
    p = os.path.join(idx_dir, "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_buckets(idx_dir: str, pairs: "pa.Table", epoch: int) -> None:
    """One file per touched bucket, epoch in the name; meta.json flips
    last (atomic rename) so readers always see a complete epoch."""
    vals = pairs.column("value").to_numpy(zero_copy_only=False)
    bucket = _bucket_of(vals, N_BUCKETS)
    t = pairs.append_column("bucket", pa.array(bucket, pa.int64()))
    os.makedirs(idx_dir, exist_ok=True)
    for b in range(N_BUCKETS):
        sub = t.filter(pc.equal(t.column("bucket"), b)).drop_columns(["bucket"])
        pq.write_table(
            sub.sort_by([("value", "ascending"), ("conv_id", "ascending")]),
            os.path.join(idx_dir, f"bucket-{b:03d}-e{epoch:06d}.parquet"),
        )
    tmp = os.path.join(idx_dir, ".meta.tmp")
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "n_buckets": N_BUCKETS}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(idx_dir, "meta.json"))
    # drop superseded epoch files (the new meta no longer references them)
    for p in glob.glob(os.path.join(idx_dir, "bucket-*.parquet")):
        if not p.endswith(f"-e{epoch:06d}.parquet"):
            os.remove(p)


def build_index(table_root: str, column: str) -> dict:
    """Full build: distinct (value, conv_id, n_turns) from the live
    table — one narrow scan + one combiner groupby."""
    from ..functions.relational import grouped_agg

    manifest = load_manifest(table_root)
    if manifest is None:
        raise InvalidConfigError(f"no committed table at {table_root}")
    epoch = int(manifest["epoch"])
    ds = read_transcripts(table_root, columns=["conv_id", column])

    def narrow(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(column)))
        return pa.table(
            {
                "value": batch.column(column).cast(pa.string()),
                "conv_id": batch.column("conv_id"),
            }
        )

    pairs_ds = grouped_agg(
        ds.map_batches(narrow, batch_format="pyarrow"),
        ["value", "conv_id"],
        [("conv_id", "count", "n_turns")],
    )
    # index size = distinct (value, conv) pairs — driver-small by the
    # same argument as any group result here; at web scale route the
    # bucket writes through the resumable partitioned sink instead
    pairs = pa.Table.from_pandas(pairs_ds.to_pandas(), preserve_index=False)
    _write_buckets(_index_dir(table_root, column), pairs, epoch)
    return {"column": column, "epoch": epoch, "pairs": pairs.num_rows}


def refresh_index(table_root: str, column: str) -> dict:
    """Incremental refresh: fold the pre/post-image change feed since
    the index's epoch into the pair counts; prune pairs at ≤ 0.
    Cost O(change rate + index size), never a table rescan."""
    idx_dir = _index_dir(table_root, column)
    meta = _load_meta(idx_dir)
    if meta is None:
        return build_index(table_root, column)
    manifest = load_manifest(table_root)
    cur = int(manifest["epoch"])
    if cur <= meta["epoch"]:
        return {"column": column, "epoch": meta["epoch"], "refreshed": False}

    feed = table_changes(
        table_root, from_epoch=meta["epoch"], to_epoch=cur, pre_images=True
    ).to_pandas()
    import pandas as pd

    sign = feed["change_type"].map(
        {"insert": 1, "update_postimage": 1, "delete": -1, "update_preimage": -1}
    )
    df = pd.DataFrame(
        {"value": feed[column], "conv_id": feed["conv_id"], "d": sign}
    ).dropna(subset=["value"])
    delta = (
        df.groupby(["value", "conv_id"], as_index=False)["d"].sum()
        if len(df)
        else pd.DataFrame(columns=["value", "conv_id", "d"])
    )

    olds = [
        pq.read_table(p)
        for p in sorted(glob.glob(os.path.join(idx_dir, "bucket-*.parquet")))
    ]
    old = (
        pa.concat_tables(olds).to_pandas()
        if olds
        else pd.DataFrame(columns=["value", "conv_id", "n_turns"])
    )
    merged = old.merge(delta, on=["value", "conv_id"], how="outer")
    merged["n_turns"] = merged["n_turns"].fillna(0) + merged["d"].fillna(0)
    merged = merged[merged["n_turns"] > 0][["value", "conv_id", "n_turns"]]
    merged["n_turns"] = merged["n_turns"].astype("int64")
    pairs = pa.Table.from_pandas(merged, preserve_index=False)
    _write_buckets(idx_dir, pairs, cur)
    return {"column": column, "epoch": cur, "pairs": pairs.num_rows, "refreshed": True}


def index_lookup(table_root: str, column: str, value: str) -> list[str]:
    """conv_ids whose live rows carry ``value`` — reads ONE bucket file."""
    idx_dir = _index_dir(table_root, column)
    meta = _load_meta(idx_dir)
    if meta is None:
        raise InvalidConfigError(f"no index on {column!r}; build_index first")
    b = int(_bucket_of(np.array([value]), meta["n_buckets"])[0])
    files = glob.glob(os.path.join(idx_dir, f"bucket-{b:03d}-e*.parquet"))
    if not files:
        return []
    t = pq.read_table(files[0], columns=["value", "conv_id"])
    t = t.filter(pc.equal(t.column("value"), value))
    return sorted(t.column("conv_id").to_pylist())


def lookup_rows(table_root: str, column: str, value: str) -> pa.Table:
    """Index-accelerated point read: ONE bucket file resolves the
    matching conversations, then ``read_conversations`` fetches them
    with one parallel task per owning partition (each partition's files
    read once however many hits it holds) — two bounded reads, never a
    scan."""
    import ray as _ray

    from .cdc import read_conversations

    convs = index_lookup(table_root, column, value)
    if not convs:
        return pa.table({})
    refs = read_conversations(table_root, convs).to_arrow_refs()
    tables = [t for t in _ray.get(refs) if t.num_rows]
    t = pa.concat_tables(tables, promote_options="permissive")
    return t.filter(pc.equal(t.column(column).cast(pa.string()), value))

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

Scale shape (r03 verdict item 3): build and refresh both route through
the direct hash exchange — each index bucket is folded and WRITTEN by
the task that owns it, so no stage ever holds more than one bucket in
memory and the driver never sees an index-sized frame. Build pays one
exchange of per-batch-combined (value, conv_id, n) partials; refresh
exchanges only the delta (O(change rate)) and each touched bucket's
task reads its own previous-epoch file; untouched buckets are
hardlinked forward to the new epoch. Lookups read the exact epoch file
named by meta.json, so a crashed refresh's stray files are never
visible.

Reference analog: CKAN datastore auto-indexes its key fields
(wprdc-etl delegates to Postgres); this is the explicit, incremental
version for a lake layout.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..errors import InvalidConfigError
from ..state.manifest import load_manifest
from .cdc import read_transcripts, table_changes

N_BUCKETS = 16

_PAIR_SCHEMA = ["value", "conv_id", "n_turns"]


def _index_dir(table_root: str, column: str) -> str:
    return os.path.join(table_root, "indexes", column)


def _bucket_of(values: np.ndarray, n: int) -> np.ndarray:
    from ..stages.partition import hash_strings

    h = hash_strings(pa.array(values.astype(object), pa.string()))
    return (h % np.uint64(n)).astype(np.int64)


def _bucket_path(idx_dir: str, bucket: int, epoch: int) -> str:
    return os.path.join(idx_dir, f"bucket-{bucket:03d}-e{epoch:06d}.parquet")


def _load_meta(idx_dir: str) -> dict | None:
    p = os.path.join(idx_dir, "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _atomic_write(table: pa.Table, path: str) -> None:
    """Write-then-rename: retried bucket tasks (same epoch, same fold)
    race benignly — last rename wins with identical content."""
    tmp = f"{path}.{os.getpid()}.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _finalize_epoch(idx_dir: str, epoch: int, n_buckets: int = N_BUCKETS) -> None:
    """meta.json flips last (atomic rename) so readers always see a
    complete epoch; superseded epoch files are dropped after the flip."""
    tmp = os.path.join(idx_dir, ".meta.tmp")
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "n_buckets": n_buckets}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(idx_dir, "meta.json"))
    for p in glob.glob(os.path.join(idx_dir, "bucket-*.parquet")):
        if not p.endswith(f"-e{epoch:06d}.parquet"):
            os.remove(p)


def _pairs_table(df: pd.DataFrame) -> pa.Table:
    out = df.sort_values(["value", "conv_id"], ignore_index=True)
    return pa.table(
        {
            "value": pa.array(out["value"].astype(object), pa.string()),
            "conv_id": pa.array(out["conv_id"].astype(object), pa.string()),
            "n_turns": pa.array(out["n_turns"].to_numpy(np.int64), pa.int64()),
        }
    )


_EXCHANGE_COLS = ["value", "conv_id", "n_turns", "bucket"]


def _combine_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Same-schema idempotent combiner for the exchange actors: fold
    duplicate (value, conv_id) partials so receiver memory stays
    O(distinct pairs per bucket). Column ORDER is preserved so actor
    buffer concats stay schema-stable."""
    g = df.groupby(["bucket", "value", "conv_id"], as_index=False)["n_turns"].sum()
    return g[_EXCHANGE_COLS]


def _make_bucket_writer(idx_dir: str, epoch: int, old_epoch: int | None):
    """Per-exchange-bucket kernel: final-fold the (value, conv_id)
    counts, merge against the previous epoch's file when refreshing,
    prune at ≤ 0, write this bucket's new epoch file, and return ONE
    tiny stat row per index bucket. Task memory is O(one bucket)."""

    def write_buckets(df: pd.DataFrame) -> pd.DataFrame:
        stats = []
        for b, g in df.groupby("bucket", sort=False):
            b = int(b)
            folded = g.groupby(["value", "conv_id"], as_index=False)["n_turns"].sum()
            if old_epoch is not None:
                old_path = _bucket_path(idx_dir, b, old_epoch)
                if os.path.exists(old_path):
                    old = pq.read_table(old_path).to_pandas()
                    folded = old.merge(
                        folded,
                        on=["value", "conv_id"],
                        how="outer",
                        suffixes=("_old", "_d"),
                    )
                    folded["n_turns"] = folded["n_turns_old"].fillna(0) + folded[
                        "n_turns_d"
                    ].fillna(0)
                folded = folded[folded["n_turns"] > 0][_PAIR_SCHEMA]
                folded["n_turns"] = folded["n_turns"].astype("int64")
            _atomic_write(_pairs_table(folded), _bucket_path(idx_dir, b, epoch))
            stats.append({"bucket": b, "pairs": len(folded)})
        return pd.DataFrame(stats, columns=["bucket", "pairs"])

    return write_buckets


def build_index(table_root: str, column: str, n_buckets: int = N_BUCKETS) -> dict:
    """Full build: one narrow scan, per-batch partial (value, conv_id)
    counts, ONE hash exchange by index bucket; the owning task writes
    its bucket file directly. Nothing index-sized crosses the driver.
    ``n_buckets`` sizes the bucket files (raise it for high-cardinality
    indexed columns at scale); it is recorded in meta.json and every
    refresh/lookup honors the RECORDED value, so the module default can
    change without corrupting existing indexes."""
    from ..functions.relational import bucketed_group_map

    manifest = load_manifest(table_root)
    if manifest is None:
        raise InvalidConfigError(f"no committed table at {table_root}")
    epoch = int(manifest["epoch"])
    idx_dir = _index_dir(table_root, column)
    os.makedirs(idx_dir, exist_ok=True)
    ds = read_transcripts(table_root, columns=["conv_id", column])

    def narrow(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(column)))
        t = pa.table(
            {
                "value": batch.column(column).cast(pa.string()),
                "conv_id": batch.column("conv_id").cast(pa.string()),
            }
        )
        # per-batch combiner: only distinct pairs enter the exchange
        g = t.group_by(["value", "conv_id"]).aggregate([([], "count_all")])
        g = g.rename_columns(["value", "conv_id", "n_turns"])
        g = g.set_column(2, "n_turns", g.column("n_turns").cast(pa.int64()))
        b = _bucket_of(
            g.column("value").to_numpy(zero_copy_only=False), n_buckets
        )
        return g.append_column("bucket", pa.array(b, pa.int64()))

    pre = ds.map_batches(narrow, batch_format="pyarrow")

    stats = bucketed_group_map(
        pre,
        ["bucket"],
        _make_bucket_writer(idx_dir, epoch, old_epoch=None),
        num_buckets=n_buckets,
        pre_reduce=_combine_partials,
    ).to_pandas()
    _finalize_epoch(idx_dir, epoch, n_buckets=n_buckets)
    return {
        "column": column,
        "epoch": epoch,
        "pairs": int(stats["pairs"].sum()) if len(stats) else 0,
    }


def refresh_index(table_root: str, column: str) -> dict:
    """Incremental refresh: the pre/post-image change feed since the
    index's epoch is narrowed to signed (value, conv_id, ±1) deltas and
    exchanged by index bucket; each touched bucket's task folds its own
    previous-epoch file, prunes pairs at ≤ 0 and writes the new epoch
    file. Untouched buckets hardlink forward. Cost O(change rate + the
    touched buckets), never a table rescan or a driver-side index frame."""
    from ..functions.relational import bucketed_group_map

    idx_dir = _index_dir(table_root, column)
    meta = _load_meta(idx_dir)
    if meta is None:
        return build_index(table_root, column)
    manifest = load_manifest(table_root)
    cur = int(manifest["epoch"])
    old_epoch = int(meta["epoch"])
    if cur <= old_epoch:
        return {"column": column, "epoch": old_epoch, "refreshed": False}

    feed = table_changes(table_root, from_epoch=old_epoch, to_epoch=cur, pre_images=True)
    sign_map = {
        "insert": 1,
        "update_postimage": 1,
        "delete": -1,
        "update_preimage": -1,
    }

    # honor the bucket count the index was BUILT with (meta.json), not
    # the module default — they may differ after a default change
    n_buckets = int(meta.get("n_buckets", N_BUCKETS))

    def narrow_delta(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "value": batch[column],
                "conv_id": batch["conv_id"].astype(str),
                "n_turns": batch["change_type"].map(sign_map).astype("int64"),
            }
        ).dropna(subset=["value"])
        df["value"] = df["value"].astype(str)
        g = df.groupby(["value", "conv_id"], as_index=False)["n_turns"].sum()
        g["bucket"] = _bucket_of(g["value"].to_numpy(object), n_buckets)
        return g[_EXCHANGE_COLS]

    # materialize the narrowed delta (O(change rate)): its row count
    # gates the empty-feed short-circuit for free via block metadata
    delta = feed.map_batches(narrow_delta, batch_format="pandas").materialize()
    touched: set[int] = set()
    total = 0
    if delta.count():
        stats = bucketed_group_map(
            delta,
            ["bucket"],
            _make_bucket_writer(idx_dir, cur, old_epoch=old_epoch),
            num_buckets=n_buckets,
            pre_reduce=_combine_partials,
        ).to_pandas()
        touched = set(int(b) for b in stats["bucket"]) if len(stats) else set()
        total = int(stats["pairs"].sum()) if len(stats) else 0

    # carry untouched buckets into the new epoch (hardlink, copy fallback)
    for b in range(n_buckets):
        if b in touched:
            continue
        old_path = _bucket_path(idx_dir, b, old_epoch)
        if os.path.exists(old_path):
            new_path = _bucket_path(idx_dir, b, cur)
            try:
                os.link(old_path, new_path)
            except OSError:
                shutil.copyfile(old_path, new_path)
            total += pq.read_metadata(new_path).num_rows
    _finalize_epoch(idx_dir, cur, n_buckets=n_buckets)
    return {"column": column, "epoch": cur, "pairs": total, "refreshed": True}


def index_lookup(table_root: str, column: str, value: str) -> list[str]:
    """conv_ids whose live rows carry ``value`` — reads ONE bucket file
    (the exact epoch meta.json names; stray files from a crashed
    refresh are invisible)."""
    idx_dir = _index_dir(table_root, column)
    meta = _load_meta(idx_dir)
    if meta is None:
        raise InvalidConfigError(f"no index on {column!r}; build_index first")
    b = int(_bucket_of(np.array([value]), meta["n_buckets"])[0])
    path = _bucket_path(idx_dir, b, int(meta["epoch"]))
    if not os.path.exists(path):
        return []
    t = pq.read_table(path, columns=["value", "conv_id"])
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

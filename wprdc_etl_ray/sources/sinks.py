"""Resumable partitioned Parquet sink for generic operator outputs.

The CDC table gets resumability from its manifest; this is the
lightweight equivalent for one-shot operator pipelines at 100 TB: the
output is partitioned by a key column (one directory per partition,
``write_parquet(partition_cols=...)``), each completed partition gets a
``_SUCCESS-<part>`` marker, and a re-run SKIPS partitions whose marker
exists — a failed run resumes where it stopped instead of rewriting
everything, and no consumer ever sees a partition without its marker.

Contract: partition values must be stable across runs (hash-bucket ids,
dates, key ranges — not random). The unit of atomicity is a partition.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data


def _marker(out_dir: str, part: int | str) -> str:
    return os.path.join(out_dir, f"_SUCCESS-{part}")


def completed_partitions(out_dir: str) -> set[str]:
    return {
        os.path.basename(p)[len("_SUCCESS-"):]
        for p in glob.glob(os.path.join(out_dir, "_SUCCESS-*"))
    }


def resumable_write(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str,
    num_buckets: int | None = None,
) -> dict:
    """Write ``ds`` partitioned by ``partition_col``, skipping partitions
    already marked complete by a previous run.

    If ``num_buckets`` is given, a deterministic hash bucket of
    ``partition_col`` becomes the partition key (bounded directory
    count for high-cardinality keys). Returns
    ``{"written": [...], "skipped": [...]}``."""
    from ..functions.relational import add_bucket_multi

    os.makedirs(out_dir, exist_ok=True)
    key = partition_col
    if num_buckets is not None:
        ds = add_bucket_multi(ds, [partition_col], num_buckets, bucket_col="_part")
        key = "_part"

    done = completed_partitions(out_dir)

    # idempotence: a crashed previous attempt may have left PARTIAL
    # files in unmarked partition dirs; appending to them would
    # duplicate rows once the partition finally gets its marker. Clear
    # unmarked dirs first (they are invisible to readers by contract).
    import shutil as _shutil

    for d in glob.glob(os.path.join(out_dir, "data", "*=*")):
        if os.path.basename(d).split("=", 1)[1] not in done:
            _shutil.rmtree(d, ignore_errors=True)

    def drop_done(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        vals = batch.column(key).cast(pa.string()).to_numpy(zero_copy_only=False)
        mask = ~np.isin(vals, np.array(sorted(done), dtype=object))
        return batch.filter(pa.array(mask))

    pending = ds.map_batches(drop_done, batch_format="pyarrow") if done else ds
    # one directory per partition value; whole partitions land before
    # their marker is written
    pending.write_parquet(os.path.join(out_dir, "data"), partition_cols=[key])

    written = []
    for d in glob.glob(os.path.join(out_dir, "data", f"{key}=*")):
        part = os.path.basename(d).split("=", 1)[1]
        if part not in done:
            with open(_marker(out_dir, part), "w") as f:
                f.write("ok")
            written.append(part)
    return {"written": sorted(written), "skipped": sorted(done)}


def read_resumable(out_dir: str) -> ray.data.Dataset:
    """Read ONLY partitions whose completion marker exists (a crashed
    writer's partial partition stays invisible)."""
    done = completed_partitions(out_dir)
    files = [
        f
        for d in glob.glob(os.path.join(out_dir, "data", "*=*"))
        if os.path.basename(d).split("=", 1)[1] in done
        for f in glob.glob(os.path.join(d, "*.parquet"))
    ]
    if not files:
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(files)


def export_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    n_shards: int = 16,
    key_col: str = "doc_id",
) -> dict:
    """End-to-end training-shard export: deterministic global shuffle
    (``shuffle_rank`` — md5-rank permutation, no RNG) → ``shard = pos %
    n_shards`` → resumable partitioned write (one directory + _SUCCESS
    marker per shard). Re-runs skip completed shards; shard membership
    is a pure function of the key, so resumption is consistent.

    The payload rejoins the (key, pos) permutation via a partitioned
    hash join — only (key, 8-byte hash) rows move in the rank scan, the
    payload moves once into its shard. Returns the sink's
    {written, skipped} summary."""
    from ..functions.pack import shuffle_rank
    from ..functions.relational import hash_join

    ranked = shuffle_rank(ds.select_columns([key_col]), key_col=key_col)

    def to_shard(batch: pa.Table) -> pa.Table:
        import numpy as np

        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "shard": pa.array((pos % n_shards).astype(np.int64)),
            }
        )

    shards = ranked.map_batches(to_shard, batch_format="pyarrow")
    joined = hash_join(ds, shards, on=key_col)
    return resumable_write(joined, out_dir, partition_col="shard")

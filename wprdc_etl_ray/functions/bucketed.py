"""Bucketed co-partitioned storage joins: shuffle ONCE at write time,
join any number of times with ZERO shuffle.

The 100-TB join problem is rarely one join — it's the same key joined
over and over (docs ⋈ metadata, events ⋈ users, orders ⋈ customers)
where every `Dataset.join` pays a full all-to-all exchange of both
sides. The lakehouse answer (Hive bucketing / Iceberg bucket
transform / Spark bucketBy) is to pay the exchange once: write each
side hash-partitioned by the join key into the SAME bucket layout,
then bucket i of the left can only match bucket i of the right — a
join becomes an embarrassingly-parallel per-bucket local join, one
task per bucket, no data movement beyond the reads.

Built on the resumable partitioned sink (sources/sinks.py — per-bucket
``_SUCCESS`` markers make the expensive one-time write crash-safe) and
the engine-wide deterministic column hash (relational._column_hash, so
int/string/timestamp keys all bucket identically everywhere).

Scale shape: a join task's working set is (left_bytes + right_bytes) /
n_buckets — pick ``n_buckets`` so that fits a worker heap, exactly the
``num_partitions`` sizing rule the CDC table uses. Skewed keys: one
hot KEY still lands in one bucket (that is inherent to equi-joins);
mitigate by bucketing the OTHER columns too (higher n_buckets) or
broadcasting the small side instead (``relational.hash_join``).

Reference analog: wprdc-etl joins nothing (CKAN holds one table per
pipeline); this is the multi-table generalization its schema layer
gestures at.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def bucketed_write(
    ds: ray.data.Dataset,
    out_dir: str,
    key: str,
    n_buckets: int = 16,
) -> dict:
    """Hash-partition ``ds`` by ``key`` into ``n_buckets`` bucket dirs
    (``data/_part=N/``) under ``out_dir`` — the one-time exchange.
    Resumable: a re-run skips buckets already marked complete;
    ``_BUCKETS.json`` (layout + schema) lands LAST and is the
    whole-table completion marker joins require."""
    from ..schema import dataset_schema, schema_to_fields
    from ..sources.sinks import resumable_write

    schema = dataset_schema(ds)
    res = resumable_write(ds, out_dir, key, num_buckets=n_buckets)
    # record layout + schema: joins verify compatibility and can build
    # typed empty frames for buckets one side never touched
    import json

    meta = {
        "key": key,
        "n_buckets": n_buckets,
        "fields": schema_to_fields(schema),
    }
    with open(os.path.join(out_dir, "_BUCKETS.json"), "w") as f:
        json.dump(meta, f)
    return {"written": res.get("written", []), "skipped": res.get("skipped", []), "key": key, "n_buckets": n_buckets}


def _layout(path: str) -> dict:
    import json

    marker = os.path.join(path, "_BUCKETS.json")
    if not os.path.exists(marker):
        raise ValueError(
            f"{path} has no completed bucketed layout (_BUCKETS.json is "
            "written LAST by bucketed_write — a missing marker means the "
            "write never finished; re-run it, resumption skips done buckets)"
        )
    with open(marker) as f:
        return json.load(f)


def bucketed_join(
    left_dir: str,
    right_dir: str,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Join two bucketed tables written by :func:`bucketed_write` with
    the same bucket count — the join keys are the layouts' bucket keys
    (they may be differently-named columns of the same domain, e.g.
    ``o_custkey`` ⋈ ``c_custkey``). One Ray task per bucket, local hash
    join inside, no shuffle. ``how``: 'inner' or 'left'."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    ll, rl = _layout(left_dir), _layout(right_dir)
    if ll["n_buckets"] != rl["n_buckets"]:
        raise ValueError(
            f"bucket layouts differ: {ll['n_buckets']} vs {rl['n_buckets']}"
        )

    n = ll["n_buckets"]
    lkey, rkey = ll["key"], rl["key"]

    def join_bucket(batch: pa.Table) -> pa.Table:
        from ..schema import fields_to_schema

        def side(path: str, meta: dict, b, columns) -> "pa.Table":
            files = sorted(
                glob.glob(os.path.join(path, "data", f"_part={b}", "*.parquet"))
            )
            if not files:
                # typed empty frame: keeps every bucket's output schema
                # identical (zero-schema empty blocks poison downstream)
                t = fields_to_schema(meta["fields"]).empty_table()
                return t.select(columns) if columns else t
            return pa.concat_tables(
                [pq.read_table(p, columns=columns) for p in files],
                promote_options="permissive",
            )

        outs = []
        for b in batch.column("bucket").to_pylist():
            lt = side(left_dir, ll, b, left_columns).to_pandas()
            rt = side(right_dir, rl, b, right_columns).to_pandas()
            j = lt.merge(
                rt, how=how, left_on=lkey, right_on=rkey, suffixes=("", "__r")
            )
            if rkey != lkey and rkey in j.columns:
                j = j.drop(columns=[rkey])
            outs.append(pa.Table.from_pandas(j, preserve_index=False))
        return (
            pa.concat_tables(outs, promote_options="permissive")
            if len(outs) > 1
            else outs[0]
        )

    return ray.data.from_items([{"bucket": b} for b in range(n)]).map_batches(
        join_bucket, batch_format="pyarrow", batch_size=1
    )

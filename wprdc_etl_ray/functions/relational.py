"""Generic relational operator layer over ray.data.Dataset (SURVEY.md §2.3 X12).

The reference has no relational operators (confirm-absent, SURVEY.md
§2.1) — these exist because the north rule's correctness harness
exercises filters, projections, grouped aggregates, sorts/top-k, hash
joins, distinct, windowed aggregation and latest-event-wins over the
driver testdata tables. Every operator here is built scale-first:

- vectorized Arrow/pandas kernels inside ``map_batches`` (no row loops),
- broadcast (``ray.put``) small sides instead of shuffling big sides,
- partial pre-aggregation before ``groupby`` where it shrinks the
  shuffle,
- one explicit bucket key when keys must be co-located.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.partition import hash_strings


def read_table(
    sf_dir: str, name: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Column-pruned parquet read (only requested columns leave storage).

    Schema metadata is stripped at the source: pandas-written parquet
    carries b'pandas' schema metadata, which makes pa.Schema unhashable
    and defeats Ray's schema-dedup fast path in every downstream shuffle
    ('Failed to hash the schemas' warnings). The strip fuses into the
    read stage (zero-copy replace_schema_metadata)."""
    ds = ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


def filter_batches(ds: ray.data.Dataset, predicate) -> ray.data.Dataset:
    """Vectorized filter: ``predicate(pa.Table) -> BooleanArray``.

    Preferred over ``ds.filter(row_fn)`` which calls Python per row."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(predicate(batch))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_join(
    ds: ray.data.Dataset,
    small: pd.DataFrame,
    on: list[str] | str,
    how: str = "inner",
    right_on: list[str] | str | None = None,
) -> ray.data.Dataset:
    """Join a Dataset against a SMALL table without a shuffle: the small
    side is ``ray.put`` once and merged per batch (dimension tables,
    lookup maps). The big side streams; nothing is co-located."""
    ref = ray.put(small)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        if right_on is not None:
            out = batch.merge(s, how=how, left_on=on, right_on=right_on)
            drop = [c for c in (right_on if isinstance(right_on, list) else [right_on]) if c not in (on if isinstance(on, list) else [on])]
            return out.drop(columns=drop)
        return batch.merge(s, how=how, on=on)

    return ds.map_batches(fn, batch_format="pandas")


def semi_join(
    ds: ray.data.Dataset, keys: np.ndarray | set, column: str, anti: bool = False
) -> ray.data.Dataset:
    """Semi/anti join by broadcasting the key SET and filtering per batch.

    At 100 TB the broadcast side is a Bloom filter or sorted key array
    per executor; here an exact key set (``np.isin`` over Arrow-backed
    numpy) — same plumbing, no shuffle of the big side."""
    key_arr = np.asarray(sorted(keys)) if isinstance(keys, set) else np.unique(keys)
    ref = ray.put(key_arr)

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = batch.column(column).to_numpy(zero_copy_only=False)
        mask = np.isin(col, ks)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


# Ray 2.49 can emit zero-SCHEMA empty blocks from the native
# groupby().aggregate() hash path, the sort path backing map_groups, and
# count-based repartition (which forwards empty inputs and creates
# schema-less empties when rows < partitions). Zero-schema empties are
# invisible to map_batches (the batcher never yields a 0-row batch, so
# they can't be repaired in-stream) and crash acero inside Dataset.join
# when a join partition receives ONLY empty slices ("No match ... for
# key field reference" — CORRECTNESS_r03's corpus_freq_join failure,
# reproduced at num_cpus=32 / 16 partitions). Plans built ONLY from
# these row-preserving-or-filtering map ops over fresh reads provably
# carry no empties, so the common big-side input skips normalization
# and keeps streaming; anything else (aggregates, sorts, repartitions,
# pre-materialized InputData/From* whose provenance is unknowable)
# counts as hazardous.
_EMPTY_SAFE_OPS = frozenset(
    {"MapBatches", "MapRows", "Filter", "FlatMap", "Project", "Limit", "Union"}
)


def _may_emit_schemaless_empties(ds: ray.data.Dataset) -> bool:
    """Walk the logical plan; True unless every operator is a known-safe
    map op or a read. Unknown/unreadable plans count as hazardous."""
    try:
        stack = [ds._logical_plan.dag]
    except Exception:
        return True
    seen: set[int] = set()
    while stack:
        op = stack.pop()
        if id(op) in seen:
            continue
        seen.add(id(op))
        name = type(op).__name__
        if name not in _EMPTY_SAFE_OPS and not name.startswith("Read"):
            return True
        stack.extend(op.input_dependencies)
    return False


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize and rebuild the dataset from its non-empty blocks only.

    Block refs are filtered by METADATA row counts (no driver fetch —
    `from_arrow_refs` recomputes metadata in one tiny remote task per
    kept block, and it accepts pandas blocks despite the name). Used to
    sanitize aggregation outputs before `Dataset.join`; aggregated sides
    are small by construction, so the extra materialization is cheap
    relative to the join's own all-to-all exchange."""
    mat = ds.materialize()
    keep, dropped = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                keep.append(ref)
            else:
                dropped += 1
    if not dropped:
        return mat
    if not keep:
        # Entirely-empty input: nothing to join against. Hand back the
        # materialized dataset unchanged — the caller sees the same
        # (rare) empty-side behavior Dataset.join itself defines.
        return mat
    return ray.data.from_arrow_refs(keep)


def _key_hashes(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Combined uint64 hash of a (multi-)column key — the add_bucket_multi
    mix, exposed for bloom builds/probes so both sides hash identically."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in cols:
        h = h * np.uint64(0x100000001B3) ^ _column_hash(batch.column(c))
    return h


def build_key_bloom(ds: ray.data.Dataset, cols: list[str], bits_per_key: int = 16):
    """Bloom filter over one side's DISTINCT join-key hashes.

    The build side is narrowed to per-batch unique 8-byte hashes before
    anything reaches the driver (O(distinct keys) · 8 B — the build side
    of a bloom join is the SMALL side by definition, same contract as
    broadcast_join but what ships afterwards is O(bits), not the keys).
    """
    from .hashing import BloomFilter

    def per_batch(batch: pa.Table) -> pa.Table:
        h = np.unique(_key_hashes(batch, cols))
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    hdf = (
        ds.select_columns(cols)
        .map_batches(per_batch, batch_format="pyarrow")
        .to_pandas()
    )
    hs = np.unique(hdf["h"].to_numpy(np.int64).view(np.uint64))
    bf = BloomFilter(max(1, len(hs)), bits_per_key=bits_per_key)
    bf.add(hs)
    return bf


def bloom_semi_filter(
    ds: ray.data.Dataset, bloom, cols: list[str]
) -> ray.data.Dataset:
    """Keep only rows whose key MIGHT exist in the bloom (superset —
    FPs pass through; callers that need exactness resolve them
    downstream, e.g. the join itself)."""
    ref = ray.put(bloom)

    def fn(batch: pa.Table) -> pa.Table:
        bf = ray.get(ref)
        return batch.filter(pa.array(bf.contains(_key_hashes(batch, cols))))

    return ds.map_batches(fn, batch_format="pyarrow")


def bloom_anti_filter(
    ds: ray.data.Dataset, bloom, cols: list[str]
) -> ray.data.Dataset:
    """Keep only rows whose key is DEFINITELY absent from the bloom
    (a Bloom filter has no false negatives, so these rows are exact
    keeps for an anti join; rows the bloom accepts still need an exact
    membership check — see :func:`anti_join_keys`)."""
    ref = ray.put(bloom)

    def fn(batch: pa.Table) -> pa.Table:
        bf = ray.get(ref)
        return batch.filter(pa.array(~bf.contains(_key_hashes(batch, cols))))

    return ds.map_batches(fn, batch_format="pyarrow")


def anti_join_keys(
    big: ray.data.Dataset,
    keys,
    column: str,
    broadcast_cap: int = 5_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Exact anti join: drop ``big`` rows whose ``column`` appears in
    ``keys``.

    ``keys`` may be a numpy array / set (always broadcast via
    ``semi_join(anti=True)``) or a single-column key Dataset. A Dataset
    key side is counted first: at or under ``broadcast_cap`` keys it
    collapses to the broadcast path (one ``ray.put`` array, zero
    shuffle of the big side — an int64 drop list at the 5 M default is
    40 MB, well inside one executor's heap). Above the cap the big side
    splits by a Bloom filter built from the key hashes: bloom-rejected
    rows are DEFINITE keeps and stream through with no shuffle (no
    false negatives), while the small candidate slice (true matches +
    the bloom's ~0.01% false positives) resolves exactly through a
    ``left_outer`` hash join against the key Dataset, keeping unmatched
    rows. The union equals the broadcast path's row set exactly — the
    bloom only routes, the join decides."""
    if not isinstance(keys, ray.data.Dataset):
        return semi_join(big, keys, column, anti=True)

    keys = keys.materialize()  # counted AND consumed: avoid lazy re-exec
    n_keys = keys.count()
    if n_keys == 0:
        return big  # nothing to drop (schema probing on empties is moot)
    kcol = keys.schema().names[0]
    if n_keys <= broadcast_cap:
        arr = keys.to_pandas()[kcol].to_numpy()
        return semi_join(big, arr, column, anti=True)

    bloom = build_key_bloom(keys, [kcol])
    definite = bloom_anti_filter(big, bloom, [column])
    cand = bloom_semi_filter(big, bloom, [column])

    def mark(b: pa.Table) -> pa.Table:
        t = pa.table({column: b.column(kcol)})
        return t.append_column("_aj_m", pa.array(np.ones(b.num_rows, np.int64)))

    marker = keys.map_batches(mark, batch_format="pyarrow")
    joined = hash_join(
        cand, marker, on=column, join_type="left_outer",
        num_partitions=num_partitions,
    )
    orig_cols = big.schema().names

    def keep_unmatched(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return b.filter(_pc.is_null(b.column("_aj_m"))).select(orig_cols)

    fp_keeps = joined.map_batches(keep_unmatched, batch_format="pyarrow")
    return definite.select_columns(orig_cols).union(fp_keeps)


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Drop Arrow schema metadata before a Ray hash shuffle. Blocks that
    originated as pandas DataFrames carry b'pandas' schema metadata, and
    a pa.Schema WITH metadata is unhashable ("unhashable type: 'dict'"),
    so every slice concat inside HashShuffleAggregator logs 'Failed to
    hash the schemas (for deduplication)' and skips unify's early-exit.
    replace_schema_metadata is zero-copy; measured via ds.stats() at
    sf0.1 the stage runs as its own task-pool op (Ray doesn't fuse it
    past SplitBlocks) at ~6 ms mean remote wall per block — noise next
    to the join's all-to-all, and it buys back unify's hash-dedup fast
    path in every downstream concat."""
    return batch.replace_schema_metadata(None) if batch.schema.metadata else batch


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
    normalize: bool | str = "auto",
    bloom_prefilter: str | None = None,
) -> ray.data.Dataset:
    """Partitioned hash join of two large Datasets (``Dataset.join`` —
    hash-partitioned on the key, Ray 2.49).

    ``bloom_prefilter="right"`` builds a Bloom filter over the RIGHT
    side's distinct key hashes and drops left rows that cannot match
    BEFORE the all-to-all exchange ("left" is symmetric) — the classic
    bloom join: when the probe side is selective, most of the big side
    never leaves its node, and the join itself resolves the bloom's
    false positives, so the result is exactly the plain join's. INNER
    joins only (outer joins must keep unmatched rows).

    ``num_partitions`` is clamped to the cluster's CPU count: the join
    spawns one aggregator ACTOR per partition, and requesting more
    actors than schedulable slots DEADLOCKS a small cluster (observed:
    64 partitions on 8 CPUs never finishes). On a big cluster the
    requested partition count passes through unchanged.

    ``normalize`` hardens the inputs against Ray's zero-schema empty
    blocks (see _SCHEMALESS_EMPTY_PRODUCERS): "auto" (default) inspects
    each side's logical plan and drops empty blocks only from sides
    that could carry them; True forces both sides; False skips (only
    when the caller guarantees exchange-produced inputs, e.g.
    bucketed_group_map output, which never emits empties)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    r_cols = (
        on_cols
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    if bloom_prefilter is not None:
        if join_type != "inner":
            raise ValueError("bloom_prefilter requires an inner join")
        if bloom_prefilter == "right":
            left = bloom_semi_filter(left, build_key_bloom(right, r_cols), on_cols)
        elif bloom_prefilter == "left":
            right = bloom_semi_filter(right, build_key_bloom(left, on_cols), r_cols)
        else:
            raise ValueError(f"bloom_prefilter must be 'left'/'right', got {bloom_prefilter!r}")
    if normalize == "auto":
        if _may_emit_schemaless_empties(left):
            left = drop_empty_blocks(left)
        if _may_emit_schemaless_empties(right):
            right = drop_empty_blocks(right)
    elif normalize:
        left = drop_empty_blocks(left)
        right = drop_empty_blocks(right)
    left = left.map_batches(_strip_schema_metadata, batch_format="pyarrow")
    right = right.map_batches(_strip_schema_metadata, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", num_partitions) or num_partitions)
    num_partitions = max(1, min(num_partitions, cpus))
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_t,
    )


def add_bucket(
    ds: ray.data.Dataset, column: str, num_buckets: int, bucket_col: str = "_bucket"
) -> ray.data.Dataset:
    """Append a deterministic hash-bucket column (the ONE partitioning
    key reused across co-location-sensitive stages)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if pa.types.is_integer(col.type):
            b = (
                col.to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
            ) % np.uint64(num_buckets)
        else:
            b = hash_strings(col) % np.uint64(num_buckets)
        return batch.append_column(bucket_col, pa.array(b.astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _column_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of one Arrow column (int/float/string/
    bool) — vectorized, no pandas conversion. Null keys hash as a fill
    value (all nulls co-locate — required for group correctness; they
    merely share a bucket with the fill value's hash)."""
    if pa.types.is_null(col.type):
        # an ALL-null block arrives untyped (e.g. a pandas NaN slice):
        # hash as the numeric fill value so it co-locates with nulls in
        # typed numeric blocks (string keys that are entirely null per
        # block are not supported as grouping keys)
        v = np.zeros(len(col), dtype=np.uint64)
        return (v + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    if col.null_count:
        col = col.fill_null("" if pa.types.is_string(col.type) else 0)
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return hash_strings(col)
    if pa.types.is_floating(t):
        f = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
        # canonicalize before bit-viewing: -0.0 == 0.0 under groupby but
        # has different bits (collapse via +0.0), and every NaN payload
        # must land in one bucket (rewrite to the canonical np.nan)
        f = f + 0.0
        if np.isnan(f).any():
            f = np.where(np.isnan(f), np.float64("nan"), f)
        v = f.view(np.uint64)
    elif pa.types.is_timestamp(t):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    return (v + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)


def add_bucket_multi(
    ds: ray.data.Dataset,
    columns: list[str],
    num_buckets: int,
    bucket_col: str = "_bucket",
) -> ray.data.Dataset:
    """Deterministic hash bucket over a multi-column key — Arrow-native
    (stays ``batch_format="pyarrow"`` so list/binary payload columns
    never round-trip through pandas object/tensor encodings)."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.schema.metadata:
            # pandas-origin blocks carry b'pandas' schema metadata, which
            # makes pa.Schema unhashable and defeats Ray's schema-dedup
            # in every downstream concat (see _strip_schema_metadata) —
            # shed it here, upstream of ALL exchange traffic
            batch = batch.replace_schema_metadata(None)
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in columns:
            h = h * np.uint64(0x100000001B3) ^ _column_hash(batch.column(c))
        b = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column(bucket_col, pa.array(b))

    return ds.map_batches(fn, batch_format="pyarrow")


@ray.remote(num_cpus=0)
class _HashExchangeActor:
    """Zero-CPU receiving end of the GENERIC direct hash exchange — the
    CDC exchange pattern (pipelines/cdc.py::_ExchangeActor) generalized
    to arbitrary keyed group-maps: upstream tasks ``ray.put`` each
    bucketed Arrow batch ONCE; every actor zero-copy-reads it and takes
    only its own buckets (``_bucket % A == aid``). Replaces Ray's
    sort-based ``groupby`` for co-location-only shuffles — no global
    sort, one data movement.

    Receiver memory is BOUNDED three ways (the CDC exchange's combiner
    idea generalized):

    - buffers are kept PER BUCKET (``_bucket`` stripped at arrival);
    - an optional ``pre_reduce`` combiner (a pandas kernel with the
      same in/out schema, idempotent under re-application — e.g. local
      top-k / arg-max / drop_duplicates) compacts any bucket whose
      buffer exceeds ``compact_rows``, keeping reducible exchanges at
      O(result) memory;
    - non-reducible buckets SPILL to node-local parquet once the
      actor's total buffered rows exceed ``spill_rows`` — actor heap
      stays O(spill_rows · row width); finalize re-reads one bucket at
      a time, so peak memory during finalize is O(largest bucket), not
      O(actor share).

    ``finalize`` is a STREAMING GENERATOR: it yields one output table
    per bucket (owned by the caller — generator yields are task
    returns), never concatenating the whole share or converting it to
    pandas in one shot.

    Actors live in a WARM session pool (``_exchange_pool``) and are
    reused across calls — process spawn cost is paid once per Ray
    session, not once per operator invocation. Per-call state is keyed
    by a unique ``tag`` (``begin``/``abort`` bracket a run, so a failed
    run cannot pin its buffers in the session-lifetime actors)."""

    def __init__(self):
        self.runs: dict[str, dict] = {}
        # session-lifetime counters (observability: tests + memory audits)
        self.n_spills = 0
        self.n_compactions = 0

    def lifetime_stats(self) -> dict:
        return {"spills": self.n_spills, "compactions": self.n_compactions}

    def begin(
        self,
        tag: str,
        pre_reduce=None,
        compact_rows: int = 500_000,
        spill_rows: int = 4_000_000,
    ) -> bool:
        self.runs[tag] = {
            "buckets": {},  # bucket_id -> list[pa.Table] (no _bucket col)
            "rows": {},  # bucket_id -> in-memory buffered rows
            "spills": {},  # bucket_id -> list[parquet path]
            "total": 0,
            "pre_reduce": pre_reduce,
            "compact_rows": compact_rows,
            "spill_rows": spill_rows,
            "spill_dir": None,
            "seq": 0,
        }
        return True

    def _compact_bucket(self, st: dict, bid: int) -> None:
        allt = pa.concat_tables(st["buckets"][bid], promote_options="permissive")
        out = st["pre_reduce"](allt.to_pandas())
        t = pa.Table.from_pandas(out, preserve_index=False)
        st["total"] -= st["rows"][bid] - t.num_rows
        st["buckets"][bid] = [t]
        st["rows"][bid] = t.num_rows
        self.n_compactions += 1

    def _spill_bucket(self, tag: str, st: dict, bid: int) -> None:
        import os
        import tempfile

        import pyarrow.parquet as pq

        if st["spill_dir"] is None:
            st["spill_dir"] = tempfile.mkdtemp(prefix=f"xchg-{tag}-")
        st["seq"] += 1
        path = os.path.join(st["spill_dir"], f"b{bid}-{st['seq']}.parquet")
        allt = pa.concat_tables(st["buckets"][bid], promote_options="permissive")
        pq.write_table(allt, path)
        st["spills"].setdefault(bid, []).append(path)
        st["total"] -= st["rows"][bid]
        st["buckets"][bid] = []
        st["rows"][bid] = 0
        self.n_spills += 1

    def _maybe_bound(self, tag: str, st: dict) -> None:
        if st["pre_reduce"] is not None:
            for bid, n in st["rows"].items():
                if n >= st["compact_rows"] and len(st["buckets"][bid]) > 1:
                    self._compact_bucket(st, bid)
        while st["total"] >= st["spill_rows"]:
            bid = max(st["rows"], key=st["rows"].get)
            if st["rows"][bid] == 0:
                break
            self._spill_bucket(tag, st, bid)

    def apply_shared(self, tag: str, t: pa.Table, aid: int, num_actors: int) -> int:
        st = self.runs[tag]
        b = t.column("_bucket").to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(b % num_actors == aid)
        if len(idx) == 0:
            return 0
        mine = t.take(pa.array(idx))
        mb = b[idx]
        order = np.argsort(mb, kind="stable")
        mine = mine.take(pa.array(order)).drop_columns(["_bucket"])
        # drop schema metadata: pandas-extension entries don't survive
        # worker boundaries (and unhashable metadata defeats Ray's
        # schema dedup — the "Failed to hash the schemas" noise)
        mine = mine.replace_schema_metadata(None)
        mbs = mb[order]
        bounds = np.flatnonzero(np.r_[True, mbs[1:] != mbs[:-1]])
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(mbs)
            bid = int(mbs[s])
            st["buckets"].setdefault(bid, []).append(mine.slice(s, e - s))
            st["rows"][bid] = st["rows"].get(bid, 0) + int(e - s)
        st["total"] += int(len(idx))
        self._maybe_bound(tag, st)
        return int(len(idx))

    def finalize(self, tag: str, fn):
        """Yield one output table per owned bucket (streaming — peak
        memory is one bucket, not the actor's whole share)."""
        import pyarrow.parquet as pq

        st = self.runs.pop(tag)
        try:
            bids = sorted(set(st["buckets"]) | set(st["spills"]))
            for bid in bids:
                tables = [pq.read_table(p) for p in st["spills"].pop(bid, [])]
                tables += st["buckets"].pop(bid, [])
                if not tables:
                    continue
                allt = pa.concat_tables(tables, promote_options="permissive")
                del tables
                r = fn(allt.to_pandas())
                if r is not None and len(r):
                    yield pa.Table.from_pandas(r, preserve_index=False)
        finally:
            self._cleanup(st)

    @staticmethod
    def _cleanup(st: dict) -> None:
        import os
        import shutil

        for paths in st["spills"].values():
            for p in paths:
                try:
                    os.unlink(p)
                except OSError:
                    pass
        if st["spill_dir"]:
            shutil.rmtree(st["spill_dir"], ignore_errors=True)

    def abort(self, tag: str) -> bool:
        """Drop a failed run's buffers + spill files (called from the
        driver's try/finally — warm actors outlive the run, so state
        must not outlive it)."""
        st = self.runs.pop(tag, None)
        if st is not None:
            self._cleanup(st)
        return True

    def ping(self) -> bool:
        return True

    def debug_state(self) -> dict:
        """Test/ops hook: per-run buffered rows + spill file counts."""
        return {
            tag: {
                "total": st["total"],
                "rows": dict(st["rows"]),
                "spill_files": sum(len(v) for v in st["spills"].values()),
            }
            for tag, st in self.runs.items()
        }


_POOL: list = []
_POOL_TAG = [0]


def _exchange_pool(n: int) -> list:
    """Warm pool of generic exchange actors for this Ray session;
    created on first use, revived if the session restarted."""
    global _POOL
    if _POOL:
        try:
            ray.get(_POOL[0].ping.remote())
        except Exception:
            _POOL = []
    while len(_POOL) < n:
        _POOL.append(_HashExchangeActor.remote())
    return _POOL[:n]


# measured generic crossover (BASELINE.md "generic exchange auto"): with
# the warm pool, the direct exchange beats Ray's sort-based groupby well
# below the CDC path's 8M crossover; sort only wins when the whole input
# is a handful of blocks. Re-measured each round.
GENERIC_SORT_MAX_ROWS = 100_000


def _planned_rows(ds: ray.data.Dataset) -> int | None:
    """Row count from plan METADATA only (no execution) — parquet
    footers / in-memory blocks; None when a transform hides the count.

    ``_meta_count`` goes blind behind ANY map stage — including
    ``read_table``'s fused metadata-strip — so fall back to walking the
    logical plan through MapBatches/Project down to a Read whose
    parquet-footer metadata knows its row count. A map stage that
    FILTERS (filter_batches is a MapBatches) makes this an UPPER bound,
    which only ever biases exchange='auto' toward 'direct' — exactly
    the choice the old None reading forced, so the walk is never worse
    and restores the 'sort' fast path for genuinely small reads."""
    try:
        n = ds._meta_count()
        if n is not None:
            return n
    except Exception:
        pass
    try:
        op = ds._logical_plan.dag
        while type(op).__name__ in ("MapBatches", "Project") and op.input_dependencies:
            if len(op.input_dependencies) != 1:
                return None
            op = op.input_dependencies[0]
        if type(op).__name__.startswith("Read"):
            metas = getattr(op._datasource, "_metadata", None)
            if metas:
                n = sum(int(m.num_rows) for m in metas)
                return n
        return None
    except Exception:
        return None


def bucketed_group_map(
    ds: ray.data.Dataset,
    key_cols: list[str],
    fn_pandas,
    num_buckets: int = 64,
    exchange: str = "auto",
    num_actors: int | None = None,
    pre_reduce=None,
    compact_rows: int = 500_000,
    spill_rows: int = 4_000_000,
    planned_rows: int | None = None,
) -> ray.data.Dataset:
    """Scalable groupby-apply: hash-bucket the key space into
    ``num_buckets`` coarse groups (ONE kernel invocation per bucket —
    not per key), and run a vectorized pandas groupby inside the bucket.

    Ray's ``groupby(key).map_groups(fn)`` invokes ``fn`` once per
    distinct key — per-group Python overhead dominates when keys number
    in the millions. This keeps the same co-location guarantee (all rows
    of a key share a bucket) with O(num_buckets) kernel invocations.
    ``fn_pandas`` receives one bucket's rows and must do its own
    ``groupby(key_cols)``.

    ``exchange="direct"`` routes batches straight to zero-CPU receiver
    actors keyed by bucket — the merge only needs CO-LOCATION, and Ray's
    groupby pays for a full range sort it doesn't need. The result is
    returned as a Dataset over the actors' per-bucket output blocks
    (object store, not driver). ``exchange="sort"`` keeps the plain Ray
    groupby (most general — lazy, no actors, retry-idempotent).
    ``exchange="auto"`` (default) picks sort for small inputs (planned
    size from ``planned_rows`` or plan metadata; unknown → direct,
    since the warm pool makes direct the winner at every measured
    scale above tiny inputs).

    Receiver memory: pass ``pre_reduce`` (same-schema idempotent
    combiner, e.g. the per-bucket kernel itself for top-k / arg-max /
    distinct) to keep reducible exchanges at O(result) actor memory;
    non-reducible buckets spill to node-local parquet past
    ``spill_rows`` total buffered rows per actor (finalize re-reads one
    bucket at a time). Fault model: the routing stage runs with
    ``max_retries=0`` — a mid-route worker loss fails the exchange
    (state is aborted in the driver's finally) instead of silently
    re-applying a batch to the stateful receivers; callers retry the
    whole operator, which is idempotent."""
    if exchange == "auto":
        n = planned_rows if planned_rows is not None else _planned_rows(ds)
        exchange = "sort" if (n is not None and n <= GENERIC_SORT_MAX_ROWS) else "direct"

    bucketed = add_bucket_multi(ds, key_cols, num_buckets)

    if exchange == "sort":

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return fn_pandas(g.drop(columns=["_bucket"]))

        return bucketed.groupby("_bucket").map_groups(
            per_bucket, batch_format="pandas"
        )

    A = num_actors or min(num_buckets, 16)
    actors = _exchange_pool(A)
    _POOL_TAG[0] += 1
    tag = f"x{_POOL_TAG[0]}"
    ray.get(
        [a.begin.remote(tag, pre_reduce, compact_rows, spill_rows) for a in actors]
    )

    def route(batch: pa.Table) -> pa.Table:
        bref = ray.put(batch)
        refs = [a.apply_shared.remote(tag, bref, i, A) for i, a in enumerate(actors)]
        n = sum(ray.get(refs))  # ack = backpressure
        return pa.table({"n": pa.array([n], pa.int64())})

    refs: list = []
    ok = False
    try:
        # max_retries=0: routing is a stateful side effect — see docstring
        bucketed.map_batches(
            route, batch_format="pyarrow", max_retries=0
        ).take_all()  # counts only
        gens = [a.finalize.remote(tag, fn_pandas) for a in actors]
        for g in gens:  # all actors stream concurrently; drain in order
            refs.extend(list(g))
        ok = True
    finally:
        if not ok:  # failed run: drop buffers/spills in the warm actors
            for a in actors:
                try:
                    a.abort.remote(tag)
                except Exception:
                    pass
    if not refs:
        # empty result: derive the output schema from the kernel itself;
        # kernels that cannot process an empty frame yield a 0-column
        # empty Dataset (consumers see 0 rows either way)
        try:
            empty_in = pd.DataFrame(
                {
                    f.name: pd.Series([], dtype="object")
                    for f in bucketed.schema().base_schema
                }
            ).drop(columns=["_bucket"])
            out = fn_pandas(empty_in)
            if out is None:
                out = pd.DataFrame()
        except Exception:
            out = pd.DataFrame()
        return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
    return ray.data.from_arrow_refs(refs)


def salted_group_map(
    ds: ray.data.Dataset,
    key_cols: list[str],
    fn_assoc,
    num_buckets: int = 64,
    salt: int = 8,
    **kw,
) -> ray.data.Dataset:
    """Skew-resistant groupby-apply for ASSOCIATIVE kernels.

    ``bucketed_group_map`` puts ALL rows of a key in one bucket — one
    hot key (a viral conversation, a null-heavy join key) serializes
    into a single task and sets the stage's wall time. When the kernel
    is an associative same-schema combiner (``fn(concat(fn(a), fn(b)))
    == fn(a ++ b)`` — sums, counts, min/max, arg-min/max with carried
    ordering tuples, top-k), the key can be SPLIT: a ``_salt`` sub-key
    (row position mod ``salt``) spreads each key's rows across up to
    ``salt`` buckets, phase 1 computes partials per (key, salt) with the
    kernel itself as ``pre_reduce``, and phase 2 recombines the tiny
    partials per key with the same kernel — byte-equal to the unsalted
    result (equality-tested under zipf skew;
    ``scripts/salt_skew_probe.py`` records the wall-time evidence).

    Cost: one extra exchange over O(keys × salt) PARTIAL rows — noise
    next to the row-stream exchange it parallelizes. Use for associative
    kernels under known skew; keep plain ``bucketed_group_map`` for
    order-sensitive kernels (sessionize, rolling windows, rank), whose
    semantics need every row of a key in one place."""
    if "pre_reduce" in kw:
        raise ValueError(
            "salted_group_map supplies the kernel itself as pre_reduce; "
            "pass an associative fn_assoc instead"
        )
    if salt < 2:
        return bucketed_group_map(
            ds, key_cols, fn_assoc, num_buckets=num_buckets,
            pre_reduce=fn_assoc, **kw,
        )

    def add_salt(batch: pa.Table) -> pa.Table:
        s = np.arange(batch.num_rows, dtype=np.int64) % salt
        return batch.append_column("_salt", pa.array(s))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def k1(g: pd.DataFrame) -> pd.DataFrame:
        cols = g.columns.tolist()
        out = fn_assoc(g.drop(columns=["_salt"])).copy()
        # keep the exchange's same-schema invariant so k1 re-enters as
        # its own pre_reduce (partials of partials are still partials)
        out["_salt"] = np.int64(0)
        return out[cols]

    partials = bucketed_group_map(
        salted, key_cols + ["_salt"], k1,
        num_buckets=num_buckets, pre_reduce=k1, **kw,
    )
    unsalted = partials.map_batches(
        lambda t: t.drop_columns(["_salt"]), batch_format="pyarrow"
    )
    # phase 2 folds O(keys × salt) partial rows — a tiny exchange;
    # caller overrides (exchange, num_actors, spill_rows, ...) apply to
    # BOTH phases so an explicit exchange= choice governs the whole plan
    return bucketed_group_map(
        unsalted, key_cols, fn_assoc,
        num_buckets=num_buckets, pre_reduce=fn_assoc, **kw,
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: str,
    num_buckets: int = 32,
    suffix: str = "_r",
    direction: str = "backward",
) -> ray.data.Dataset:
    """As-of join: for each left row, the right row with the same ``by``
    key that is LATEST at-or-before (``direction="backward"``, default),
    EARLIEST at-or-after (``"forward"``) or closest (``"nearest"``) in
    ``on``; exact matches allowed; unmatched left rows keep nulls — the
    temporal event-to-dimension join Ray Data has no native operator
    for.

    Composition (the documented custom-operator pattern): tag the two
    streams, ONE hash shuffle on ``by`` (direct exchange via
    bucketed_group_map), vectorized ``pd.merge_asof`` inside each
    bucket. Partitioning assumption: every row of one ``by`` key lands
    in one bucket — guaranteed by the hash bucket; per-task memory is
    O(bucket rows), so size num_buckets to the cluster. Right columns
    clashing with left names get ``suffix``."""
    lschema = left.schema().base_schema
    lnames = list(lschema.names)
    rnames = list(right.schema().base_schema.names)
    clash = [c for c in rnames if c in lnames and c not in (on, by)]
    r_out = [c + suffix if c in clash else c for c in rnames if c not in (on, by)]
    # the union's permissive concat null-fills each side's missing
    # columns, which floats left int columns in pandas — restore the
    # left dtypes inside the bucket (left rows themselves have no
    # injected nulls)
    if isinstance(lschema, pa.Schema):
        ldtypes = dict(lschema.empty_table().to_pandas().dtypes.items())
    else:  # PandasBlockSchema (names, types)
        ldtypes = dict(zip(lschema.names, lschema.types))

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_side"] = np.int8(0)
        return batch

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.rename(columns={c: c + suffix for c in clash})
        batch["_side"] = np.int8(1)
        return batch

    both = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket[bucket["_side"] == 0][lnames].sort_values(on, kind="stable")
        for c, dt in ldtypes.items():
            if str(l[c].dtype) != str(dt):
                try:
                    l[c] = l[c].astype(dt)
                except (ValueError, TypeError):
                    pass  # genuine nulls in a left column: keep as-is
        r = (
            bucket[bucket["_side"] == 1][[by, on] + r_out]
            .dropna(subset=[on])
            .sort_values(on, kind="stable")
        )
        if l.empty:
            return None  # exchange skips empty buckets (schema-safe)
        out = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, allow_exact_matches=True
        )
        return out

    return bucketed_group_map(both, [by], per_bucket, num_buckets=num_buckets)


def _partial_agg_fn(keys: list[str], specs, arrow_aggs):
    """Per-batch combiner used by grouped_agg and local_combine: one
    Arrow C++ group_by per batch, aggregate columns renamed to the
    callers' aliases (position-stable: pyarrow appends aggregates after
    the key columns in spec order)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.schema.metadata:
            batch = batch.replace_schema_metadata(None)  # see add_bucket_multi
        g = batch.group_by(keys).aggregate(arrow_aggs)
        names = []
        agg_names = [
            "count_all" if op == "count" else f"{src}_{op}" for src, op, _ in specs
        ]
        alias_by_aggname: dict[str, list[str]] = {}
        for (src, op, alias), an in zip(specs, agg_names):
            alias_by_aggname.setdefault(an, []).append(alias)
        used: dict[str, int] = {}
        for c in g.schema.names:
            if c in keys:
                names.append(c)
            else:
                i = used.get(c, 0)
                used[c] = i + 1
                names.append(alias_by_aggname[c][i])
        return g.rename_columns(names)

    return partial


def local_combine(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
) -> ray.data.Dataset:
    """MAP-SIDE-ONLY partial aggregation: each batch collapses to one
    row per key present in that batch — no exchange, no barrier, and
    (being a plain map op) no zero-schema empty blocks, so the output
    feeds ``hash_join`` without the drop_empty_blocks normalization a
    ``grouped_agg`` input forces.

    Use below a join whose downstream aggregate is distributive over
    the partials (sum of partial sums / counts / min of mins): at a
    10:1 fact-to-key ratio the join's all-to-all ships ~10× fewer rows
    for the cost of one in-batch Arrow group_by. The caller's final
    aggregate must SUM the partial ``count`` aliases (they are partial
    counts, not 1-per-key). ``specs`` as in :func:`grouped_agg`; ops
    must be distributive (sum/count/min/max)."""
    arrow_aggs = []
    for src, op, alias in specs:
        if op == "count":
            arrow_aggs.append(([], "count_all"))
        elif op in ("sum", "min", "max"):
            arrow_aggs.append((src, op))
        else:
            raise ValueError(f"unsupported op {op}")
    return ds.map_batches(
        _partial_agg_fn(keys, specs, arrow_aggs), batch_format="pyarrow"
    )


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    exchange: str = "native",
) -> ray.data.Dataset:
    """Grouped aggregation with PARTIAL PRE-AGGREGATION: each batch is
    reduced to one row per key via Arrow's C++ ``Table.group_by``
    (combiner), then the tiny partials go through the global shuffle.
    For a 600k-row input with 6 groups this shrinks the all-to-all
    exchange from 600k rows to (num_batches × groups) rows — the
    difference between a shuffle-bound and a scan-bound query at 100 TB.

    ``specs``: (src_col, op, alias) with op ∈ {sum, count, min, max}.
    ``count`` ignores src_col. Means: derive from sum+count downstream.

    ``exchange``: "native" (default) folds partials via Ray's
    ``groupby().aggregate()``; "direct"/"sort"/"auto" folds them
    through :func:`bucketed_group_map` (warm actor exchange — no sort
    shuffle, no zero-schema empty blocks in the output, so a downstream
    ``hash_join`` skips its drop_empty_blocks materialization; prefer
    it when the aggregate FEEDS a join)."""
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    arrow_aggs = []
    for src, op, alias in specs:
        if op == "count":
            arrow_aggs.append(([], "count_all"))
        elif op in ("sum", "min", "max"):
            arrow_aggs.append((src, op))
        else:
            raise ValueError(f"unsupported op {op}")

    partials = ds.map_batches(
        _partial_agg_fn(keys, specs, arrow_aggs), batch_format="pyarrow"
    )
    if exchange != "native":
        # fold partials through the warm bucketed exchange instead of
        # Ray's native groupby: no sort shuffle, and the output carries
        # no zero-schema empty blocks, so a downstream hash_join skips
        # the drop_empty_blocks materialization ("auto" here defers to
        # bucketed_group_map's size-based sort/direct choice)
        fold_ops = [
            (alias, "sum" if op in ("sum", "count") else op)
            for _, op, alias in specs
        ]
        aliases = [a for a, _ in fold_ops]

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            # dropna=False: the Arrow partial stage and the native path
            # both keep null keys as a group — the fold must too
            grp = g.groupby(keys, sort=False, dropna=False)
            out = pd.DataFrame(
                {alias: getattr(grp[alias], op2)() for alias, op2 in fold_ops}
            ).reset_index()
            return out[keys + aliases]

        return bucketed_group_map(
            partials, keys, fold, pre_reduce=fold, exchange=exchange
        )
    final_aggs = []
    for src, op, alias in specs:
        if op in ("sum", "count"):
            final_aggs.append(_Sum(alias, alias_name=alias))
        elif op == "min":
            final_aggs.append(_Min(alias, alias_name=alias))
        elif op == "max":
            final_aggs.append(_Max(alias, alias_name=alias))
    return partials.groupby(keys).aggregate(*final_aggs)


def argmax_per_key(
    table: pa.Table, key_cols: list[str], order_cols: list[str], keep: str = "last"
) -> pa.Table:
    """Keep the (order_cols)-max row per key (``keep="last"``) or -min
    row (``keep="first"``) — vectorized sort + boundary mask, the same
    kernel shape as the CDC LWW merge (stages/merge.py)."""
    sort_keys = [(c, "ascending") for c in key_cols + order_cols]
    t = table.sort_by(sort_keys).combine_chunks()
    n = t.num_rows
    if n == 0:
        return t
    for c in key_cols:
        col = t.column(c)
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False)
            neq = v[1:] != v[:-1]
        else:
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            codes = pc.dictionary_encode(arr)
            if isinstance(codes, pa.ChunkedArray):
                codes = codes.combine_chunks()
            v = codes.indices.to_numpy(zero_copy_only=False)
            neq = v[1:] != v[:-1]
        if c == key_cols[0]:
            boundary = neq
        else:
            boundary = boundary | neq
    mask = np.ones(n, dtype=bool)
    if keep == "last":
        mask[:-1] = boundary
    else:  # first row of each key run
        mask[1:] = boundary
    return t.filter(pa.array(mask))


def latest_per_key(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Distributed latest-event-wins: bucket by the first key column,
    then a per-bucket vectorized arg-max (one shuffle). Pre-reduces each
    batch before the shuffle so only per-batch winners move — the
    partial-aggregation pattern applied to arg-max."""

    def partial(batch: pa.Table) -> pa.Table:
        return argmax_per_key(batch, key_cols, order_cols)

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(pdf, preserve_index=False)
        return argmax_per_key(t, key_cols, order_cols).to_pandas()

    # final reduce through the direct exchange (co-location only — no
    # sort needed; the arg-max kernel sorts its narrow keys itself).
    # The kernel is its own combiner (idempotent, schema-preserving) —
    # passing it as pre_reduce bounds receiver memory to O(live keys).
    return bucketed_group_map(
        pre, [key_cols[0]], per_bucket, num_buckets=num_buckets, pre_reduce=per_bucket
    )


def first_per_key(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Earliest-row-per-key — :func:`latest_per_key` with the arg-MIN
    kernel (same pre-reduce, same exchange)."""

    def partial(batch: pa.Table) -> pa.Table:
        return argmax_per_key(batch, key_cols, order_cols, keep="first")

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(pdf, preserve_index=False)
        return argmax_per_key(t, key_cols, order_cols, keep="first").to_pandas()

    return bucketed_group_map(
        pre, [key_cols[0]], per_bucket, num_buckets=num_buckets, pre_reduce=per_bucket
    )


def grouped_pandas_map(
    ds: ray.data.Dataset,
    key_cols: list[str],
    fn_per_group,
    num_buckets: int = 32,
    num_actors: int | None = None,
    spill_rows: int = 4_000_000,
) -> ray.data.Dataset:
    """Per-DISTINCT-KEY group map through the direct exchange: one
    bucket task per hash bucket, ``fn_per_group`` applied to each key's
    rows inside. Drop-in for ``groupby(keys).map_groups(fn)`` without
    the sort-based shuffle (use when group count is moderate; for
    millions of keys prefer a vectorized per-bucket kernel via
    bucketed_group_map)."""

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame | None:
        outs = []
        for _, g in b.groupby(key_cols, sort=False):
            r = fn_per_group(g.reset_index(drop=True))
            if r is not None and len(r):
                outs.append(r)
        if not outs:
            # all groups empty-handed; the exchange skips None results
            # (fn_per_group may not accept an empty frame — e.g. kernels
            # that read the group key from row 0)
            return None
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_map(
        ds,
        key_cols,
        per_bucket,
        num_buckets=num_buckets,
        num_actors=num_actors,
        spill_rows=spill_rows,
    )


def topk_per_key(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    k: int,
    descending: bool | list[bool] = True,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Top-k rows per key (the ``row_number() OVER (PARTITION BY ...)
    <= k`` window) — the arg-max partial-aggregation pattern generalized
    to k: each batch is pre-reduced to its local per-key top-k
    (combiner), so the shuffle carries at most k rows per (key, batch);
    one bucket shuffle + a per-bucket vectorized head(k) finishes.

    Deterministic: ``order_cols`` must be a total order per key (add a
    unique id as the last order col). ``descending`` may be per-column
    (e.g. value DESC, id ASC)."""
    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)
    asc = [not d for d in descending]

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(order_cols, ascending=asc, kind="stable")
        return s.groupby(key_cols, sort=False).head(k)

    pre = ds.map_batches(local_topk, batch_format="pandas")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.sort_values(order_cols, ascending=asc, kind="stable")
        return s.groupby(key_cols, sort=False).head(k)

    # top-k is its own combiner: receiver memory stays O(k · keys)
    return bucketed_group_map(
        pre, key_cols, per_bucket, num_buckets=num_buckets, pre_reduce=per_bucket
    )


def distinct_sorted(ds: ray.data.Dataset, column: str) -> pa.Table:
    """Distinct values of one column: per-batch unique (combiner) →
    global unique — the shuffle carries only distinct values."""

    def uniq(batch: pa.Table) -> pa.Table:
        return pa.table({column: pc.unique(batch.column(column))})

    vals = ds.map_batches(uniq, batch_format="pyarrow").unique(column)
    return pa.table({column: pa.array(sorted(vals))})


def rolling_per_key(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window: int,
    out_col: str = "roll_sum",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Per-key rolling-window sum — the ``SUM(v) OVER (PARTITION BY key
    ORDER BY ord ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``
    window function. One bucketed exchange on the key; inside the
    bucket a single mergesort + pandas' C-implemented grouped rolling
    (group-major order equals sorted order, so the result aligns
    positionally — no per-key Python).

    ``order_cols`` must be a total order per key (append a unique id).
    Integer ``value_col`` recommended: the rolling sum is float64
    internally, exact for |values| < 2^53 / window, then cast back."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values(key_cols + order_cols, kind="mergesort")
        roll = (
            s.groupby(key_cols, sort=False)[value_col]
            .rolling(window, min_periods=1)
            .sum()
            .to_numpy()
        )
        s = s.copy()
        s[out_col] = roll.astype(np.int64)
        return s

    return bucketed_group_map(
        ds, key_cols, per_bucket, num_buckets=num_buckets
    )


def rolling_range_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    out_col: str = "range_sum",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Time-interval rolling sum — ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``:
    for each row, the sum of values whose ts lies in
    ``[ts_i − window, ts_i]`` within the key — INCLUDING ts-peers of
    the current row (SQL RANGE CURRENT ROW spans the whole peer group).
    One bucketed exchange; inside the bucket one sort + per-key prefix
    sums with two vectorized ``searchsorted`` probes (no per-row
    Python). The RANGE companion to :func:`rolling_per_key`'s ROWS
    frame."""

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values([key_col, ts_col], kind="mergesort").reset_index(drop=True)
        ts = s[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        v = s[value_col].to_numpy(np.int64)
        csum = np.concatenate([[0], np.cumsum(v)])
        out = np.empty(len(s), np.int64)
        # per-key segments: probe within each key's slice
        sizes = s.groupby(key_col, sort=False).size().to_numpy()
        start = 0
        for n in sizes:  # loop over KEYS' segments, probes vectorized
            seg = ts[start : start + n]
            lo = start + np.searchsorted(seg, seg - window_us, side="left")
            hi = start + np.searchsorted(seg, seg, side="right")  # incl. peers
            out[start : start + n] = csum[hi] - csum[lo]
            start += n
        s = s.copy()
        s[out_col] = out
        return s

    return bucketed_group_map(ds, [key_col], per_bucket, num_buckets=num_buckets)


def funnel_counts(
    ds: ray.data.Dataset,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Sequential funnel (classic event analytics): how many users
    reached step k — i.e. performed steps[0], then steps[1] STRICTLY
    later, then steps[2] later still… Each user's clock is the earliest
    qualifying time per stage (min-ts semantics; equal timestamps do NOT
    advance the funnel, identically in both engines). Returns one row
    per stage: (stage 1-based, users).

    Scale shape: ONE bucketed exchange on the user (users never split
    across buckets), the per-bucket kernel is len(steps) vectorized
    groupby-min passes, and only O(num_buckets · len(steps)) partial
    count rows leave the buckets — a funnel over 10^10 events moves the
    events once and aggregates to a handful of rows."""
    import pandas as pd

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        cur: pd.Series | None = None  # per-user frontier time
        counts = []
        for i, step in enumerate(steps):
            sel = b[b[type_col] == step]
            if cur is not None:
                sel = sel.merge(cur.rename("_t").reset_index(), on=user_col)
                sel = sel[sel[ts_col] > sel["_t"]]
            nxt = sel.groupby(user_col, sort=False)[ts_col].min()
            counts.append(len(nxt))
            cur = nxt
            if len(nxt) == 0:
                counts.extend([0] * (len(steps) - i - 1))
                break
        return pd.DataFrame(
            {
                "stage": np.arange(1, len(steps) + 1, dtype=np.int64),
                "users": np.array(counts, dtype=np.int64),
            }
        )

    partials = bucketed_group_map(
        ds.select_columns([user_col, type_col, ts_col]),
        [user_col],
        per_bucket,
        num_buckets=num_buckets,
    )
    return grouped_agg(partials, ["stage"], [("users", "sum", "users")])


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    threshold_micro: int,
    k: int | None = None,
) -> ray.data.Dataset:
    """EXACT frequency-threshold heavy hitters (keys occurring in at
    least ``threshold_micro``·10^-6 of all rows) with BOUNDED memory —
    the classic two-pass Misra-Gries shape:

    Pass 1: each batch emits only keys whose IN-BATCH count exceeds
    ``n_batch/(k+1)`` (≤ k rows per batch — the MG summary bound) plus
    one total-row-count marker row. If a key misses every batch summary
    its global frequency is < N/(k+1) ≤ threshold/2 (k defaults to
    ``ceil(2·10^6/threshold_micro)``), so the surviving candidate set is
    a GUARANTEED superset of the true heavy hitters — no full-vocabulary
    structure exists anywhere, unlike a naive groupby-count.

    Pass 2: the (bounded) candidate array broadcasts via ``ray.put``;
    the corpus streams through an ``isin`` recount, and the exact counts
    gate ``c·10^6 ≥ threshold_micro·N``. Exactness is free because only
    candidates are recounted. The input is consumed twice (two passes
    are inherent); keep the upstream projection narrow or pre-materialize
    it if the source re-read dominates."""
    import ray as _ray

    if k is None:
        k = -(-2_000_000 // threshold_micro)

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col]
        n_i = len(v)
        if n_i == 0:
            return pd.DataFrame(
                {"w": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype="int64"),
                 "t": pd.Series([], dtype="int64")}
            )
        vc = v.value_counts()
        vc = vc[vc.to_numpy() > n_i / (k + 1)]
        return pd.DataFrame(
            {
                "w": np.concatenate([vc.index.to_numpy(dtype=object), [""]]),
                "c": np.concatenate([vc.to_numpy(dtype=np.int64), [n_i]]),
                "t": np.concatenate([np.zeros(len(vc), np.int64), [1]]),
            }
        )

    summary = grouped_agg(
        ds.map_batches(summarize, batch_format="pandas"),
        ["w", "t"],
        [("c", "sum", "c")],
    ).to_pandas()
    total = int(summary.loc[summary["t"] == 1, "c"].sum())
    cand = summary.loc[summary["t"] == 0, "w"].to_numpy(dtype=object)
    ref = _ray.put(cand)

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        cands = _ray.get(ref)
        v = batch[col]
        hit = v[np.isin(v.to_numpy(dtype=object), cands)]
        vc = hit.value_counts()
        return pd.DataFrame(
            {"w": vc.index.to_numpy(dtype=object), "c": vc.to_numpy(dtype=np.int64)}
        )

    counts = grouped_agg(
        ds.map_batches(recount, batch_format="pandas"), ["w"], [("c", "sum", "c")]
    )

    def gate(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c * 1_000_000 >= threshold_micro * total))

    return counts.map_batches(gate, batch_format="pyarrow")


def table_profile(ds: ray.data.Dataset, columns: list[str]) -> ray.data.Dataset:
    """Data-profiling sweep (the ETL "know your table" pass): one row
    per column with (n, nulls, n_distinct — exact, excluding nulls).

    Scale shape: counts/nulls are per-batch integer partials; distinct
    is per-batch pre-dedup (unique values per column per batch, so the
    explode shrinks before it moves) → one (col, value) partial-pre-agg
    groupby → per-column count. Values are keyed by their in-engine
    string form — only the COUNT crosses engines, so no cross-engine
    representation contract is needed."""
    import pandas as pd

    def base(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "col": np.array(columns, dtype=object),
                "n": np.full(len(columns), len(batch), dtype=np.int64),
                "nulls": np.array(
                    [int(batch[c].isna().sum()) for c in columns], dtype=np.int64
                ),
            }
        )

    totals = grouped_agg(
        ds.map_batches(base, batch_format="pandas"),
        ["col"],
        [("n", "sum", "n"), ("nulls", "sum", "nulls")],
    )

    def explode_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        cols, vals = [], []
        for c in columns:
            u = batch[c].dropna().astype(str).unique()
            cols.append(np.full(len(u), c, dtype=object))
            vals.append(u.astype(object))
        return pd.DataFrame(
            {"col": np.concatenate(cols) if cols else np.array([], object),
             "v": np.concatenate(vals) if vals else np.array([], object)}
        )

    pairs = grouped_agg(
        ds.map_batches(explode_distinct, batch_format="pandas"),
        ["col", "v"],
        [("", "count", "_c")],
    )

    def drop_v(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"col": batch["col"]})

    distinct = grouped_agg(
        pairs.map_batches(drop_v, batch_format="pandas"),
        ["col"],
        [("", "count", "n_distinct")],
    )
    # both aggregates are O(columns) rows — a driver-side merge is the
    # scale-correct combine (and dodges acero's empty-block join issue
    # on groupby outputs)
    out = totals.to_pandas().merge(distinct.to_pandas(), on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0)
    out = out.astype({"n": "int64", "nulls": "int64", "n_distinct": "int64"})
    return ray.data.from_pandas(out)


def rollup_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
) -> ray.data.Dataset:
    """GROUP BY ROLLUP(keys): every prefix granularity in one logical
    pass — (k1..kn), (k1..kn-1), …, () — with rolled-up key columns
    NULL and ``lvl`` = SQL ``GROUPING_ID`` (bitmask, leftmost key most
    significant).

    Scale shape: the input is aggregated ONCE at the finest level
    (``grouped_agg`` — partial pre-agg combiner, one shuffle); every
    coarser level re-aggregates the FINEST RESULT (cardinality =
    distinct key tuples, not input rows), each a further tiny
    grouped_agg — the input is never rescanned, exactly how a
    warehouse computes ROLLUP. Sums/counts/mins/maxes compose; derive
    averages downstream from sum+count.

    Caveat (same as SQL): NULL key VALUES in the data are
    indistinguishable from rolled-up NULLs except via ``lvl``."""
    for _, op, _ in specs:
        if op not in ("sum", "count", "min", "max"):
            raise ValueError(f"rollup cannot compose op {op!r}")
    # materialize: each level consumes the previous one twice (derive +
    # widen) and Ray re-executes lazy upstreams per consumption — pin
    # the small finest result so the INPUT is scanned exactly once
    finest = grouped_agg(ds, keys, specs).materialize()
    # coarser levels re-aggregate the previous level's ALIAS columns
    composed = [
        (alias, "sum" if op in ("sum", "count") else op, alias)
        for _, op, alias in specs
    ]
    aliases = [alias for _, _, alias in specs]

    def widen(level_keys: list[str], lvl: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols: dict = {}
            for k in keys:
                if k in level_keys:
                    cols[k] = batch.column(k)
                else:
                    cols[k] = pa.nulls(batch.num_rows, finest_schema.field(k).type)
            for a in aliases:
                cols[a] = batch.column(a)
            cols["lvl"] = pa.array([lvl] * batch.num_rows, pa.int64())
            return pa.table(cols)

        return fn

    finest_schema = None
    levels = []
    prev = finest
    for i in range(len(keys), -1, -1):
        level_keys = keys[:i]
        lvl = sum(1 << (len(keys) - 1 - j) for j in range(i, len(keys)))
        if i == len(keys):
            cur = finest
        elif i == 0:
            # global aggregate: single row, no groupby needed
            import ray.data as _rd

            from ray.data.aggregate import Max as _Max
            from ray.data.aggregate import Min as _Min
            from ray.data.aggregate import Sum as _Sum

            aggs = []
            for src, op, alias in composed:
                cls = {"sum": _Sum, "min": _Min, "max": _Max}[op]
                aggs.append(cls(src, alias_name=alias))
            row = prev.aggregate(*aggs)
            cur = _rd.from_items([row])
        else:
            cur = grouped_agg(prev, level_keys, composed)
        if finest_schema is None:
            from ..schema import dataset_schema

            finest_schema = dataset_schema(finest)
        levels.append(cur.map_batches(widen(level_keys, lvl), batch_format="pyarrow"))
        prev = cur
    out = levels[0]
    for other in levels[1:]:
        out = out.union(other)
    return out


def pivot_counts(
    ds: ray.data.Dataset,
    index: str,
    pivot_col: str,
    values: list[str],
) -> ray.data.Dataset:
    """PIVOT: one wide row per ``index`` key with a count column per
    ``pivot_col`` value (the SQL ``count(*) FILTER (WHERE col = v)``
    block, or ``PIVOT ... IN (values)``).

    The widening happens BEFORE the shuffle: each input batch reduces to
    one wide partial row per key present in it (vectorized mask counts),
    so the single exchange carries (keys-per-batch × batches) narrow
    int rows — never the event stream — and the final groupby is a
    plain composable sum. ``values`` must be the closed value list
    (same contract as SQL PIVOT IN); unlisted values are ignored."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(index)
        codes = pc.dictionary_encode(keys)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        idx = codes.indices.to_numpy(zero_copy_only=False)
        uniq = codes.dictionary
        pv = batch.column(pivot_col).to_numpy(zero_copy_only=False)
        cols: dict = {index: uniq}
        for v in values:
            mask = pv == v
            cnt = np.bincount(idx[mask], minlength=len(uniq)).astype(np.int64)
            cols[v] = pa.array(cnt, pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, [index], [(v, "sum", v) for v in values])


def pivot_sum(
    ds: ray.data.Dataset,
    index: str,
    pivot_col: str,
    values: list[str],
    value_col: str,
) -> ray.data.Dataset:
    """PIVOT with SUM (``SUM(value) FILTER (WHERE col = v)`` per listed
    value) — same shape as :func:`pivot_counts`: wide int partial rows
    built batch-locally (masked bincount-with-weights in exact int64),
    ONE narrow exchange, composable final sums."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(index)
        codes = pc.dictionary_encode(keys)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        idx = codes.indices.to_numpy(zero_copy_only=False)
        uniq = codes.dictionary
        pv = batch.column(pivot_col).to_numpy(zero_copy_only=False)
        val = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict = {index: uniq}
        for v in values:
            mask = pv == v
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, idx[mask], val[mask])  # exact int64, no float pass
            cols[v] = pa.array(acc, pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, [index], [(v, "sum", v) for v in values])


def melt(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """UNPIVOT / melt: wide → long, one output row per (input row ×
    value column). Pure batch-local reshaping (zero shuffle): each
    batch concatenates len(value_cols) column slices with a constant
    ``var_name`` label; value columns unify to a common Arrow type."""
    import pyarrow as _pa

    def fn(batch: pa.Table) -> pa.Table:
        vt = _pa.unify_schemas(
            [pa.schema([batch.schema.field(c).with_name(value_name)]) for c in value_cols]
        ).field(value_name).type
        outs = []
        for c in value_cols:
            cols = {k: batch.column(k) for k in id_cols}
            cols[var_name] = pa.array([c] * batch.num_rows, pa.string())
            cols[value_name] = batch.column(c).cast(vt)
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    return ds.map_batches(fn, batch_format="pyarrow")


def cube_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str]],
) -> ray.data.Dataset:
    """GROUP BY CUBE(keys): all 2^k granularities. Like
    :func:`rollup_agg`, the input is aggregated ONCE at the finest
    level; every other subset re-aggregates the finest result (distinct
    key tuples, not input rows). ``lvl`` mirrors SQL ``GROUPING_ID``."""
    for _, op, _ in specs:
        if op not in ("sum", "count", "min", "max"):
            raise ValueError(f"cube cannot compose op {op!r}")
    # 2^k-1 subsets all derive from finest: materialize it (small —
    # distinct key tuples) so the input is scanned exactly once
    finest = grouped_agg(ds, keys, specs).materialize()
    composed = [
        (alias, "sum" if op in ("sum", "count") else op, alias)
        for _, op, alias in specs
    ]
    aliases = [alias for _, _, alias in specs]
    from ..schema import dataset_schema

    fschema = dataset_schema(finest)

    def widen(level_keys: list[str], lvl: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols: dict = {}
            for k in keys:
                if k in level_keys:
                    cols[k] = batch.column(k)
                else:
                    cols[k] = pa.nulls(batch.num_rows, fschema.field(k).type)
            for a in aliases:
                cols[a] = batch.column(a)
            cols["lvl"] = pa.array([lvl] * batch.num_rows, pa.int64())
            return pa.table(cols)

        return fn

    out = None
    for mask in range(1 << len(keys)):
        level_keys = [k for j, k in enumerate(keys) if not (mask >> (len(keys) - 1 - j)) & 1]
        if level_keys == keys:
            cur = finest
        elif level_keys:
            cur = grouped_agg(finest, level_keys, composed)
        else:
            from ray.data.aggregate import Max as _Max
            from ray.data.aggregate import Min as _Min
            from ray.data.aggregate import Sum as _Sum

            import ray.data as _rd

            aggs = [
                {"sum": _Sum, "min": _Min, "max": _Max}[op](src, alias_name=alias)
                for src, op, alias in composed
            ]
            cur = _rd.from_items([finest.aggregate(*aggs)])
        wide = cur.map_batches(widen(level_keys, mask), batch_format="pyarrow")
        out = wide if out is None else out.union(wide)
    return out


def ntile_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    n: int,
    out_col: str = "tile",
) -> ray.data.Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY order)`` with the
    exact boundary rule (first ``cnt % n`` tiles get the extra row).
    ``order_col`` must be unique within a key — NTILE under ties is
    engine-nondeterministic, so callers order by a unique column (id)
    exactly as the SQL oracle does. One bucketed exchange; inside a
    bucket one sort + vectorized rank arithmetic."""
    import numpy as np

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort").reset_index(drop=True)
        cnt = g.groupby(key_col, sort=False)[order_col].transform("size").to_numpy()
        rank = g.groupby(key_col, sort=False).cumcount().to_numpy()
        base = cnt // n
        rem = cnt % n
        big = rem * (base + 1)  # rows covered by the larger tiles
        in_big = rank < big
        tile = np.where(
            in_big,
            rank // np.maximum(base + 1, 1),
            rem + (rank - big) // np.maximum(base, 1),
        ).astype("int64") + 1
        out = g[[key_col, order_col]].copy()
        out[out_col] = np.minimum(tile, n)
        return out

    return bucketed_group_map(ds, [key_col], per_bucket)


def lag_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "lag_value",
) -> ray.data.Dataset:
    """``LAG(value) OVER (PARTITION BY key ORDER BY order)`` — previous
    row's value within the key, null on each key's first row. Same
    bucketed-exchange + in-bucket sort + C shift shape as the other
    per-key windows; ``order_col`` unique within a key for determinism."""
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort").reset_index(drop=True)
        out = g[[key_col, order_col, value_col]].copy()
        out[out_col] = g.groupby(key_col, sort=False)[value_col].shift(1)
        return out

    return bucketed_group_map(ds, [key_col], per_bucket)


def lead_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "lead_value",
) -> ray.data.Dataset:
    """``LEAD(value) OVER (PARTITION BY key ORDER BY order)`` — the
    forward mirror of :func:`lag_per_key` (null on each key's last row)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort").reset_index(drop=True)
        out = g[[key_col, order_col, value_col]].copy()
        out[out_col] = g.groupby(key_col, sort=False)[value_col].shift(-1)
        return out

    return bucketed_group_map(ds, [key_col], per_bucket)


def _set_op(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    cols: list[str],
    keep: str,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Shared engine for INTERSECT/EXCEPT (DISTINCT semantics): each
    side reduces per batch to its distinct key tuples (Arrow group_by
    combiner) tagged with a side marker, ONE hash exchange co-locates
    equal tuples, and the bucket kernel keeps side-0 tuples by side-1
    membership. The exchange carries distinct-tuple cardinality, never
    either row stream."""

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(cols).group_by(cols).aggregate([])
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    both = a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow")
    )

    def pre_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(cols + ["_side"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(cols + ["_side"])
        ina = d[d["_side"] == 0][cols]
        inb = d[d["_side"] == 1][cols]
        if keep == "intersect":
            return ina.merge(inb, on=cols, how="inner")
        m = ina.merge(inb, on=cols, how="left", indicator=True)
        return m[m["_merge"] == "left_only"][cols]

    return bucketed_group_map(both, cols, per_bucket, num_buckets=num_buckets)


def intersect_distinct(
    a: ray.data.Dataset, b: ray.data.Dataset, cols: list[str], num_buckets: int = 16
) -> ray.data.Dataset:
    """SQL ``INTERSECT`` (distinct tuples present in BOTH inputs)."""
    return _set_op(a, b, cols, "intersect", num_buckets)


def except_distinct(
    a: ray.data.Dataset, b: ray.data.Dataset, cols: list[str], num_buckets: int = 16
) -> ray.data.Dataset:
    """SQL ``EXCEPT`` (distinct tuples of ``a`` absent from ``b``)."""
    return _set_op(a, b, cols, "except", num_buckets)


def explode_list(
    ds: ray.data.Dataset,
    id_cols: list[str],
    list_col: str,
    value_name: str = "val",
    pos_col: str = "pos",
    pos_base: int = 1,
) -> ray.data.Dataset:
    """UNNEST WITH ORDINALITY: one output row per list element, id
    columns repeated, 1-based position (``pos_base``). Pure batch-local
    Arrow kernels (list_value_length / list_flatten + numpy repeat) —
    zero shuffle, zero Python per row; null/empty lists emit nothing."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        lens = (
            pc.list_value_length(arr)
            .fill_null(0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(arr)
        total = int(lens.sum())
        ends = np.cumsum(lens)
        starts = ends - lens
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens) + pos_base
        take = pa.array(np.repeat(np.arange(len(arr), dtype=np.int64), lens))
        cols = {c: batch.column(c).take(take) for c in id_cols}
        cols[value_name] = flat
        cols[pos_col] = pa.array(pos, pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def rank_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    out_col: str = "rn",
    method: str = "row_number",
) -> ray.data.Dataset:
    """``ROW_NUMBER()`` / ``RANK()`` / ``DENSE_RANK()`` / ``CUME_DIST()``
    OVER (PARTITION BY key ORDER BY order). ``method="row_number"`` needs
    ``order_col`` unique within a key (ties are engine-nondeterministic,
    same contract as ntile_per_key); the others are tie-stable.
    ``cume_dist`` emits float64 ``rank_max/n``, ``percent_rank``
    ``(rank_min − 1)/(n − 1)`` (0.0 for a 1-row partition, the SQL
    convention) — each one integer division in IEEE double,
    bit-identical across engines. One bucketed exchange, one in-bucket
    sort + C kernel."""
    if method not in ("row_number", "rank", "dense", "cume_dist", "percent_rank"):
        raise ValueError(f"unknown rank method {method!r}")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort").reset_index(drop=True)
        out = g[[key_col, order_col]].copy()
        if method == "row_number":
            out[out_col] = g.groupby(key_col, sort=False).cumcount().to_numpy() + 1
        elif method == "cume_dist":
            grp = g.groupby(key_col, sort=False)[order_col]
            rmax = grp.rank(method="max").to_numpy()
            n = grp.transform("size").to_numpy()
            out[out_col] = rmax / n
        elif method == "percent_rank":
            grp = g.groupby(key_col, sort=False)[order_col]
            rmin = grp.rank(method="min").to_numpy()
            n = grp.transform("size").to_numpy()
            import numpy as _np

            out[out_col] = _np.where(n > 1, (rmin - 1) / _np.maximum(n - 1, 1), 0.0)
        else:
            out[out_col] = (
                g.groupby(key_col, sort=False)[order_col]
                .rank(method="min" if method == "rank" else "dense")
                .astype("int64")
                .to_numpy()
            )
        return out

    return bucketed_group_map(ds, [key_col], per_bucket)


def count_distinct_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    out_col: str = "n_distinct",
) -> ray.data.Dataset:
    """Exact ``COUNT(DISTINCT value) GROUP BY key`` — the two-phase
    shape that survives 100 TB: each batch first reduces to its DISTINCT
    (key, value) pairs (Arrow group_by combiner — the exchange carries
    pair cardinality, not the row stream), pairs co-locate on ONE hash
    exchange keyed by (key, value) with a drop_duplicates pre-reduce
    (receiver memory = O(distinct pairs per bucket)), each bucket emits
    per-key partial counts, and a final tiny grouped sum folds the
    partials. No global sort, no per-key state anywhere."""

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return (
            batch.select([key_col, value_col])
            .group_by([key_col, value_col])
            .aggregate([])
        )

    pre = ds.map_batches(distinct_pairs, batch_format="pyarrow")

    def pre_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([key_col, value_col])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([key_col, value_col])
        out = d.groupby(key_col, as_index=False).size()
        return out.rename(columns={"size": out_col})

    partials = bucketed_group_map(
        pre, [key_col, value_col], per_bucket, pre_reduce=pre_reduce
    )
    return grouped_agg(partials, [key_col], [(out_col, "sum", out_col)])


def mode_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    out_col: str = "mode",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Exact per-key MODE with a deterministic tie-break (highest count,
    then smallest value): per-batch (key, value) count partials (Arrow
    combiner), one pair-keyed exchange with a count-sum pre-reduce, a
    per-bucket fold to total counts, then the per-key arg-max. The
    exchange carries pair cardinality, never the row stream."""

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([key_col, value_col])
            .group_by([key_col, value_col])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_col, value_col, "_c"])

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def pre_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([key_col, value_col], as_index=False)["_c"].sum()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby([key_col, value_col], as_index=False)["_c"].sum()
        tot = tot.sort_values(
            [key_col, "_c", value_col], ascending=[True, False, True], kind="mergesort"
        )
        win = tot.groupby(key_col, as_index=False).first()
        return pd.DataFrame(
            {key_col: win[key_col], out_col: win[value_col], "n": win["_c"].astype("int64")}
        )

    # bucket by KEY (not pair): every (key, value) count for one key
    # must meet in one task for the arg-max; the pre-reduce keeps the
    # buffered pairs folded, so receiver memory is O(distinct pairs per
    # key-bucket)
    return bucketed_group_map(
        pre, [key_col], per_bucket, num_buckets=num_buckets, pre_reduce=pre_reduce
    )


def quantiles_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    qs: list[float],
    out_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Exact per-key discrete quantiles (``quantile_disc``: the value at
    sorted index ``ceil(q·n) − 1``) — one row per key, one column per
    requested q. One bucketed exchange co-locates each key, then a
    single in-bucket sort + vectorized offset probe (no per-key Python).
    The global-scan variant is ``pack.exact_quantiles``; this is its
    PARTITION BY form."""
    if out_cols is None:
        out_cols = [f"q{int(round(q * 100)):02d}" for q in qs]
    if len(out_cols) != len(qs):
        raise ValueError("out_cols must match qs")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values([key_col, value_col], kind="mergesort").reset_index(drop=True)
        sizes = s.groupby(key_col, sort=False).size()
        n = sizes.to_numpy()
        starts = np.concatenate([[0], np.cumsum(n)[:-1]])
        vals = s[value_col].to_numpy()
        out = {key_col: sizes.index.to_numpy()}
        for q, name in zip(qs, out_cols):
            idx = starts + np.maximum(np.ceil(q * n).astype(np.int64) - 1, 0)
            out[name] = vals[idx]
        return pd.DataFrame(out)

    return bucketed_group_map(ds, [key_col], per_bucket)


def grouping_sets_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sets: list[list[str]],
    specs: list[tuple[str, str, str]],
) -> ray.data.Dataset:
    """GROUP BY GROUPING SETS(sets) — the generic form ROLLUP and CUBE
    specialize. Every set must be a subset of ``keys``; non-grouped key
    columns come back NULL and ``lvl`` mirrors SQL ``GROUPING_ID`` over
    ``keys`` (leftmost key most significant).

    Scale shape (same as rollup_agg/cube_agg): the input is aggregated
    ONCE at the finest level (all of ``keys``; partial pre-agg combiner
    + one shuffle) and MATERIALIZED — each requested set re-aggregates
    that small result (distinct key tuples, not input rows). Only
    sum/count/min/max compose; derive averages from sum+count."""
    for _, op, _ in specs:
        if op not in ("sum", "count", "min", "max"):
            raise ValueError(f"grouping sets cannot compose op {op!r}")
    for s in sets:
        extra = [k for k in s if k not in keys]
        if extra:
            raise ValueError(f"set {s} has keys outside {keys}: {extra}")
    finest = grouped_agg(ds, keys, specs).materialize()
    composed = [
        (alias, "sum" if op in ("sum", "count") else op, alias)
        for _, op, alias in specs
    ]
    aliases = [alias for _, _, alias in specs]
    from ..schema import dataset_schema

    fschema = dataset_schema(finest)

    def widen(level_keys: list[str], lvl: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols: dict = {}
            for k in keys:
                if k in level_keys:
                    cols[k] = batch.column(k)
                else:
                    cols[k] = pa.nulls(batch.num_rows, fschema.field(k).type)
            for a in aliases:
                cols[a] = batch.column(a)
            cols["lvl"] = pa.array([lvl] * batch.num_rows, pa.int64())
            return pa.table(cols)

        return fn

    out = None
    for s in sets:
        level_keys = [k for k in keys if k in s]  # canonical key order
        lvl = sum(
            1 << (len(keys) - 1 - j) for j, k in enumerate(keys) if k not in s
        )
        if level_keys == keys:
            cur = finest
        elif level_keys:
            cur = grouped_agg(finest, level_keys, composed)
        else:
            from ray.data.aggregate import Max as _Max
            from ray.data.aggregate import Min as _Min
            from ray.data.aggregate import Sum as _Sum

            import ray.data as _rd

            aggs = [
                {"sum": _Sum, "min": _Min, "max": _Max}[op](src, alias_name=alias)
                for src, op, alias in composed
            ]
            cur = _rd.from_items([finest.aggregate(*aggs)])
        wide = cur.map_batches(widen(level_keys, lvl), batch_format="pyarrow")
        out = wide if out is None else out.union(wide)
    return out

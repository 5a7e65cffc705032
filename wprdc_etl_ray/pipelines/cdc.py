"""The flagship pipeline: WAL tail → LSM upsert → exactly-once Parquet commit.

Ray-Data-native rewrite of the reference's ``Pipeline`` lifecycle
(wprdc-etl pipeline/pipeline.py::Pipeline.run — connect → extract →
schema-validate → keyed-upsert load with a duplicate guard and status
bookkeeping), per SURVEY.md §3.4:

    driver: list WAL segments > watermark               (X1)
      → ray.data.read_parquet(segments)                 [read tasks]
      → map_batches(decode/validate/evolve + watermark) (X2,X3)
      → map_batches(add part/salt keys)                 (X4)
      → groupby(part[,salt]).map_groups(merge)          (X5)  [shuffle]
      → merge task writes its partition Parquet         (X6,X7)
    driver: collect tiny per-partition stats → atomic manifest commit

Everything wide stays inside Ray Data: one all-to-all shuffle
(``groupby``) per epoch; the merge task itself writes the partition's
output file so merged rows never take a second hop. The driver only
ever holds per-partition stat rows (B rows), never data.

Scale notes (100 TB / 10^10 events): ``num_partitions`` bounds the
per-task merge working set — size it so (events-per-epoch + snapshot
partition) / B fits a worker heap; cold partitions are carried forward
in the manifest without a rewrite; the watermark filter prunes whole
segments at plan time (driver metadata only) and rows inside straddling
segments vectorized at read time.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..errors import InvalidConfigError, SchemaValidationError
from ..schema import (
    KEY_COLUMNS,
    VALID_OPS,
    normalize_batch,
    unify_schemas,
    validate_batch,
)
from ..stages.merge import merge_with_snapshot, snapshot_form, winner_indices
from ..stages.partition import add_partition_cols
from ..state.manifest import (
    commit_manifest,
    load_epoch_manifest,
    load_manifest,
    public_schema,
)

CHANGE_META_COLS = ("offset", "op")
INTERNAL_COLS = ("_offset", "_deleted")


def attempt_epoch_dir(epoch: int, job_desc: str) -> str:
    """Name of the data directory a commit ATTEMPT writes into:
    ``epoch={E}-{token}`` where the token is a hash of the job content.

    Why: partition files are written BEFORE the commit lock's epoch
    check, so two writers racing for epoch E (e.g. ingest vs compact)
    must not share paths — the loser would overwrite the winner's
    committed bytes even though its manifest flip is refused. A
    content-derived token gives every DISTINCT job its own directory
    (losers leave invisible orphans, never corruption), while an exact
    retry/replay of the SAME job maps to the same paths and recomputes
    byte-identical files (deterministic-output property preserved)."""
    import hashlib as _hl

    token = _hl.md5(job_desc.encode("utf-8")).hexdigest()[:8]
    return f"epoch={epoch:06d}-{token}"


@dataclass
class CDCConfig:
    """Engine knobs. Defaults target the 32-CPU single-node sandbox but
    every knob is the thing you would turn on a 256-node cluster."""

    table_name: str = "transcripts"
    num_partitions: int = 64  # B ≈ 2–4 × total CPUs; bounds merge working set
    salt: int = 1  # >1 splits hot conversations across sub-groups (X4)
    batch_size: int = 262144
    # shuffle implementation for the ONE exchange:
    #   "auto"   — pick by planned epoch size (parquet metadata, free):
    #     "sort" below ~8M events (lower fixed cost), "direct" above
    #     (measured round 2 on this host: 24M events sort 16.9 s vs
    #     direct 11.4 s with the warm actor pool; 6M: sort 2.5 s vs
    #     direct 3.1 s — the crossover is the per-batch routing RPCs).
    #   "direct" — decode tasks route per-group Arrow slices straight to
    #     zero-CPU exchange actors (hash exchange; no global sort); the
    #     actor pool is warm per session.
    #   "sort"   — ray.data groupby().map_groups (simplest, most general).
    # Both produce byte-identical tables (tested).
    exchange: str = "auto"
    auto_exchange_threshold: int = 8_000_000
    # zero-CPU receiver actors; 32 works across 4..32-CPU nodes (more
    # actors than CPUs just means smaller finalize slices; fewer makes
    # finalize chunks too big to overlap)
    num_exchange_actors: int | None = 32
    # combiner threshold: an exchange actor pre-merges its buffer to
    # winners-only past this many rows, bounding actor memory to
    # O(live keys) instead of O(epoch events) on huge epochs
    exchange_compact_rows: int = 4_000_000
    strict: bool = True  # invalid rows: raise (reference behavior) vs drop
    required: tuple[str, ...] = ("offset", "op", "conv_id", "turn_idx", "ts")
    # "upsert" = keyed merge (reference CKANDatastoreLoader method='upsert');
    # "refresh" = drop-and-recreate full refresh (reference method='insert',
    # which delete_datastore + create_datastore + appends — SURVEY.md §3.2);
    # here a refresh is a new epoch that REPLACES all partitions atomically.
    mode: str = "upsert"
    # Storage strategy for incremental epochs (the Hudi COW-vs-MOR axis):
    #   "cow" (copy-on-write) — each touched (part, salt) slot reads its
    #     prior runs, merges, and rewrites ONE fully-merged file. Write
    #     amplification O(partition) per epoch; reads are a plain scan.
    #   "mor" (merge-on-read) — each touched slot appends ONE delta run
    #     holding only this epoch's per-key winners; prior runs carry
    #     forward untouched. Write amplification O(epoch delta) — the
    #     10^10-events shape when epochs are small relative to the
    #     table — at the cost of an LWW merge of the slot's runs at
    #     read time (the arg-max is on (ts, offset) in the data, so run
    #     order never matters). ``compact()`` folds runs back to one
    #     file per slot; both modes commit through the same manifest
    #     flip and are freely mixable epoch-to-epoch.
    write_mode: str = "cow"
    # MOR read-amplification bound: when a slot would exceed this many
    # runs, the merge task takes the COW path for that slot this epoch
    # (inline leveled compaction — deterministic, manifest-driven).
    # 0 = unbounded (compact only via compact()).
    mor_compact_runs: int = 8


@dataclass
class CommitResult:
    epoch: int
    global_watermark: int
    events_read: int
    partitions_updated: int
    manifest: dict
    skipped: bool = False


# --- X1: segment planning (driver-side metadata only) ------------------------


def list_segments(wal_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(wal_dir, "seg-*.parquet")))


def segment_offset_range(path: str) -> tuple[int, int]:
    """(min, max) offset of a segment from Parquet row-group statistics —
    no data read (X1: resume decisions are metadata-only)."""
    md = pq.ParquetFile(path).metadata
    idx = None
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        if idx is None:
            for i in range(row_group.num_columns):
                if row_group.column(i).path_in_schema == "offset":
                    idx = i
                    break
            if idx is None:
                raise SchemaValidationError(f"segment {path} has no offset column")
        st = row_group.column(idx).statistics
        if st is None or not st.has_min_max:  # fall back: read the column
            col = pq.read_table(path, columns=["offset"]).column("offset")
            return pc.min(col).as_py(), pc.max(col).as_py()
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return (0, -1)
    return int(lo), int(hi)


def plan_segments(
    wal_dir: str, watermark: int, meta_cache: dict | None = None
) -> tuple[list[str], int, list[list[str]]]:
    """Select segments with events beyond the watermark; group them by
    file schema (segments of different schema versions cannot share one
    ``read_parquet`` — each group is read separately then normalized to
    the unified schema before the union).

    ``meta_cache`` (path → (lo, hi, schema_fp)) makes repeated planning
    over a growing WAL O(new segments) in footer reads: a long-lived
    tailer polls the same directory every few seconds, and WAL segments
    are immutable once written, so their footers never need re-reading
    (measured: the serial footer scan was a visible slice of tail
    mode's per-wave fixed cost)."""
    chosen: list[str] = []
    hi_all = watermark
    cache = meta_cache if meta_cache is not None else {}
    for path in list_segments(wal_dir):
        hit = cache.get(path)
        if hit is None:
            lo, hi = segment_offset_range(path)
            fp = pq.read_schema(path).serialize().to_pybytes()
            cache[path] = hit = (lo, hi, fp)
        lo, hi, fp = hit
        if hi > watermark:
            chosen.append(path)
            hi_all = max(hi_all, hi)
    groups: dict[bytes, list[str]] = {}
    for path in chosen:
        groups.setdefault(cache[path][2], []).append(path)
    return chosen, hi_all, list(groups.values())


# --- X5/X6/X7 merge-and-write task -------------------------------------------


class _MergeWrite:
    """Per-(partition, salt) merge + write, used as the ``map_groups``
    function of the ONE shuffle.

    Plain function semantics (stateless task) — state that must persist
    across batches lives in the manifest, not here. Reads the prior
    snapshot run(s) for its (part, salt) slot from inside the task
    (task-side IO scales with the cluster; the driver ships only the
    small {part: files} dict).

    Salted layout (X4/X6 without a second shuffle): a partition's rows
    are split into ``salt`` sorted runs keyed by ``turn_idx % salt`` —
    every key's events share a salt, so each run is a complete merge for
    its keys, a hot conversation fans out over ``salt`` merge tasks, and
    the partition on disk is the union of its runs (LSM-style sorted
    runs; global (conv_id, turn_idx) order is restored on read)."""

    def __init__(
        self,
        root: str,
        epoch_dir: str,
        prior_parts: dict[int, dict],
        salt: int,
        target_schema: pa.Schema,
        write_mode: str = "cow",
        mor_compact_runs: int = 8,
    ):
        self.root = root
        self.epoch_dir = epoch_dir
        self.prior_parts = prior_parts
        self.salt = salt
        self.target_schema = target_schema
        self.write_mode = write_mode
        self.mor_compact_runs = mor_compact_runs

    def _mor_delta(self, part: int, salt_val: int) -> bool:
        """True when this slot should append a delta run instead of a
        full rewrite: MOR mode, a matching-layout prior exists (else the
        first write IS the base run anyway), and the slot is not due for
        inline compaction (run count would exceed ``mor_compact_runs``)."""
        if self.write_mode != "mor":
            return False
        entry = self.prior_parts.get(part)
        if not entry or entry.get("salt", 1) != self.salt:
            return False
        prior_runs = [f for f in entry["files"] if f["salt"] == salt_val]
        if not prior_runs:
            return False
        if self.mor_compact_runs and len(prior_runs) + 1 > self.mor_compact_runs:
            return False
        return True

    def _read_prior(self, part: int, salt_val: int) -> pa.Table | None:
        entry = self.prior_parts.get(part)
        if not entry:
            return None
        if entry.get("salt", 1) == self.salt:
            # layout matches: this salt slot's rows live only in files
            # tagged with the same salt
            files = [f for f in entry["files"] if f["salt"] == salt_val]
            if not files:
                return None
            tables = [
                pq.read_table(os.path.join(self.root, f["path"])) for f in files
            ]
            # permissive: MOR slots accumulate runs across epochs whose
            # schemas may differ post-evolution; LWW downstream resolves
            # overlapping keys, so a plain union is all that's needed
            return (
                pa.concat_tables(tables, promote_options="permissive")
                if len(tables) > 1
                else tables[0]
            )
        # layout MISMATCH (e.g. a salt=8 table later tailed into salt=1
        # runs, or vice versa): this slot's keys may be spread across all
        # prior files — read the whole partition and filter to the keys
        # this (part, salt) group owns (turn_idx % salt == salt_val).
        tables = [
            pq.read_table(os.path.join(self.root, f["path"]))
            for f in entry["files"]
        ]
        allt = (
            pa.concat_tables(tables, promote_options="permissive")
            if len(tables) > 1
            else tables[0]
        )
        if self.salt <= 1:
            return allt
        import numpy as np

        turn = allt.column("turn_idx").to_numpy(zero_copy_only=False)
        mask = (turn.astype(np.int64) % self.salt) == salt_val
        return allt.filter(pa.array(mask))

    def __call__(self, group: pa.Table) -> pa.Table:
        part = group.column("part")[0].as_py()
        salt_val = (
            group.column("salt")[0].as_py() if "salt" in group.schema.names else 0
        )
        events = group.drop_columns(
            [c for c in ("part", "salt") if c in group.schema.names]
        )
        return self.merge_and_write(
            part, salt_val, events, prededuped=False, events_applied=events.num_rows
        )

    def merge_and_write(
        self,
        part: int,
        salt_val: int,
        events: pa.Table,
        prededuped: bool,
        events_applied: int | None = None,
    ) -> pa.Table:
        """``prededuped=True`` means ``events`` is already one key-ordered
        winner row per key (the direct exchange dedups all its groups in
        one narrow lexsort) — skip the per-group re-sort when there is no
        prior snapshot to merge against."""
        delta = self._mor_delta(part, salt_val)
        if delta:
            # merge-on-read: write ONLY this epoch's winners; the prior
            # runs stay on disk untouched and readers LWW-merge the slot
            prior = None
        else:
            prior = self._read_prior(part, salt_val)
        if prior is None and prededuped:
            merged = snapshot_form(events)
        else:
            merged = merge_with_snapshot(events, prior)
        merged = normalize_batch(merged, self.target_schema)

        suffix = "-d" if delta else ""
        rel = os.path.join(
            "data",
            self.epoch_dir,
            f"part-{part:05d}-s{salt_val:02d}{suffix}.parquet",
        )
        abs_path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        pq.write_table(merged, abs_path)

        deleted = merged.column("_deleted")
        n_tomb = pc.sum(pc.cast(deleted, pa.int64())).as_py()
        n_tomb = 0 if n_tomb is None else n_tomb
        wm_part = pc.max(merged.column("_offset")).as_py()
        wm_part = -1 if wm_part is None else wm_part
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "salt": pa.array([salt_val], pa.int32()),
                "path": pa.array([rel]),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "live_rows": pa.array([merged.num_rows - n_tomb], pa.int64()),
                "tombstones": pa.array([n_tomb], pa.int64()),
                "watermark": pa.array([wm_part], pa.int64()),
                "events_applied": pa.array(
                    [events.num_rows if events_applied is None else events_applied],
                    pa.int64(),
                ),
                "bytes": pa.array([os.path.getsize(abs_path)], pa.int64()),
                "delta": pa.array([delta], pa.bool_()),
            }
        )


# --- direct hash exchange (the fast path for the ONE shuffle) ----------------


@ray.remote(num_cpus=0)
class _ExchangeActor:
    """Zero-CPU receiving end of the direct hash exchange.

    Each actor owns a strided set of (part, salt) groups. During
    routing it only appends zero-copy Arrow slices (num_cpus=0 so the
    decode tasks keep every CPU); ``finalize`` then does the per-group
    merge+write via the same ``_MergeWrite`` as the sort path — output
    files are byte-identical between exchanges (the arg-max merge is
    input-order-independent).

    Actors live in a WARM per-session pool (``_cdc_exchange_pool``) and
    are reused across epochs/tables — spawning 32 processes per ingest
    cost 2-3 s, which dominated small epochs. Per-RUN state is keyed by
    a unique ``tag`` (configured via ``begin``)."""

    def __init__(self):
        self.runs: dict[str, dict] = {}

    def begin(self, tag: str, writer: "_MergeWrite", salt: int, compact_rows: int) -> bool:
        self.runs[tag] = {
            "writer": writer,
            "salt": salt,
            "compact_rows": compact_rows,
            "frags": [],
            "buffered_rows": 0,
            # per-gid routed-event counts, accumulated BEFORE compaction
            # so events_applied / lineage count every routed event even
            # when the combiner collapses the buffer to winners-only
            "raw_counts": {},
        }
        return True

    @staticmethod
    def _count_gids(st: dict, gid) -> None:
        import numpy as np

        vals, counts = np.unique(gid, return_counts=True)
        rc = st["raw_counts"]
        for g, c in zip(vals.tolist(), counts.tolist()):
            rc[int(g)] = rc.get(int(g), 0) + int(c)

    @staticmethod
    def _maybe_compact(st: dict):
        if st["buffered_rows"] < st["compact_rows"] or not st["frags"]:
            return
        import numpy as np

        allt = pa.concat_tables(st["frags"], promote_options="permissive")
        gid = allt.column("_gid").to_numpy(zero_copy_only=False).astype(np.int64)
        winners, _ = winner_indices(allt, outer=gid)
        st["frags"] = [allt.take(pa.array(np.sort(winners)))]
        st["buffered_rows"] = st["frags"][0].num_rows

    def apply(self, tag: str, t: pa.Table) -> int:
        st = self.runs[tag]
        st["frags"].append(t)
        st["buffered_rows"] += t.num_rows
        self._count_gids(st, t.column("_gid").to_numpy(zero_copy_only=False))
        self._maybe_compact(st)
        return t.num_rows

    def apply_shared(self, tag: str, t: pa.Table, aid: int, num_actors: int) -> int:
        """Shared-object routing: the WHOLE decoded batch is put in the
        object store once; every actor zero-copy-reads it and takes only
        its own groups (gid % num_actors == aid). Saves the map-side
        sort+slice copy of the wide payload — on this exchange the data
        is copied exactly twice total (actor take + parquet encode)."""
        import numpy as np

        st = self.runs[tag]
        gid = t.column("_gid").to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(gid % num_actors == aid)
        if len(idx) == 0:
            return 0
        mine = t.take(pa.array(idx))
        st["frags"].append(mine)
        st["buffered_rows"] += len(idx)
        self._count_gids(st, gid[idx])
        self._maybe_compact(st)
        return len(idx)

    def finalize(self, tag: str) -> list[dict]:
        import numpy as np

        st = self.runs.pop(tag)
        if not st["frags"]:
            return []
        allt = pa.concat_tables(st["frags"], promote_options="permissive")
        gid = allt.column("_gid").to_numpy(zero_copy_only=False).astype(np.int64)
        # ONE narrow lexsort dedups every owned group at once; the wide
        # payload is then touched once per group (winner rows only).
        winners, wgid = winner_indices(allt, outer=gid)
        raw_counts = st["raw_counts"]  # accumulated pre-compaction
        allt = allt.drop_columns(["_gid"])
        bounds = np.flatnonzero(np.r_[True, wgid[1:] != wgid[:-1]])
        out = []
        salt = st["salt"]
        writer = st["writer"]
        for i, b in enumerate(bounds):
            end = bounds[i + 1] if i + 1 < len(bounds) else len(wgid)
            g = int(wgid[b])
            part, salt_val = g // salt, g % salt
            group = allt.take(pa.array(winners[b:end]))
            stat = writer.merge_and_write(
                part,
                salt_val,
                group,
                prededuped=True,
                events_applied=int(raw_counts[g]),
            )
            out.append({c: stat.column(c)[0].as_py() for c in stat.schema.names})
        return out

    def abort(self, tag: str) -> bool:
        """Drop a failed run's buffers (driver try/finally) — the warm
        pool outlives the run, so a raised route/merge must not leave
        its Arrow frags pinned in the session-lifetime actors."""
        self.runs.pop(tag, None)
        return True

    def ping(self) -> bool:
        return True


_CDC_POOL: list = []
_CDC_TAG = [0]


def _cdc_exchange_pool(n: int) -> list:
    """Warm pool of exchange actors for this Ray session; revived if the
    session restarted."""
    global _CDC_POOL
    if _CDC_POOL:
        try:
            ray.get(_CDC_POOL[0].ping.remote())
        except Exception:
            _CDC_POOL = []
    while len(_CDC_POOL) < n:
        _CDC_POOL.append(_ExchangeActor.remote())
    return _CDC_POOL[:n]


def _direct_exchange(
    ds: ray.data.Dataset,
    writer: "_MergeWrite",
    B: int,
    S: int,
    num_actors: int,
    compact_rows: int = 4_000_000,
) -> list[dict]:
    """Route decoded batches straight to per-group-range actors.

    One all-to-all data movement, no sort: each decode batch is split by
    destination actor (vectorized argsort+slice — one copy), shipped via
    the object store, and acked (the ``ray.get`` is the backpressure).
    The driver never holds row data; it only collects B×S stat dicts.

    Multi-node note: actor placement spreads over the cluster (Ray
    SPREAD default for actors); each fragment moves node-to-node exactly
    once — the same byte movement a shuffle needs, minus sort CPU and
    minus the map-side fragment explosion."""
    import numpy as np

    n_groups = B * S
    if num_actors is None:
        num_actors = max(2, int(ray.cluster_resources().get("CPU", 8)))
    actors = _cdc_exchange_pool(min(num_actors, n_groups))
    A = len(actors)
    _CDC_TAG[0] += 1
    tag = f"cdc{_CDC_TAG[0]}"
    ray.get([a.begin.remote(tag, writer, S, compact_rows) for a in actors])

    def route(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy(zero_copy_only=False).astype(np.int64)
        if S > 1:
            salt = batch.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
            gid = part * S + salt
            batch = batch.drop_columns(["part", "salt"])
        else:
            gid = part * S
            batch = batch.drop_columns(["part"])
        batch = batch.append_column("_gid", pa.array(gid.astype(np.int32), pa.int32()))
        # one shared put; every actor zero-copy-reads and takes its rows
        # (gid % A interleaving spreads a hot partition's salt groups
        # over different actors)
        bref = ray.put(batch)
        refs = [a.apply_shared.remote(tag, bref, i, A) for i, a in enumerate(actors)]
        applied = sum(ray.get(refs))
        return pa.table({"applied": pa.array([applied], pa.int64())})

    ok = False
    try:
        # max_retries=0: routing mutates receiver-actor state — a Ray
        # task retry would re-apply its batches (duplicate events). A
        # mid-route worker loss fails the epoch instead; the whole
        # ingest is idempotent (deterministic merge + manifest flip),
        # so the caller re-runs the epoch.
        routed = ds.map_batches(
            route, batch_format="pyarrow", max_retries=0
        )
        routed.take_all()  # drives the routing to completion (counts only)
        nested = ray.get([a.finalize.remote(tag) for a in actors])
        ok = True
    finally:
        if not ok:  # failed run: unpin its frags from the warm pool
            for a in actors:
                try:
                    a.abort.remote(tag)
                except Exception:
                    pass
    return [r for rows in nested for r in rows]


# --- the engine --------------------------------------------------------------


def run_ingest(
    wal_dir: str,
    table_root: str,
    config: CDCConfig | None = None,
) -> CommitResult:
    """Apply all WAL events beyond the committed watermark; one epoch.

    Exactly-once: replaying an already-committed segment set is a no-op
    (plan finds nothing above the watermark); a crash before the final
    manifest flip leaves the table at the previous epoch, and the retry
    recomputes byte-identical partition files (deterministic merge).
    """
    cfg = config or CDCConfig()
    if cfg.mode not in ("upsert", "refresh"):
        raise InvalidConfigError(f"unknown mode {cfg.mode!r}")
    if cfg.write_mode not in ("cow", "mor"):
        raise InvalidConfigError(f"unknown write_mode {cfg.write_mode!r}")
    manifest = load_manifest(table_root)
    refresh = cfg.mode == "refresh"
    wm = -1 if refresh else (manifest["global_watermark"] if manifest else -1)
    chosen, new_wm, schema_groups = plan_segments(wal_dir, wm)
    if not chosen:
        return CommitResult(
            epoch=manifest["epoch"] if manifest else 0,
            global_watermark=wm,
            events_read=0,
            partitions_updated=0,
            manifest=manifest or {},
            skipped=True,
        )

    # X3: unified change schema = all segment schemas + (on incremental
    # epochs) the columns already committed — widening only.
    seg_schemas = [pq.read_schema(g[0]) for g in schema_groups]
    prior_public = public_schema(manifest) if (manifest and not refresh) else None
    to_unify = list(seg_schemas)
    if prior_public is not None:
        to_unify.append(
            pa.schema([f for f in prior_public if f.name not in INTERNAL_COLS])
        )
    unified_change = unify_schemas(to_unify)
    # public transcript schema = change schema minus (offset, op)
    unified_public = pa.schema(
        [f for f in unified_change if f.name not in CHANGE_META_COLS]
    )
    snapshot_target = pa.schema(
        list(unified_public)
        + [pa.field("_offset", pa.int64()), pa.field("_deleted", pa.bool_())]
    )

    required = cfg.required
    strict = cfg.strict
    # num_partitions and salt are TABLE properties: fixed at creation
    # (a different B would re-hash keys so merges miss prior rows; a
    # different salt would orphan unrewritten runs). Incremental epochs
    # read BOTH from the committed manifest, ignoring the config value.
    if manifest and not refresh and manifest.get("num_partitions"):
        B = int(manifest["num_partitions"])
    else:
        B = cfg.num_partitions
    if manifest and not refresh and manifest.get("metrics", {}).get("salt"):
        S = int(manifest["metrics"]["salt"])
    else:
        S = cfg.salt

    def decode(batch: pa.Table) -> pa.Table:
        # X2: validate + coerce + watermark filter, vectorized
        batch = validate_batch(batch, unified_change, required=required, strict=strict)
        ok_op = pc.is_in(batch.column("op"), value_set=pa.array(VALID_OPS))
        if not pc.all(ok_op).as_py():
            if strict:
                raise SchemaValidationError("invalid op value in change batch")
            batch = batch.filter(ok_op)
        if wm >= 0:
            batch = batch.filter(pc.greater(batch.column("offset"), wm))
        return add_partition_cols(batch, B, S)

    parts_ds = []
    for grp in schema_groups:
        parts_ds.append(
            ray.data.read_parquet(grp).map_batches(
                decode, batch_format="pyarrow", batch_size=cfg.batch_size
            )
        )
    ds = parts_ds[0]
    for other in parts_ds[1:]:
        ds = ds.union(other)

    prior_parts: dict[int, dict] = {}
    if manifest and not refresh:
        prior_parts = {int(k): v for k, v in manifest["partitions"].items()}

    epoch = (manifest["epoch"] if manifest else 0) + 1
    job_desc = "|".join(
        [
            "ingest",
            cfg.mode,
            cfg.write_mode,
            str(wm),
            f"B{B}",
            f"S{S}",
            ",".join(os.path.basename(p) for p in chosen),
        ]
    )
    writer = _MergeWrite(
        root=table_root,
        epoch_dir=attempt_epoch_dir(epoch, job_desc),
        prior_parts=prior_parts,
        salt=S,
        target_schema=snapshot_target,
        write_mode=cfg.write_mode,
        mor_compact_runs=cfg.mor_compact_runs,
    )

    exchange = cfg.exchange
    if exchange == "auto":
        # planned epoch size from parquet footers only (no data read)
        planned_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in chosen)
        exchange = "direct" if planned_rows >= cfg.auto_exchange_threshold else "sort"

    if exchange == "direct":
        stats = _direct_exchange(
            ds, writer, B, S, cfg.num_exchange_actors, cfg.exchange_compact_rows
        )
    elif exchange == "sort":

        def merge_write(group: pa.Table) -> pa.Table:
            return writer(group)

        group_keys = ["part", "salt"] if S > 1 else ["part"]
        stats_ds = ds.groupby(group_keys).map_groups(
            merge_write, batch_format="pyarrow"
        )
        stats = stats_ds.take_all()  # ≤ B×S tiny rows on the driver
    else:
        raise InvalidConfigError(f"unknown exchange {exchange!r}")

    # assemble per-partition entries: this epoch's runs + carried-forward
    # prior runs. A full (COW) rewrite of a salt slot REPLACES that
    # slot's prior files; a delta (MOR) run is APPENDED to them — readers
    # LWW-merge multi-run slots, so rows/live_rows on a MOR entry are
    # physical-run sums (an upper bound on live keys) until compaction.
    by_part: dict[int, list[dict]] = {}
    for r in stats:
        by_part.setdefault(int(r["part"]), []).append(r)
    updated: dict[str, dict] = {}
    for part, rows in by_part.items():
        full_salts = {int(r["salt"]) for r in rows if not r.get("delta")}
        files = [
            {
                "path": r["path"],
                "salt": int(r["salt"]),
                "rows": int(r["rows"]),
                "live_rows": int(r["live_rows"]),
                "tombstones": int(r["tombstones"]),
                "bytes": int(r["bytes"]),
                "epoch": epoch,
                **({"delta": True} if r.get("delta") else {}),
            }
            for r in sorted(rows, key=lambda x: int(x["salt"]))
        ]
        prior = prior_parts.get(part)
        if prior:
            if prior.get("salt", 1) != S:
                raise InvalidConfigError(
                    f"partition {part} has salt={prior.get('salt', 1)} runs but "
                    f"this epoch uses salt={S}; re-salt first via "
                    "compact(table_root, to_salt=...) — carrying mismatched "
                    "runs forward would duplicate keys"
                )
            files += [f for f in prior["files"] if f["salt"] not in full_salts]
        wm_new = max(int(r["watermark"]) for r in rows)
        if prior:
            wm_new = max(wm_new, prior.get("watermark", -1))
        updated[str(part)] = {
            "files": files,
            "salt": S,
            "rows": sum(f["rows"] for f in files),
            "live_rows": sum(f["live_rows"] for f in files),
            "tombstones": sum(f["tombstones"] for f in files),
            "bytes": sum(f["bytes"] for f in files),
            "watermark": wm_new,
            "events_applied": sum(int(r["events_applied"]) for r in rows),
            "epoch": epoch,
        }
    events_read = sum(int(r["events_applied"]) for r in stats)
    new_manifest = commit_manifest(
        table_root,
        manifest,
        table=cfg.table_name,
        num_partitions=B,
        schema=snapshot_target,
        new_watermark=new_wm,
        updated_partitions=updated,
        replace_all=refresh,
        metrics={
            "epoch_events_applied": events_read,
            "segments": [os.path.basename(p) for p in chosen],
            "salt": S,
            "mode": cfg.mode,
        },
    )
    return CommitResult(
        epoch=epoch,
        global_watermark=new_wm,
        events_read=events_read,
        partitions_updated=len(updated),
        manifest=new_manifest,
    )


# --- compaction (LSM maintenance) --------------------------------------------


def compact(
    table_root: str,
    drop_tombstones: bool = False,
    to_salt: int | None = None,
    min_tombstone_ratio: float = 0.0,
) -> CommitResult:
    """Rewrite partitions into one file per salt run at the current
    epoch. (Each incremental epoch already rewrites its TOUCHED salt
    slots fully merged, so steady-state layout is one file per slot —
    compaction exists for the table-maintenance moves that ingest never
    does: re-salting the layout and garbage-collecting tombstones.)

    ``drop_tombstones=True`` garbage-collects delete markers — ONLY
    safe once no event with ``ts`` older than the tombstones can still
    arrive (the operator's late-data horizon); with the default False,
    compaction never changes read results (tested).

    One Ray task per partition (no shuffle — each partition's runs are
    already co-located by construction); the commit is the same atomic
    manifest flip, so a crashed compaction leaves the table untouched.

    ``min_tombstone_ratio`` is the partial-GC policy knob (applies with
    ``drop_tombstones=True``): only partitions whose tombstone share
    (tombstones / rows) reaches the ratio are rewritten; the rest carry
    forward untouched. At 10^10 events most partitions are cold — a
    full rewrite every GC cycle would be pure write amplification, so
    target the partitions actually holding garbage.
    """
    manifest = load_manifest(table_root)
    if manifest is None or not manifest["partitions"]:
        return CommitResult(
            epoch=0, global_watermark=-1, events_read=0,
            partitions_updated=0, manifest=manifest or {}, skipped=True,
        )
    epoch = manifest["epoch"] + 1
    target = public_schema(manifest)
    fields = [(f.name, str(f.type), f.nullable) for f in target]
    cur_salt = int(manifest.get("metrics", {}).get("salt", 1))
    new_salt = cur_salt if to_salt is None else to_salt
    epoch_dir = attempt_epoch_dir(
        epoch,
        f"compact|{drop_tombstones}|{new_salt}|{min_tombstone_ratio}"
        f"|{manifest['global_watermark']}",
    )

    @ray.remote
    def compact_part(part: int, entry: dict) -> list[dict]:
        import numpy as np

        from ..schema import fields_to_schema

        tgt = fields_to_schema(
            [{"id": n, "type": t, "nullable": nu} for n, t, nu in fields]
        )
        out = []
        if new_salt == entry.get("salt", 1):
            by_salt: dict[int, list[dict]] = {}
            for f in entry["files"]:
                by_salt.setdefault(f["salt"], []).append(f)
            groups = [
                (salt_val, [pq.read_table(os.path.join(table_root, f["path"])) for f in files])
                for salt_val, files in sorted(by_salt.items())
            ]
        else:
            # re-salt: merge the whole partition, then split by the new
            # salt key (turn_idx % new_salt)
            whole = [
                pq.read_table(os.path.join(table_root, f["path"]))
                for f in entry["files"]
            ]
            allt = (
                pa.concat_tables(whole, promote_options="permissive")
                if len(whole) > 1
                else whole[0]
            )
            turn = allt.column("turn_idx").to_numpy(zero_copy_only=False)
            groups = [
                (sv, [allt.filter(pa.array((turn.astype(np.int64) % max(new_salt, 1)) == sv))])
                for sv in range(max(new_salt, 1))
            ]
        for salt_val, tables in groups:
            merged = merge_with_snapshot(
                snapshot_as_events_multi(tables), None
            )
            merged = normalize_batch(merged, tgt)
            if drop_tombstones:
                merged = merged.filter(
                    pc.equal(merged.column("_deleted"), False)
                )
            rel = os.path.join(
                "data", epoch_dir, f"part-{part:05d}-s{salt_val:02d}.parquet"
            )
            abs_path = os.path.join(table_root, rel)
            os.makedirs(os.path.dirname(abs_path), exist_ok=True)
            pq.write_table(merged, abs_path)
            deleted = merged.column("_deleted")
            n_tomb = pc.sum(pc.cast(deleted, pa.int64())).as_py() or 0
            out.append(
                {
                    "path": rel,
                    "salt": salt_val,
                    "rows": merged.num_rows,
                    "live_rows": merged.num_rows - n_tomb,
                    "tombstones": n_tomb,
                    "bytes": os.path.getsize(abs_path),
                    "epoch": epoch,
                }
            )
        return out

    parts = {int(k): v for k, v in manifest["partitions"].items()}
    if drop_tombstones and min_tombstone_ratio > 0 and to_salt is None:
        parts = {
            p: e
            for p, e in parts.items()
            if e.get("rows", 0)
            and e.get("tombstones", 0) / e["rows"] >= min_tombstone_ratio
        }
        if not parts:
            return CommitResult(
                epoch=manifest["epoch"], global_watermark=manifest["global_watermark"],
                events_read=0, partitions_updated=0, manifest=manifest, skipped=True,
            )
    results = ray.get(
        [compact_part.remote(p, e) for p, e in sorted(parts.items())]
    )
    updated = {}
    for (p, prior_entry), files in zip(sorted(parts.items()), results):
        updated[str(p)] = {
            "files": files,
            "salt": new_salt,
            "rows": sum(f["rows"] for f in files),
            "live_rows": sum(f["live_rows"] for f in files),
            "tombstones": sum(f["tombstones"] for f in files),
            "bytes": sum(f["bytes"] for f in files),
            "watermark": prior_entry.get("watermark", -1),
            "events_applied": 0,
            "epoch": epoch,
        }
    new_manifest = commit_manifest(
        table_root,
        manifest,
        table=manifest["table"],
        num_partitions=manifest["num_partitions"],
        schema=target,
        new_watermark=manifest["global_watermark"],
        updated_partitions=updated,
        metrics={
            "mode": "compact",
            "drop_tombstones": drop_tombstones,
            "salt": new_salt,
        },
    )
    return CommitResult(
        epoch=new_manifest["epoch"],
        global_watermark=manifest["global_watermark"],
        events_read=0,
        partitions_updated=len(updated),
        manifest=new_manifest,
    )


def merge_into(
    table_root: str,
    source: ray.data.Dataset,
    config: CDCConfig | None = None,
    job_id: str = "merge",
    update_cols: list[str] | None = None,
) -> CommitResult:
    """MERGE INTO: apply a source Dataset of keyed rows to the committed
    table in one atomic epoch — the Delta/Hudi ``MERGE`` shape, distinct
    from WAL ingest in that the source is arbitrary query output, source
    rows win unconditionally when matched (no LWW on ``ts``), and the
    watermark does not move.

    ``update_cols``: the SQL ``UPDATE SET col, …`` clause — when given,
    a MATCHED upsert replaces only those payload columns and keeps the
    prior row's values everywhere else (partial update, the common CDC
    enrichment case); unmatched upserts insert the source row as-is
    (unlisted columns null). Default None = whole-row replace.

    Source schema: the key columns (conv_id, turn_idx), any payload
    columns (new columns widen the table schema — evolution through
    MERGE), and an optional ``_action`` column: 'upsert' (default when
    absent) updates matched keys / inserts unmatched ones; 'delete'
    tombstones matched LIVE keys and no-ops otherwise. Duplicate source
    keys raise (the ANSI/Delta MERGE cardinality rule). Result rows
    carry ``_offset`` = the current watermark, so later WAL events
    still win their LWW tie-breaks against merged rows.

    Shape: source rows take the SAME hash partitioner as ingest and one
    groupby shuffle co-locates them with their (part, salt) slot; each
    touched slot is rewritten fully merged (COW) by its merge task —
    index-only matching (pandas ``MultiIndex.get_indexer`` on the
    narrow key columns), payloads moved by Arrow ``take`` so carried
    rows stay byte-stable; untouched slots carry forward. Concurrent
    distinct merges must pass distinct ``job_id`` (content-addresses
    the attempt dir); the manifest flip rejects the loser."""
    cfg = config or CDCConfig()
    manifest = load_manifest(table_root)
    if manifest is None:
        raise InvalidConfigError(f"no committed table at {table_root} to merge into")
    B = int(manifest["num_partitions"])
    S = int(manifest.get("metrics", {}).get("salt", 1))
    wm = int(manifest["global_watermark"])
    epoch = int(manifest["epoch"]) + 1
    epoch_dir = attempt_epoch_dir(epoch, f"merge|{job_id}|{wm}|{epoch}")
    prior_parts = {int(k): v for k, v in manifest["partitions"].items()}

    target = public_schema(manifest)
    from ..schema import dataset_schema

    src_schema = dataset_schema(source)
    missing = [k for k in KEY_COLUMNS if k not in src_schema.names]
    if missing:
        raise InvalidConfigError(
            f"MERGE source lacks key column(s) {missing}; every row must "
            f"carry {list(KEY_COLUMNS)}"
        )
    src_fields = [f for f in src_schema if f.name != "_action"]
    unified_pub = unify_schemas(
        [pa.schema([f for f in target if f.name not in INTERNAL_COLS]),
         pa.schema(src_fields)]
    )
    snapshot_target = pa.schema(
        list(unified_pub)
        + [pa.field("_offset", pa.int64()), pa.field("_deleted", pa.bool_())]
    )
    fields = [(f.name, str(f.type), f.nullable) for f in snapshot_target]
    key_cols = list(KEY_COLUMNS)

    def route(batch: pa.Table) -> pa.Table:
        return add_partition_cols(batch, B, S)

    reader = _MergeWrite(
        root=table_root,
        epoch_dir=epoch_dir,
        prior_parts=prior_parts,
        salt=S,
        target_schema=snapshot_target,
    )

    def merge_task(group: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        from ..schema import fields_to_schema

        tgt = fields_to_schema(
            [{"id": n, "type": t, "nullable": nu} for n, t, nu in fields]
        )
        part = group.column("part")[0].as_py()
        salt_val = group.column("salt")[0].as_py() if "salt" in group.schema.names else 0
        src = group.drop_columns(
            [c for c in ("part", "salt") if c in group.schema.names]
        )
        if "_action" in src.schema.names:
            action = src.column("_action").to_numpy(zero_copy_only=False)
            src = src.drop_columns(["_action"])
        else:
            action = np.full(src.num_rows, "upsert", dtype=object)
        is_del = action == "delete"

        prior = reader._read_prior(part, salt_val)
        if prior is not None and prior.num_rows:
            # collapse multi-run (MOR) priors to the live LWW view
            prior = merge_with_snapshot(snapshot_as_events_multi([prior]), None)
            prior = normalize_batch(prior, tgt)

        sk = pd.MultiIndex.from_arrays(
            [src.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        )
        if sk.duplicated().any():
            raise SchemaValidationError(
                f"duplicate source keys in MERGE (partition {part})"
            )
        if prior is not None and prior.num_rows:
            pk = pd.MultiIndex.from_arrays(
                [prior.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
            )
            idx = pk.get_indexer(sk)
            p_dead = prior.column("_deleted").to_numpy(zero_copy_only=False)
        else:
            idx = np.full(src.num_rows, -1, dtype=np.int64)
            p_dead = np.zeros(0, dtype=bool)
        matched = idx >= 0
        matched_live = matched.copy()
        matched_live[matched] = ~p_dead[idx[matched]]

        # prior rows replaced: any matched upsert; tombstoned: matched
        # live delete. (Upserting a tombstoned key replaces the marker.)
        replaced = idx[matched & (~is_del | matched_live)]
        outs = []
        if prior is not None and prior.num_rows:
            keep = np.ones(prior.num_rows, dtype=bool)
            keep[replaced] = False
            outs.append(prior.filter(pa.array(keep)))
        ups = src.filter(pa.array(~is_del))
        if ups.num_rows:
            if update_cols is not None and prior is not None and prior.num_rows:
                # partial update: matched rows carry prior values for
                # columns outside the SET list; one prior.take aligns
                # them (unmatched rows take nulls — plain insert)
                up_idx = idx[~is_del]
                up_matched = up_idx >= 0
                safe = np.where(up_matched, up_idx, 0)
                aligned = prior.take(pa.array(safe))
                keep_set = set(update_cols) | set(key_cols)
                for c in [f.name for f in tgt if f.name not in INTERNAL_COLS]:
                    if c in keep_set:
                        continue
                    prior_col = (
                        aligned.column(c)
                        if c in aligned.schema.names
                        else pa.nulls(ups.num_rows, tgt.field(c).type)
                    )
                    src_col = (
                        ups.column(c).cast(tgt.field(c).type)
                        if c in ups.schema.names
                        else pa.nulls(ups.num_rows, tgt.field(c).type)
                    )
                    merged_col = pc.if_else(
                        pa.array(up_matched),
                        prior_col.combine_chunks()
                        if isinstance(prior_col, pa.ChunkedArray)
                        else prior_col,
                        src_col.combine_chunks()
                        if isinstance(src_col, pa.ChunkedArray)
                        else src_col,
                    )
                    if c in ups.schema.names:
                        ups = ups.set_column(
                            ups.schema.get_field_index(c), c, merged_col
                        )
                    else:
                        ups = ups.append_column(c, merged_col)
            t = ups.append_column(
                "_offset", pa.array(np.full(ups.num_rows, wm, np.int64), pa.int64())
            ).append_column("_deleted", pa.array(np.zeros(ups.num_rows, bool)))
            outs.append(normalize_batch(t, tgt))
        dels = src.filter(pa.array(is_del & matched_live))
        if dels.num_rows:
            # tombstone: keys + ts survive, other payload nulls
            cols = {c: dels.column(c) for c in key_cols}
            if "ts" in dels.schema.names:
                cols["ts"] = dels.column("ts")
            t = pa.table(cols)
            t = t.append_column(
                "_offset", pa.array(np.full(t.num_rows, wm, np.int64), pa.int64())
            ).append_column("_deleted", pa.array(np.ones(t.num_rows, bool)))
            outs.append(normalize_batch(t, tgt))
        if not outs:  # e.g. only unmatched deletes into an empty slot
            outs.append(tgt.empty_table())
        merged = pa.concat_tables(outs) if len(outs) > 1 else outs[0]
        merged = merged.sort_by([(k, "ascending") for k in key_cols])

        rel = os.path.join(
            "data", epoch_dir, f"part-{part:05d}-s{salt_val:02d}.parquet"
        )
        abs_path = os.path.join(table_root, rel)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        pq.write_table(merged, abs_path)
        n_tomb = pc.sum(pc.cast(merged.column("_deleted"), pa.int64())).as_py() or 0
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "salt": pa.array([salt_val], pa.int32()),
                "path": pa.array([rel]),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "live_rows": pa.array([merged.num_rows - n_tomb], pa.int64()),
                "tombstones": pa.array([n_tomb], pa.int64()),
                "watermark": pa.array([wm], pa.int64()),
                "events_applied": pa.array([src.num_rows], pa.int64()),
                "bytes": pa.array([os.path.getsize(abs_path)], pa.int64()),
            }
        )

    routed = source.map_batches(route, batch_format="pyarrow")
    group_keys = ["part", "salt"] if S > 1 else ["part"]
    stats = (
        routed.groupby(group_keys)
        .map_groups(merge_task, batch_format="pyarrow")
        .take_all()
    )

    by_part: dict[int, list[dict]] = {}
    for r in stats:
        by_part.setdefault(int(r["part"]), []).append(r)
    updated: dict[str, dict] = {}
    for part, rows in by_part.items():
        new_salts = {int(r["salt"]) for r in rows}
        files = [
            {
                "path": r["path"],
                "salt": int(r["salt"]),
                "rows": int(r["rows"]),
                "live_rows": int(r["live_rows"]),
                "tombstones": int(r["tombstones"]),
                "bytes": int(r["bytes"]),
                "epoch": epoch,
            }
            for r in sorted(rows, key=lambda x: int(x["salt"]))
        ]
        prior = prior_parts.get(part)
        if prior:
            files += [f for f in prior["files"] if f["salt"] not in new_salts]
        wm_part = max(int(r["watermark"]) for r in rows)
        if prior:
            wm_part = max(wm_part, prior.get("watermark", -1))
        updated[str(part)] = {
            "files": files,
            "salt": S,
            "rows": sum(f["rows"] for f in files),
            "live_rows": sum(f["live_rows"] for f in files),
            "tombstones": sum(f["tombstones"] for f in files),
            "bytes": sum(f["bytes"] for f in files),
            "watermark": wm_part,
            "events_applied": sum(int(r["events_applied"]) for r in rows),
            "epoch": epoch,
        }
    n_src = sum(int(r["events_applied"]) for r in stats)
    new_manifest = commit_manifest(
        table_root,
        manifest,
        table=manifest["table"],
        num_partitions=B,
        schema=snapshot_target,
        new_watermark=wm,
        updated_partitions=updated,
        metrics={"mode": "merge", "salt": S, "merge_source_rows": n_src},
    )
    return CommitResult(
        epoch=new_manifest["epoch"],
        global_watermark=wm,
        events_read=n_src,
        partitions_updated=len(updated),
        manifest=new_manifest,
    )


def delete_where(
    table_root: str,
    predicate,
    config: CDCConfig | None = None,
    job_id: str = "delete_where",
) -> CommitResult:
    """Bulk ``DELETE FROM … WHERE``: one streamed scan evaluates the
    predicate (an Arrow-batch → boolean-mask callable) over the live
    table, and the matching KEYS (never payload) feed a tombstoning
    MERGE — untouched partitions carry forward, the usual atomic epoch.
    The retention/TTL/GDPR eraser."""
    import numpy as np

    def to_keys(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        if not isinstance(mask, pa.Array):
            mask = pa.array(np.asarray(mask, bool))
        hit = batch.filter(mask)
        return pa.table(
            {
                "conv_id": hit.column("conv_id"),
                "turn_idx": hit.column("turn_idx").cast(pa.int64()),
                "_action": pa.array(["delete"] * hit.num_rows, pa.string()),
            }
        )

    src = read_transcripts(table_root).map_batches(to_keys, batch_format="pyarrow")
    return merge_into(table_root, src, config=config, job_id=job_id)


def update_where(
    table_root: str,
    predicate,
    set_fn,
    set_cols: list[str],
    config: CDCConfig | None = None,
    job_id: str = "update_where",
) -> CommitResult:
    """Bulk ``UPDATE … SET cols WHERE``: matching rows stream through
    ``set_fn`` (Arrow batch → batch with the new ``set_cols`` values)
    and re-enter as partial-update MERGE upserts — unlisted columns
    keep their prior values (``merge_into(update_cols=…)``)."""
    def to_updates(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        if not isinstance(mask, pa.Array):
            import numpy as np

            mask = pa.array(np.asarray(mask, bool))
        hit = batch.filter(mask)
        new = set_fn(hit)
        cols = {
            "conv_id": hit.column("conv_id"),
            "turn_idx": hit.column("turn_idx").cast(pa.int64()),
        }
        for c in set_cols:
            cols[c] = new.column(c)
        return pa.table(cols)

    src = read_transcripts(table_root).map_batches(to_updates, batch_format="pyarrow")
    return merge_into(
        table_root, src, config=config, job_id=job_id, update_cols=set_cols
    )


def snapshot_as_events_multi(tables: list[pa.Table]) -> pa.Table:
    """Union several snapshot runs (possibly different epochs/schemas)
    back into event form for a re-merge."""
    from ..stages.merge import snapshot_as_events

    evs = [snapshot_as_events(t) for t in tables]
    if len(evs) == 1:
        return evs[0]
    target = unify_schemas([e.schema for e in evs])
    return pa.concat_tables([normalize_batch(e, target) for e in evs])


# --- read path ---------------------------------------------------------------


def read_transcripts(
    table_root: str,
    columns: list[str] | None = None,
    epoch: int | None = None,
    tag: str | None = None,
) -> ray.data.Dataset:
    """Committed transcripts as a Dataset: manifest-resolved files, tombstones
    filtered, internal columns dropped, per-batch schema normalization so
    pre-evolution partitions surface the unified schema.

    ``epoch`` time-travels: resolve files through that epoch's history
    manifest instead of the current one (every commit keeps
    ``manifest/epoch-{E}.json`` and carried-forward data files are never
    deleted by ingest, so any past version stays readable until a
    refresh/compaction rewrites it).

    Merge-on-read: a (part, salt) slot holding several runs (MOR delta
    ingest) is LWW-merged inside one read task — single-run slots (the
    COW steady state) stream straight off Parquet with no merge cost;
    the merge unit is a slot, the same working set a merge task already
    handles at ingest."""
    import json as _json

    if tag is not None:
        from ..state.manifest import resolve_tag

        epoch = resolve_tag(table_root, tag)
    manifest = load_manifest(table_root) if epoch is None else load_epoch_manifest(
        table_root, epoch
    )
    if manifest is None or not manifest["partitions"]:
        return ray.data.from_arrow(
            pa.table({"conv_id": pa.array([], pa.string())})
        ).limit(0)
    plain_files: list[str] = []
    mor_slots: list[list[str]] = []
    for e in manifest["partitions"].values():
        by_salt: dict[int, list[str]] = {}
        for f in e["files"]:
            if f.get("rows"):
                by_salt.setdefault(int(f.get("salt", 0)), []).append(f["path"])
        for paths in by_salt.values():
            if len(paths) > 1:
                mor_slots.append([os.path.join(table_root, p) for p in paths])
            else:
                plain_files.append(os.path.join(table_root, paths[0]))
    target = public_schema(manifest)
    pub = pa.schema([f for f in target if f.name not in INTERNAL_COLS])
    want = [f.name for f in pub] if columns is None else columns

    def clean(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("_deleted"), False))
        batch = normalize_batch(batch, target)
        return batch.select(want)

    # the slot merge needs only key/order/internal columns + what the
    # caller asked for — prune the run reads to that (a 2-column scan
    # of a wide MOR table should not page in the payload)
    need = list(
        dict.fromkeys(
            list(KEY_COLUMNS) + ["ts", "_offset", "_deleted"] + list(want)
        )
    )

    def merge_slot(batch: pa.Table) -> pa.Table:
        outs = []
        for paths_json in batch.column("paths").to_pylist():
            runs = []
            for p in _json.loads(paths_json):
                avail = [c for c in need if c in pq.read_schema(p).names]
                runs.append(pq.read_table(p, columns=avail))
            merged = merge_with_snapshot(snapshot_as_events_multi(runs), None)
            outs.append(clean(merged))
        return pa.concat_tables(outs) if len(outs) > 1 else outs[0]

    parts = []
    if plain_files:
        parts.append(
            ray.data.read_parquet(plain_files).map_batches(
                clean, batch_format="pyarrow"
            )
        )
    if mor_slots:
        parts.append(
            ray.data.from_items(
                [{"paths": _json.dumps(s)} for s in mor_slots]
            ).map_batches(merge_slot, batch_format="pyarrow", batch_size=1)
        )
    ds = parts[0]
    for other in parts[1:]:
        ds = ds.union(other)
    return ds


def read_conversation(table_root: str, conv_id: str) -> pa.Table:
    """Point lookup: read ONE conversation touching only the partition
    that owns it — `hash(conv_id) % B` resolves the partition from the
    manifest, so a point read costs O(table/B) IO instead of a scan
    (the datastore-GET analog of the reference's resource reads)."""
    from ..stages.partition import partition_of

    manifest = load_manifest(table_root)
    if manifest is None or not manifest["partitions"]:
        return pa.table({})
    B = int(manifest["num_partitions"])
    part = int(partition_of(pa.array([conv_id]), B)[0])
    entry = manifest["partitions"].get(str(part))
    if not entry:
        return pa.table({})
    target = public_schema(manifest)
    tables = []
    for f in entry["files"]:
        t = pq.read_table(os.path.join(table_root, f["path"]))
        t = normalize_batch(t, target)
        tables.append(t.filter(pc.equal(t.column("conv_id"), conv_id)))
    allt = pa.concat_tables(tables)
    if len(tables) > 1:
        # multi-run partition (MOR deltas, or several salt runs): a
        # turn may appear in more than one run — LWW-merge the filtered
        # slice (conversation-sized, so the arg-max is negligible)
        allt = merge_with_snapshot(snapshot_as_events_multi([allt]), None)
        allt = normalize_batch(allt, target)
    allt = allt.filter(pc.equal(allt.column("_deleted"), False))
    allt = allt.drop_columns([c for c in INTERNAL_COLS if c in allt.schema.names])
    return allt.sort_by([("turn_idx", "ascending")])


def read_conversations(
    table_root: str, conv_ids: list[str], columns: list[str] | None = None
) -> ray.data.Dataset:
    """Batched point reads: the live rows of MANY conversations, one
    Ray task per OWNING partition (ids grouped by ``hash(conv_id) % B``
    first, so each partition's files are read exactly once no matter
    how many of its conversations were requested — the shape an
    index-driven fetch needs). Multi-run (MOR) slots LWW-merge inside
    the task; IO is O(touched partitions), never a table scan."""
    import json as _json

    from ..stages.partition import partition_of

    manifest = load_manifest(table_root)
    if manifest is None or not manifest["partitions"] or not conv_ids:
        return ray.data.from_arrow(
            pa.table({"conv_id": pa.array([], pa.string())})
        ).limit(0)
    B = int(manifest["num_partitions"])
    parts = partition_of(pa.array(list(conv_ids)), B)
    by_part: dict[int, list[str]] = {}
    for c, p in zip(conv_ids, parts):
        by_part.setdefault(int(p), []).append(c)
    target = public_schema(manifest)
    pub = pa.schema([f for f in target if f.name not in INTERNAL_COLS])
    want = [f.name for f in pub] if columns is None else columns

    items = []
    for p, convs in sorted(by_part.items()):
        entry = manifest["partitions"].get(str(p))
        if not entry:
            continue
        by_salt: dict[int, list[str]] = {}
        for f in entry["files"]:
            if f.get("rows"):
                by_salt.setdefault(int(f.get("salt", 0)), []).append(
                    os.path.join(table_root, f["path"])
                )
        items.append(
            {
                "convs": _json.dumps(sorted(convs)),
                "slots": _json.dumps(list(by_salt.values())),
            }
        )
    if not items:
        return ray.data.from_arrow(pub.empty_table())

    def fetch(batch: pa.Table) -> pa.Table:
        outs = []
        for convs_json, slots_json in zip(
            batch.column("convs").to_pylist(), batch.column("slots").to_pylist()
        ):
            convs = pa.array(_json.loads(convs_json), pa.string())
            for paths in _json.loads(slots_json):
                runs = []
                for pth in paths:
                    t = pq.read_table(pth)
                    t = t.filter(pc.is_in(t.column("conv_id"), value_set=convs))
                    runs.append(normalize_batch(t, target))
                if len(runs) > 1:
                    merged = merge_with_snapshot(snapshot_as_events_multi(runs), None)
                    merged = normalize_batch(merged, target)
                else:
                    merged = runs[0]
                merged = merged.filter(
                    pc.equal(merged.column("_deleted"), False)
                )
                outs.append(merged.select(want))
        if not outs:
            return pa.schema([target.field(c) for c in want]).empty_table()
        return pa.concat_tables(outs)

    return ray.data.from_items(items).map_batches(
        fetch, batch_format="pyarrow", batch_size=1
    )


def read_transcripts_arrow(table_root: str) -> pa.Table:
    """Small-scale convenience: the full committed table, sorted by key."""
    t = read_transcripts(table_root).to_arrow_refs()
    import ray as _ray

    tables = [b for b in _ray.get(t)]
    tables = [tb for tb in tables if tb.num_rows]
    if not tables:
        return pa.table({})
    target = unify_schemas([tb.schema for tb in tables])
    out = pa.concat_tables([normalize_batch(tb, target) for tb in tables])
    return out.sort_by([(KEY_COLUMNS[0], "ascending"), (KEY_COLUMNS[1], "ascending")])


def vacuum(table_root: str, keep_epochs: int = 2) -> dict:
    """Physical storage reclamation (the Delta/Iceberg VACUUM analog):
    delete data files no longer referenced by the manifests of the last
    ``keep_epochs`` committed epochs. Nothing else ever deletes files,
    so without vacuum a long-running table accumulates every historical
    run forever — the lifecycle piece that matters at 10^10 events.

    Retention contract: time travel (``read_transcripts(epoch=E)``,
    ``table_changes``) keeps working for the retained epochs; older
    epoch manifests are KEPT (lineage is cheap JSON) but their reads
    fail once their files are gone.

    Safety against racing writers: runs under the commit lock, and only
    touches files inside attempt dirs of epochs ≤ the current epoch —
    a future-epoch attempt dir may belong to an in-flight ingest whose
    commit hasn't flipped yet. Attempts at ≤ current epoch can never
    commit (the lock's epoch check rejects them), so their orphans are
    always safe to drop — this also reclaims crashed-run litter the
    two-phase commit made invisible."""
    import glob as _glob

    import fcntl

    mdir = os.path.join(table_root, "manifest")
    deleted, freed = [], 0
    with open(os.path.join(mdir, ".commit.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        cur = load_manifest(table_root)
        if cur is None:
            return {"deleted": 0, "bytes": 0, "kept": 0}
        E = int(cur["epoch"])
        keep: set[str] = set()
        for e in range(max(1, E - keep_epochs + 1), E + 1):
            m = cur if e == E else load_epoch_manifest(table_root, e)
            if m:
                for entry in m["partitions"].values():
                    for f in entry["files"]:
                        keep.add(os.path.normpath(f["path"]))
        for p in _glob.glob(os.path.join(table_root, "data", "*", "*.parquet")):
            rel = os.path.normpath(os.path.relpath(p, table_root))
            if rel in keep:
                continue
            dir_name = os.path.basename(os.path.dirname(p))  # epoch={E:06d}[-token]
            try:
                file_epoch = int(dir_name.split("=", 1)[1].split("-", 1)[0])
            except (IndexError, ValueError):
                continue  # not an attempt dir — leave unknown layouts alone
            if file_epoch > E:
                continue  # possible in-flight future attempt
            freed += os.path.getsize(p)
            os.remove(p)
            deleted.append(rel)
        # drop now-empty attempt dirs
        for d in _glob.glob(os.path.join(table_root, "data", "*")):
            if os.path.isdir(d) and not os.listdir(d):
                os.rmdir(d)
    return {"deleted": len(deleted), "bytes": freed, "kept": len(keep)}


def maintain(
    table_root: str,
    max_runs_per_slot: int = 8,
    keep_epochs: int = 4,
    drop_tombstones: bool = False,
    min_tombstone_ratio: float = 0.3,
) -> dict:
    """One table-maintenance pass — the OPTIMIZE/clean service loop an
    operator schedules (cron / after N tail commits): compact when any
    slot's run count exceeds ``max_runs_per_slot`` (MOR read-amp bound)
    or, with ``drop_tombstones``, when a partition's tombstone share
    crosses ``min_tombstone_ratio``; then vacuum epochs older than
    ``keep_epochs``. Safe beside writers: compaction goes through the
    epoch-checked commit (a racing ingest simply wins and the next pass
    retries), vacuum runs under the commit lock and never touches
    future-epoch attempt dirs."""
    manifest = load_manifest(table_root)
    actions: dict = {"compacted": False, "gc": False, "vacuum": None}
    if manifest is None or not manifest["partitions"]:
        return actions
    worst = 0
    for e in manifest["partitions"].values():
        by_salt: dict[int, int] = {}
        for f in e["files"]:
            by_salt[f["salt"]] = by_salt.get(f["salt"], 0) + 1
        worst = max(worst, max(by_salt.values(), default=0))
    if worst > max_runs_per_slot:
        compact(table_root)
        actions["compacted"] = True
    elif drop_tombstones:
        res = compact(
            table_root,
            drop_tombstones=True,
            min_tombstone_ratio=min_tombstone_ratio,
        )
        actions["gc"] = not res.skipped
    actions["vacuum"] = vacuum(table_root, keep_epochs=keep_epochs)
    return actions


def repartition_table(
    table_root: str,
    new_partitions: int,
    new_salt: int | None = None,
) -> CommitResult:
    """Hash-layout migration: rewrite the table to a different partition
    count (and optionally salt) in ONE atomic epoch — the operation that
    un-sticks ``num_partitions`` chosen at table creation once the table
    outgrows it (B bounds the per-task merge working set; a 1000×-grown
    table needs a bigger B, and the hash ``conv_id % B`` pins every key's
    location to B).

    Everything rides existing machinery: committed rows (tombstones
    included — they keep guarding late events) re-enter event form, take
    the partitioner at the NEW layout, and one groupby exchange merges
    and writes each new slot; the commit replaces all partitions behind
    the same manifest flip, so readers see the old layout until the flip
    and the new one after — no downtime, crash leaves the old table.
    This is the ONLY maintenance op that moves the whole table; it is
    what you schedule, deliberately, when doubling the cluster."""
    manifest = load_manifest(table_root)
    if manifest is None or not manifest["partitions"]:
        raise InvalidConfigError(f"no committed table at {table_root}")
    B = int(new_partitions)
    S = new_salt if new_salt is not None else int(
        manifest.get("metrics", {}).get("salt", 1)
    )
    S = max(1, S)
    wm = int(manifest["global_watermark"])
    epoch = int(manifest["epoch"]) + 1
    target = public_schema(manifest)
    files = [
        os.path.join(table_root, f["path"])
        for e in manifest["partitions"].values()
        for f in e["files"]
        if f.get("rows")
    ]
    writer = _MergeWrite(
        root=table_root,
        epoch_dir=attempt_epoch_dir(epoch, f"repartition|{B}|{S}|{wm}"),
        prior_parts={},
        salt=S,
        target_schema=target,
    )

    def to_events(batch: pa.Table) -> pa.Table:
        from ..stages.merge import snapshot_as_events

        batch = normalize_batch(batch, target)
        return add_partition_cols(snapshot_as_events(batch), B, S)

    ds = ray.data.read_parquet(files).map_batches(
        to_events, batch_format="pyarrow"
    )
    group_keys = ["part", "salt"] if S > 1 else ["part"]
    stats = (
        ds.groupby(group_keys)
        .map_groups(lambda g: writer(g), batch_format="pyarrow")
        .take_all()
    )
    updated: dict[str, dict] = {}
    by_part: dict[int, list[dict]] = {}
    for r in stats:
        by_part.setdefault(int(r["part"]), []).append(r)
    for part, rows in by_part.items():
        files_e = [
            {
                "path": r["path"],
                "salt": int(r["salt"]),
                "rows": int(r["rows"]),
                "live_rows": int(r["live_rows"]),
                "tombstones": int(r["tombstones"]),
                "bytes": int(r["bytes"]),
                "epoch": epoch,
            }
            for r in sorted(rows, key=lambda x: int(x["salt"]))
        ]
        updated[str(part)] = {
            "files": files_e,
            "salt": S,
            "rows": sum(f["rows"] for f in files_e),
            "live_rows": sum(f["live_rows"] for f in files_e),
            "tombstones": sum(f["tombstones"] for f in files_e),
            "bytes": sum(f["bytes"] for f in files_e),
            "watermark": wm,
            "events_applied": 0,
            "epoch": epoch,
        }
    new_manifest = commit_manifest(
        table_root,
        manifest,
        table=manifest["table"],
        num_partitions=B,
        schema=target,
        new_watermark=wm,
        updated_partitions=updated,
        replace_all=True,
        metrics={"mode": "repartition", "salt": S},
    )
    return CommitResult(
        epoch=new_manifest["epoch"],
        global_watermark=wm,
        events_read=0,
        partitions_updated=len(updated),
        manifest=new_manifest,
    )


def restore_table(
    table_root: str, epoch: int | None = None, tag: str | None = None
) -> CommitResult:
    """RESTORE (Delta ``RESTORE TABLE … VERSION AS OF`` analog): commit
    a NEW epoch whose partitions and watermark are a past epoch's —
    the undo for a bad ingest/merge. No data moves (the old files are
    re-referenced; they must still exist, i.e. be within the vacuum
    retention). The watermark REWINDS with the state, so a subsequent
    ingest replays the WAL from the restore point and converges
    deterministically — history after the restore point is undone, not
    merely hidden. Lineage keeps every epoch: the restore itself is a
    normal manifest flip with ``metrics.mode='restore'``."""
    if (epoch is None) == (tag is None):
        raise InvalidConfigError("restore_table needs exactly one of epoch/tag")
    if tag is not None:
        from ..state.manifest import resolve_tag

        epoch = resolve_tag(table_root, tag)
    cur = load_manifest(table_root)
    if cur is None:
        raise InvalidConfigError(f"no committed table at {table_root}")
    target = load_epoch_manifest(table_root, int(epoch))
    if target is None:
        raise InvalidConfigError(f"epoch {epoch} was never committed")
    missing = [
        f["path"]
        for e in target["partitions"].values()
        for f in e["files"]
        if not os.path.exists(os.path.join(table_root, f["path"]))
    ]
    if missing:
        raise InvalidConfigError(
            f"cannot restore to epoch {epoch}: {len(missing)} data files "
            f"vacuumed away (first: {missing[0]}); raise vacuum keep_epochs"
        )
    schema = public_schema(target)
    new_manifest = commit_manifest(
        table_root,
        cur,
        table=target["table"],
        num_partitions=int(target["num_partitions"]),
        schema=schema,
        new_watermark=int(target["global_watermark"]),
        updated_partitions=dict(target["partitions"]),
        replace_all=True,
        metrics={
            "mode": "restore",
            "restored_epoch": int(epoch),
            "salt": target.get("metrics", {}).get("salt", 1),
        },
    )
    return CommitResult(
        epoch=new_manifest["epoch"],
        global_watermark=int(target["global_watermark"]),
        events_read=0,
        partitions_updated=len(target["partitions"]),
        manifest=new_manifest,
    )


def clone_table(
    src_root: str, dst_root: str, epoch: int | None = None
) -> dict:
    """Shallow clone: a new independent table rooted at ``dst_root``
    whose initial state is ``src_root`` at ``epoch`` (default: current).

    Every referenced data file is HARDLINKED (copy fallback across
    filesystems) — O(metadata) and zero data bytes moved, the
    Delta-Lake shallow-clone shape, except hardlinks make the clone
    safe without reference counting: ``vacuum`` on either table only
    unlinks its own name for a file; the bytes survive until the last
    link drops, so neither side can break the other's reads. The clone
    then evolves independently (ingest/merge/compact write fresh files
    under its own root). History before the cloned epoch is not
    carried — time travel on the clone starts at its birth epoch."""
    import json as _json
    import shutil

    src_manifest = (
        load_manifest(src_root) if epoch is None else load_epoch_manifest(src_root, epoch)
    )
    if src_manifest is None:
        raise InvalidConfigError(
            f"no committed manifest at {src_root}"
            + (f" epoch {epoch}" if epoch is not None else "")
        )
    if load_manifest(dst_root) is not None:
        raise InvalidConfigError(f"{dst_root} already holds a committed table")
    for entry in src_manifest["partitions"].values():
        for f in entry["files"]:
            src_p = os.path.join(src_root, f["path"])
            dst_p = os.path.join(dst_root, f["path"])
            os.makedirs(os.path.dirname(dst_p), exist_ok=True)
            try:
                os.link(src_p, dst_p)
            except OSError:
                shutil.copy2(src_p, dst_p)
    manifest = dict(src_manifest)
    manifest["metrics"] = dict(manifest.get("metrics", {}))
    manifest["metrics"].update(
        {"mode": "clone", "clone_of": src_root, "clone_epoch": src_manifest["epoch"]}
    )
    mdir = os.path.join(dst_root, "manifest")
    os.makedirs(mdir, exist_ok=True)
    hist = os.path.join(mdir, f"epoch-{manifest['epoch']:06d}.json")
    with open(hist, "w") as f:
        _json.dump(manifest, f, indent=1)
    tmp = os.path.join(mdir, ".tmp-clone")
    with open(tmp, "w") as f:
        _json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(mdir, "manifest.json"))
    return manifest


def table_changes(
    table_root: str,
    from_epoch: int,
    to_epoch: int | None = None,
    pre_images: bool = False,
) -> ray.data.Dataset:
    """Change-data-feed between two committed epochs (the Delta-CDF /
    Iceberg-changelog shape): one row per key whose LIVE state differs
    between epoch ``from_epoch`` and ``to_epoch`` (default: current),
    with ``change_type`` ∈ {insert, update, delete} and the payload
    columns from the NEW state (OLD state for deletes). ``from_epoch=0``
    diffs against the empty table (everything is an insert).
    ``pre_images=True`` emits Delta-CDF-style paired rows for updates —
    ``update_preimage`` (old payload) + ``update_postimage`` (new) — so
    any sum-decomposable downstream aggregate can be maintained purely
    incrementally (view += post − pre; see ``incremental_conv_stats``).

    Scale shape — the manifest does the pruning, not the data:

    - Epoch history manifests (``manifest/epoch-{E}.json``) address both
      versions without any retained WAL.
    - Carried-forward (part, salt-run) files keep their OLD path in the
      new manifest, so path equality ⇔ content equality: only REWRITTEN
      runs are ever read. A 10^10-row table with a few hot partitions
      diffs in O(changed runs), not O(table).
    - A key always lives in one (part, salt) run (`hash(conv_id) % B`,
      `turn_idx % S`), so each changed run pair diffs independently —
      embarrassingly parallel map over run pairs, NO shuffle.
    - Pre-evolution files normalize to the newer epoch's public schema
      (widening-only invariant), so a column added between the epochs
      surfaces as NULL→value updates, exactly like the replay oracle.

    Note: outer-join null-filling upcasts integer PAYLOAD columns to
    float in the diff frame; the transcript payload is all strings +
    timestamp, so nothing here is affected — revisit if integer payload
    columns are added.

    Layout-change epochs (``repartition_table``): a key that merely
    MOVED slots surfaces as a delete (old slot) + insert (new slot)
    pair carrying identical payloads. Sum-decomposable consumers
    (incremental views, the secondary index) cancel these exactly, so
    derived state stays correct across a repartition (tested); raw-feed
    consumers that treat delete as a business event should not diff
    across a ``metrics.mode == 'repartition'`` epoch. Reference analog:
    wprdc-etl records per-run status rows (pipeline/status.py) but
    cannot reconstruct deltas; this is the generalization its SQLite
    status table gestures at."""
    import numpy as np
    import pandas as pd

    cur = load_manifest(table_root)
    if cur is None:
        raise InvalidConfigError(f"no committed table at {table_root}")
    if to_epoch is None:
        to_epoch = int(cur["epoch"])
    m_to = cur if to_epoch == int(cur["epoch"]) else load_epoch_manifest(table_root, to_epoch)
    m_from = load_epoch_manifest(table_root, from_epoch)
    target = public_schema(m_to)
    snap_target = pa.schema(
        list(target)
        + [
            pa.field(c, t)
            for c, t in (("_offset", pa.int64()), ("_deleted", pa.bool_()))
            if c not in target.names
        ]
    )
    pub_cols = [f.name for f in target if f.name not in INTERNAL_COLS]
    key_cols = list(KEY_COLUMNS)
    payload = [c for c in pub_cols if c not in key_cols]

    import json as _json

    old_parts = m_from["partitions"] if m_from else {}
    new_parts = m_to["partitions"] if m_to else {}
    items = []
    for part in sorted(set(old_parts) | set(new_parts), key=int):
        # the pruning unit is a (part, salt) SLOT — a list of runs (one
        # in COW steady state, several under MOR). Identical run lists
        # ⇔ identical slot content; a changed list (rewrite OR appended
        # delta) reads the slot's full LWW state at both epochs.
        of: dict[int, list[str]] = {}
        nf: dict[int, list[str]] = {}
        for f in old_parts.get(part, {}).get("files", []):
            of.setdefault(int(f.get("salt", 0)), []).append(f["path"])
        for f in new_parts.get(part, {}).get("files", []):
            nf.setdefault(int(f.get("salt", 0)), []).append(f["path"])
        for slot in sorted(set(of) | set(nf)):
            if sorted(of.get(slot, [])) != sorted(nf.get(slot, [])):
                items.append(
                    {
                        "old": _json.dumps(of.get(slot, [])),
                        "new": _json.dumps(nf.get(slot, [])),
                    }
                )

    empty = pa.schema(
        [target.field(c) for c in pub_cols] + [pa.field("change_type", pa.string())]
    ).empty_table()
    if not items:
        return ray.data.from_arrow(empty)

    def read_live(paths_json: str) -> pd.DataFrame:
        paths = _json.loads(paths_json)
        if not paths:
            return pa.schema([target.field(c) for c in pub_cols]).empty_table().to_pandas()
        runs = [pq.read_table(os.path.join(table_root, p)) for p in paths]
        if len(runs) > 1:
            t = merge_with_snapshot(snapshot_as_events_multi(runs), None)
        else:
            t = runs[0]
        t = normalize_batch(t, snap_target)
        t = t.filter(pc.equal(t.column("_deleted"), False))
        return t.select(pub_cols).to_pandas()

    def diff(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []

        def emit(m: pd.DataFrame, mask: np.ndarray, side: str, label: str) -> None:
            if not mask.any():
                return
            out = pd.DataFrame({k: m[k][mask] for k in key_cols})
            for c in payload:
                out[c] = m[c + side][mask]
            out["change_type"] = label
            outs.append(out)

        for old_p, new_p in zip(batch["old"], batch["new"]):
            o = read_live(old_p)
            n = read_live(new_p)
            m = o.merge(n, on=key_cols, how="outer", suffixes=("__o", "__n"), indicator=True)
            ins = (m["_merge"] == "right_only").to_numpy()
            dele = (m["_merge"] == "left_only").to_numpy()
            changed = np.zeros(len(m), dtype=bool)
            for c in payload:
                a, b = m[c + "__o"], m[c + "__n"]
                changed |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
            upd = ~ins & ~dele & changed
            emit(m, ins, "__n", "insert")
            emit(m, dele, "__o", "delete")
            if pre_images:
                emit(m, upd, "__o", "update_preimage")
                emit(m, upd, "__n", "update_postimage")
            else:
                emit(m, upd, "__n", "update")
        if not outs:
            return empty.to_pandas()
        return pd.concat(outs, ignore_index=True)

    return ray.data.from_items(items).map_batches(
        diff, batch_format="pandas", batch_size=1
    )


def follow_changes(
    table_root: str,
    from_epoch: int | None = None,
    pre_images: bool = False,
    poll_interval: float = 1.0,
    max_polls: int | None = None,
):
    """Subscribe to the table's change feed: yield ``(epoch, Dataset)``
    for every epoch committed after ``from_epoch`` (default: the current
    epoch at subscribe time — i.e. only future commits), each Dataset
    being that epoch's CDF (``table_changes(e-1, e)``).

    The downstream-consumer loop of the CDC story: a follower drives
    incremental view refreshes, cache invalidation, or replication into
    another table (``merge_into`` accepts the feed's rows directly).
    Polling reads ONE small JSON manifest per interval — no data IO
    until an epoch actually lands; each yielded feed reads only that
    epoch's changed slots (manifest path-equality pruning).

    ``max_polls`` bounds the wait loop for tests/batch drains: the
    generator ends after that many EMPTY polls (None = follow forever).
    Epochs are yielded in order, exactly once; a consumer that crashes
    resumes by passing its last processed epoch as ``from_epoch``."""
    import time as _time

    cur = load_manifest(table_root)
    last = int(cur["epoch"]) if cur else 0
    if from_epoch is not None:
        last = int(from_epoch)
    idle = 0
    while True:
        m = load_manifest(table_root)
        cur_epoch = int(m["epoch"]) if m else 0
        if cur_epoch > last:
            idle = 0
            for e in range(last + 1, cur_epoch + 1):
                yield e, table_changes(
                    table_root, from_epoch=e - 1, to_epoch=e, pre_images=pre_images
                )
            last = cur_epoch
            continue
        idle += 1
        if max_polls is not None and idle > max_polls:
            return
        _time.sleep(poll_interval)


def table_diff(
    root_a: str, root_b: str, pre_images: bool = False
) -> ray.data.Dataset:
    """Diff two TABLES (branch review: a clone vs its source after
    divergence) — same row shape as :func:`table_changes`
    (``change_type`` relative to ``root_a`` → ``root_b``: what happened
    going from A to B).

    Pruning works across roots because a shallow clone keeps every
    shared file's RELATIVE path: slots whose run lists match byte-for-
    byte are skipped, so diffing a lightly-diverged branch costs
    O(changed slots), not O(table). Requires the same partitioning
    layout (B and salt — anything else would compare different key
    spaces); raises otherwise."""
    import json as _json

    import pandas as pd

    ma, mb = load_manifest(root_a), load_manifest(root_b)
    if ma is None or mb is None:
        raise InvalidConfigError("both tables must be committed")
    if int(ma["num_partitions"]) != int(mb["num_partitions"]) or int(
        ma.get("metrics", {}).get("salt", 1)
    ) != int(mb.get("metrics", {}).get("salt", 1)):
        raise InvalidConfigError(
            "table_diff requires identical (num_partitions, salt) layouts; "
            "repartition one side first"
        )
    target = public_schema(mb)
    snap_target = pa.schema(
        list(target)
        + [
            pa.field(c, t)
            for c, t in (("_offset", pa.int64()), ("_deleted", pa.bool_()))
            if c not in target.names
        ]
    )
    pub_cols = [f.name for f in target if f.name not in INTERNAL_COLS]
    key_cols = list(KEY_COLUMNS)
    payload = [c for c in pub_cols if c not in key_cols]

    items = []
    for part in sorted(
        set(ma["partitions"]) | set(mb["partitions"]), key=int
    ):
        of: dict[int, list[str]] = {}
        nf: dict[int, list[str]] = {}
        for f in ma["partitions"].get(part, {}).get("files", []):
            of.setdefault(int(f.get("salt", 0)), []).append(f["path"])
        for f in mb["partitions"].get(part, {}).get("files", []):
            nf.setdefault(int(f.get("salt", 0)), []).append(f["path"])
        for slot in sorted(set(of) | set(nf)):
            if sorted(of.get(slot, [])) != sorted(nf.get(slot, [])):
                items.append(
                    {
                        "old": _json.dumps(of.get(slot, [])),
                        "new": _json.dumps(nf.get(slot, [])),
                    }
                )
    empty = pa.schema(
        [target.field(c) for c in pub_cols] + [pa.field("change_type", pa.string())]
    ).empty_table()
    if not items:
        return ray.data.from_arrow(empty)

    def read_live(root: str, paths_json: str) -> pd.DataFrame:
        paths = _json.loads(paths_json)
        if not paths:
            return (
                pa.schema([target.field(c) for c in pub_cols])
                .empty_table()
                .to_pandas()
            )
        runs = [pq.read_table(os.path.join(root, p)) for p in paths]
        t = (
            merge_with_snapshot(snapshot_as_events_multi(runs), None)
            if len(runs) > 1
            else runs[0]
        )
        t = normalize_batch(t, snap_target)
        t = t.filter(pc.equal(t.column("_deleted"), False))
        return t.select(pub_cols).to_pandas()

    import numpy as np

    def diff(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []

        def emit(m, mask, side, label):
            if not mask.any():
                return
            out = pd.DataFrame({k: m[k][mask] for k in key_cols})
            for c in payload:
                out[c] = m[c + side][mask]
            out["change_type"] = label
            outs.append(out)

        for old_p, new_p in zip(batch["old"], batch["new"]):
            o = read_live(root_a, old_p)
            n = read_live(root_b, new_p)
            m = o.merge(
                n, on=key_cols, how="outer", suffixes=("__o", "__n"), indicator=True
            )
            ins = (m["_merge"] == "right_only").to_numpy()
            dele = (m["_merge"] == "left_only").to_numpy()
            changed = np.zeros(len(m), dtype=bool)
            for c in payload:
                a, b = m[c + "__o"], m[c + "__n"]
                changed |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
            upd = ~ins & ~dele & changed
            emit(m, ins, "__n", "insert")
            emit(m, dele, "__o", "delete")
            if pre_images:
                emit(m, upd, "__o", "update_preimage")
                emit(m, upd, "__n", "update_postimage")
            else:
                emit(m, upd, "__n", "update")
        if not outs:
            return empty.to_pandas()
        return pd.concat(outs, ignore_index=True)

    return ray.data.from_items(items).map_batches(
        diff, batch_format="pandas", batch_size=1
    )


def merge_branch(target_root: str, branch_root: str) -> CommitResult:
    """Fast-forward a diverged clone's changes back into its source —
    the PR-merge of the clone → mutate → review (``table_diff``) →
    merge workflow: diff rows become MERGE actions (delete → delete,
    insert/update → upsert), applied in one atomic epoch. Conflict
    semantics are MERGE's: the branch wins unconditionally on keys it
    touched; keys only the target advanced keep the target's state
    (they never appear in the diff)."""

    def to_actions(batch) -> "pa.Table":
        import pandas as pd

        df: pd.DataFrame = batch
        df = df.copy()
        df["_action"] = (df.pop("change_type") == "delete").map(
            {True: "delete", False: "upsert"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    src = table_diff(target_root, branch_root).map_batches(
        to_actions, batch_format="pandas"
    )
    return merge_into(target_root, src, job_id=f"merge_branch:{branch_root}")


def incremental_conv_stats(
    table_root: str, from_epoch: int, to_epoch: int | None = None
) -> ray.data.Dataset:
    """Incremental materialized-view maintenance over the change feed:
    per-conversation (n_turns, total_chars) at ``to_epoch``, computed as
    the view at ``from_epoch`` (time-travel read) PLUS signed deltas
    from the pre/post-image feed — the table is never rescanned at the
    new epoch. Both aggregates are sum-decomposable, so every feed row
    contributes one signed partial: +1 for insert/update_postimage, −1
    for delete/update_preimage; conversations whose live turn count
    reaches zero drop out of the view.

    Scale shape: the base is one partial pre-agg over the OLD snapshot
    (amortized — a real deployment persists the view and only ever
    applies deltas), the delta side is O(changed keys) rows from the
    manifest-pruned feed, and the combine is one ``grouped_agg`` whose
    shuffle carries per-(conv, block) partials. Maintenance cost scales
    with the CHANGE RATE, not the table size — the property that makes
    a 10^10-row view affordable per epoch."""
    import pandas as pd

    from ..functions.relational import grouped_agg

    def partials(sign_of):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            s = sign_of(batch)
            chars = batch["text"].fillna("").str.len().to_numpy(dtype="int64")
            return pd.DataFrame(
                {
                    "conv_id": batch["conv_id"],
                    "n_turns": s,
                    "total_chars": chars * s,
                }
            )

        return fn

    base = read_transcripts(table_root, columns=["conv_id", "text"], epoch=from_epoch)
    base_p = base.map_batches(partials(lambda b: 1), batch_format="pandas")
    feed = table_changes(table_root, from_epoch, to_epoch, pre_images=True)

    def feed_sign(batch: pd.DataFrame):
        import numpy as np

        neg = batch["change_type"].isin(["delete", "update_preimage"]).to_numpy()
        return np.where(neg, -1, 1).astype("int64")

    feed_p = feed.select_columns(["conv_id", "text", "change_type"]).map_batches(
        partials(feed_sign), batch_format="pandas"
    )

    out = grouped_agg(
        base_p.union(feed_p),
        ["conv_id"],
        [("n_turns", "sum", "n_turns"), ("total_chars", "sum", "total_chars")],
    )

    def live_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("n_turns"), 0))

    return out.map_batches(live_only, batch_format="pyarrow")


def refresh_conv_stats_view(table_root: str) -> dict:
    """PERSISTED incremental materialized view (the productized form of
    ``incremental_conv_stats``): per-conv (n_turns, total_chars) stored
    under ``{table_root}/views/conv_stats/`` with its own epoch
    watermark. Each refresh applies ONLY the pre/post-image deltas
    between the view's epoch and the table's current epoch — the prior
    view rows re-enter as partials (never the table), so refresh cost
    is O(view + change rate). The first refresh bootstraps from the
    epoch-0 feed (all inserts). The view's epoch lives IN its filename
    (``view-{E}.parquet``) and each refresh publishes a NEW name with
    one atomic rename — a crash at any point leaves the previous
    consistent (file, epoch) pair, never a half-state that would
    double-apply deltas. The view itself is driver-assembled into one
    file — right up to ~10^7 conversations; past that, substitute the
    resumable partitioned sink for the writeback (same deltas).

    Returns {"epoch": view epoch after refresh, "rows": view rows,
    "refreshed": bool}."""
    import glob as _glob

    from ..functions.relational import grouped_agg

    cur = load_manifest(table_root)
    if cur is None:
        raise InvalidConfigError(f"no committed table at {table_root}")
    cur_epoch = int(cur["epoch"])
    vdir = os.path.join(table_root, "views", "conv_stats")
    os.makedirs(vdir, exist_ok=True)
    existing = sorted(_glob.glob(os.path.join(vdir, "view-*.parquet")))
    view_epoch = (
        int(os.path.basename(existing[-1])[len("view-"):-len(".parquet")])
        if existing
        else 0
    )
    data_path = existing[-1] if existing else None
    if view_epoch >= cur_epoch:
        rows = pq.read_metadata(data_path).num_rows if data_path else 0
        return {"epoch": view_epoch, "rows": rows, "refreshed": False}

    import pandas as pd

    feed = table_changes(table_root, view_epoch, cur_epoch, pre_images=True)

    def delta_partials(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        neg = batch["change_type"].isin(["delete", "update_preimage"]).to_numpy()
        s = np.where(neg, -1, 1).astype("int64")
        chars = batch["text"].fillna("").str.len().to_numpy(dtype="int64")
        return pd.DataFrame(
            {"conv_id": batch["conv_id"], "n_turns": s, "total_chars": chars * s}
        )

    parts = feed.select_columns(["conv_id", "text", "change_type"]).map_batches(
        delta_partials, batch_format="pandas"
    )
    if data_path is not None and view_epoch > 0:
        prior = ray.data.read_parquet(data_path)
        parts = parts.union(prior)
    out = grouped_agg(
        parts,
        ["conv_id"],
        [("n_turns", "sum", "n_turns"), ("total_chars", "sum", "total_chars")],
    )

    def live_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("n_turns"), 0))

    table = pa.concat_tables(
        [
            b
            for b in ray.get(out.map_batches(live_only, batch_format="pyarrow").to_arrow_refs())
            if b.num_rows
        ]
        or [pa.table({"conv_id": pa.array([], pa.string()),
                      "n_turns": pa.array([], pa.int64()),
                      "total_chars": pa.array([], pa.int64())})]
    ).sort_by([("conv_id", "ascending")])
    new_path = os.path.join(vdir, f"view-{cur_epoch:06d}.parquet")
    tmp = new_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, new_path)
    for old in existing:  # best-effort cleanup; max-name wins regardless
        if old != new_path:
            try:
                os.remove(old)
            except OSError:
                pass
    return {"epoch": cur_epoch, "rows": table.num_rows, "refreshed": True}


# --- fluent builder (reference Pipeline parity, SURVEY.md §2.1 C1) -----------


class CDCPipeline:
    """Fluent builder mirroring the reference's user API
    (``Pipeline(...).connect(...).extract(...).schema(...).load(...).run()``,
    wprdc-etl pipeline/pipeline.py): each stage setter returns self;
    ``run()`` validates that the pipeline is fully specified
    (reference: ``enforce_full_pipeline`` → InvalidConfigException)."""

    def __init__(self, name: str, config: CDCConfig | None = None):
        self.name = name
        self.config = config or CDCConfig(table_name=name)
        self._wal_dir: str | None = None
        self._table_root: str | None = None

    def source(self, wal_dir: str) -> "CDCPipeline":
        self._wal_dir = wal_dir
        return self

    def sink(self, table_root: str) -> "CDCPipeline":
        self._table_root = table_root
        return self

    def partitions(self, num_partitions: int, salt: int = 1) -> "CDCPipeline":
        self.config.num_partitions = num_partitions
        self.config.salt = salt
        return self

    def method(self, method: str) -> "CDCPipeline":
        """Reference parity: ``CKANDatastoreLoader(method='upsert'|'insert')``
        (wprdc-etl pipeline/loaders.py) — 'insert' = full refresh."""
        if method not in ("upsert", "insert"):
            raise InvalidConfigError(f"method must be upsert|insert, got {method!r}")
        self.config.mode = "upsert" if method == "upsert" else "refresh"
        return self

    def write_mode(self, write_mode: str, mor_compact_runs: int | None = None) -> "CDCPipeline":
        """Storage strategy: 'cow' (rewrite touched slots fully merged)
        or 'mor' (append delta runs; see CDCConfig.write_mode)."""
        if write_mode not in ("cow", "mor"):
            raise InvalidConfigError(f"write_mode must be cow|mor, got {write_mode!r}")
        self.config.write_mode = write_mode
        if mor_compact_runs is not None:
            self.config.mor_compact_runs = mor_compact_runs
        return self

    def run(self) -> CommitResult:
        if not self._wal_dir or not self._table_root:
            raise InvalidConfigError(
                "pipeline incomplete: need .source(wal_dir) and .sink(table_root)"
            )
        return run_ingest(self._wal_dir, self._table_root, self.config)

"""Tail mode: incremental micro-batch ingestion with a stateful merger
actor pool (SURVEY.md §2.3 X5 "incremental tail mode", §7 step 6).

The batch path (pipelines/cdc.py) re-reads the prior snapshot every
epoch — right for big replays, wasteful for a tailer applying small
deltas every few seconds. Tail mode keeps each (partition, salt) slot's
live state resident in a ``MergerActor`` between micro-batches:

- actors are the ONLY stateful stage (reference analog: the CKAN
  datastore holding current rows between chunked upserts,
  wprdc-etl pipeline/loaders.py::CKANDatastoreLoader);
- events flow worker→actor (the driver never holds row data): the
  decode ``map_batches`` tasks split each Arrow batch by merge GROUP
  (gid = part·S + turn_idx%S — the same salted routing as the batch
  path, so hot conversations fan out over S actors in tail mode too)
  and ``.apply_many.remote`` the slices to the owning actor — one
  message per ACTOR per batch, not per slot;
- ``commit()`` flushes every actor's dirty slots to Parquet and performs
  the same atomic manifest flip as the batch path — crash before a
  commit loses only actor memory; restart reloads the committed
  snapshot and replays events above the watermark to the identical
  table (exactly-once, deterministic arg-max merge).

A tail-mode table is byte-compatible with the batch path: same snapshot
schema, same LWW semantics, same salted run layout, same manifest; the
e2e tests assert the final tables are equal row-for-row. Salt (like
num_partitions) is a TABLE property read from the committed manifest.

With ``CDCConfig.write_mode='mor'`` the tailer goes one step further:
actors never load committed runs (resident state is O(pending winners),
not O(table/actors)) and each commit appends ONE delta run per dirty
slot — both the per-commit write cost and the actor heap become
O(delta), the micro-batch ideal — with ``mor_compact_runs`` bounding
read amplification via inline compaction (see CDCConfig).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..schema import VALID_OPS, normalize_batch, unify_schemas, validate_batch
from ..stages.merge import merge_with_snapshot
from ..stages.partition import add_partition_cols
from ..state.manifest import commit_manifest, load_manifest, public_schema
from .cdc import CDCConfig, CHANGE_META_COLS, INTERNAL_COLS, plan_segments


@ray.remote
class MergerActor:
    """Owns a set of (partition, salt) slots (gid = part·S + salt);
    holds their live snapshot + pending events between micro-batches.
    Merge work is the same vectorized arg-max as the batch path — the
    actor only AMORTIZES snapshot IO across micro-batches, it does not
    change semantics."""

    def __init__(
        self,
        table_root: str,
        gids: list[int],
        salt: int,
        write_mode: str = "cow",
        mor_compact_runs: int = 8,
    ):
        self.root = table_root
        self.S = max(1, salt)
        self.gids = set(gids)
        self.write_mode = write_mode
        self.mor_compact_runs = mor_compact_runs
        self.snapshots: dict[int, pa.Table | None] = {}
        self.pending: dict[int, list[pa.Table]] = {g: [] for g in gids}
        self.events_applied = 0
        # MOR: the actor never loads committed runs — they stay on disk
        # and flush() appends delta runs beside them, so resident state
        # is O(pending winners since last commit), not O(live keys).
        # ``snapshots`` then holds only the accumulated un-flushed
        # winners (the delta in progress), reset to None at each flush.
        manifest = None if write_mode == "mor" else load_manifest(table_root)
        if manifest:
            for g in gids:
                p, sv = g // self.S, g % self.S
                entry = manifest["partitions"].get(str(p))
                if not entry:
                    continue
                files = [f for f in entry["files"] if f.get("salt", 0) == sv]
                if files:
                    tables = [
                        pq.read_table(os.path.join(table_root, f["path"]))
                        for f in files
                    ]
                    self.snapshots[g] = (
                        pa.concat_tables(tables, promote_options="permissive")
                        if len(tables) > 1
                        else tables[0]
                    )

    def apply_many(self, gids: list[int], blocks: list[pa.Table]) -> int:
        """Buffer micro-batch slices for several owned merge groups in ONE
        call. Routing cost is per-RPC, not per-row: a decode task sends at
        most one message per ACTOR per batch (≤ num_actors), never one per
        (part, salt) slot (B·S can be 512+) — the per-slot variant was
        measured RPC-bound, not CPU-bound, and did not scale with cores."""
        n = 0
        for gid, block in zip(gids, blocks):
            self.pending[gid].append(block)
            n += block.num_rows
        self.events_applied += n
        return n

    def compact(self, gid: int) -> None:
        """Fold pending events into the in-memory snapshot (bounds actor
        memory between commits for hot tails)."""
        if not self.pending[gid]:
            return
        events = pa.concat_tables(self.pending[gid], promote_options="permissive")
        self.snapshots[gid] = merge_with_snapshot(events, self.snapshots.get(gid))
        self.pending[gid] = []

    def flush(
        self,
        epoch_dir: str,
        target_fields: list[tuple[str, str, bool]],
        prior_run_paths: dict[int, list[str]] | None = None,
    ) -> list[dict]:
        """Merge + write every owned slot that has pending events; return
        manifest rows. Untouched slots carry forward without a rewrite.

        COW: the resident snapshot (full slot state) is written merged.
        MOR: only the accumulated pending winners are written as a delta
        run, UNLESS the slot's on-disk run count (``prior_run_paths``,
        supplied by the session from its manifest view) has reached
        ``mor_compact_runs`` — then the prior runs are read back once,
        merged with the delta, and written full (inline compaction)."""
        from ..schema import fields_to_schema
        from ..stages.merge import merge_with_snapshot as _merge
        from .cdc import snapshot_as_events_multi

        target = fields_to_schema(
            [{"id": n, "type": t, "nullable": nu} for n, t, nu in target_fields]
        )
        out = []
        for g in sorted(self.gids):
            if not self.pending[g]:
                continue  # slot untouched this commit: carried forward
            self.compact(g)
            merged = self.snapshots[g]
            delta = False
            prior_paths = (prior_run_paths or {}).get(g, [])
            if self.write_mode == "mor":
                due = (
                    self.mor_compact_runs
                    and len(prior_paths) + 1 > self.mor_compact_runs
                )
                if prior_paths and due:
                    runs = [
                        pq.read_table(os.path.join(self.root, pth))
                        for pth in prior_paths
                    ]
                    runs.append(merged)
                    merged = _merge(snapshot_as_events_multi(runs), None)
                else:
                    delta = bool(prior_paths)
            merged = normalize_batch(merged, target)
            # MOR never keeps flushed state resident; COW serves the next
            # micro-batch from the merged snapshot
            self.snapshots[g] = None if self.write_mode == "mor" else merged
            p, sv = g // self.S, g % self.S
            suffix = "-d" if delta else ""
            rel = os.path.join(
                "data", epoch_dir, f"part-{p:05d}-s{sv:02d}{suffix}.parquet"
            )
            abs_path = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(abs_path), exist_ok=True)
            pq.write_table(merged, abs_path)
            deleted = merged.column("_deleted")
            n_tomb = pc.sum(pc.cast(deleted, pa.int64())).as_py() or 0
            wm = pc.max(merged.column("_offset")).as_py()
            out.append(
                {
                    "part": p,
                    "salt": sv,
                    "path": rel,
                    "rows": merged.num_rows,
                    "live_rows": merged.num_rows - n_tomb,
                    "tombstones": n_tomb,
                    "bytes": os.path.getsize(abs_path),
                    "watermark": -1 if wm is None else int(wm),
                    "delta": delta,
                }
            )
        return out

    def stats(self) -> dict:
        return {
            "events_applied": self.events_applied,
            "slots": sorted(self.gids),
            "resident_rows": sum(
                t.num_rows for t in self.snapshots.values() if t is not None
            ),
        }


# waves at or below this many planned rows skip the Dataset executor
# (fixed per-run startup cost) and run as plain chunked Ray tasks; the
# threshold mirrors the batch path's sort/direct auto selection style.
# Measured (BASELINE.md, 24M-event waves, taskset 4/16 cores): task
# path 8.96 s vs Dataset path 18.19 s at 16 cores with BETTER scaling
# (0.838 vs 0.669) — the task path stays memory-bounded (one parquet
# batch in flight per task, merger-actor acks as backpressure), so the
# Dataset path is only kept for wide waves where streaming
# backpressure + spill across many files matters.
TAIL_TASK_PATH_MAX_ROWS = int(
    os.environ.get("GRAFT_TAIL_TASK_MAX_ROWS", "32000000")
)


@ray.remote
def _route_files_task(paths: list[str], route_fn, batch_size: int) -> int:
    """Read WAL segment files batch-by-batch and run the tail route
    function — the micro-batch fast path's worker body. Each file is
    read under its own schema (no cross-file concat), so mixed schema
    versions inside one chunk are fine; ``route_fn`` normalizes."""
    total = 0
    for p in paths:
        pf = pq.ParquetFile(p)
        for rb in pf.iter_batches(batch_size=batch_size):
            out = route_fn(pa.Table.from_batches([rb]))
            total += out.column("applied")[0].as_py()
    return total


@dataclass
class TailResult:
    epoch: int
    global_watermark: int
    events_read: int
    partitions_updated: int
    skipped: bool = False


class TailSession:
    """Long-lived tail session over a growing WAL directory.

    ``poll() → apply new segments to the actor pool``;
    ``commit() → flush + atomic manifest flip``. A typical tailer loop
    is ``while True: if poll(): commit(); sleep(dt)``.
    """

    def __init__(
        self,
        wal_dir: str,
        table_root: str,
        config: CDCConfig | None = None,
        num_actors: int = 8,
    ):
        self.wal_dir = wal_dir
        self.root = table_root
        self.cfg = config or CDCConfig()
        self.num_actors = num_actors
        manifest = load_manifest(table_root)
        self.watermark = manifest["global_watermark"] if manifest else -1
        self.epoch = manifest["epoch"] if manifest else 0
        # num_partitions and salt are TABLE properties (see run_ingest):
        # a session over an existing table MUST use the committed values
        if manifest and manifest.get("num_partitions"):
            self.B = int(manifest["num_partitions"])
        else:
            self.B = self.cfg.num_partitions
        if manifest and manifest.get("metrics", {}).get("salt"):
            self.S = int(manifest["metrics"]["salt"])
        else:
            self.S = max(1, self.cfg.salt)
        B, S = self.B, self.S
        owned: list[list[int]] = [[] for _ in range(num_actors)]
        for g in range(B * S):
            # gid % A interleaving spreads one hot partition's salt
            # groups over different actors (same as the batch exchange)
            owned[g % num_actors].append(g)
        self.actors = [
            MergerActor.remote(
                table_root,
                gids,
                S,
                write_mode=self.cfg.write_mode,
                mor_compact_runs=self.cfg.mor_compact_runs,
            )
            for gids in owned
        ]
        self._pending_events = 0
        self._pending_schema: pa.Schema | None = (
            public_schema(manifest) if manifest else None
        )
        # immutable-segment footer cache: repeated polls re-plan in
        # O(new segments), not O(all segments)
        self._seg_meta: dict = {}

    def ready(self) -> None:
        """Block until every merger actor process is up and has loaded its
        snapshot slots. Actor spawn is SESSION startup (a long-lived tailer
        pays it once), not per-wave throughput — callers that measure
        steady-state waves should call this first; a plain tailer loop can
        skip it (the first poll simply absorbs the spawn latency)."""
        ray.get([a.stats.remote() for a in self.actors])

    def poll(self) -> int:
        """Apply all WAL segments beyond the watermark to the actor pool.
        Returns the number of events routed (0 = nothing new)."""
        chosen, new_wm, schema_groups = plan_segments(
            self.wal_dir, self.watermark, meta_cache=self._seg_meta
        )
        if not chosen:
            return 0
        seg_schemas = [pq.read_schema(g[0]) for g in schema_groups]
        to_unify = list(seg_schemas)
        if self._pending_schema is not None:
            to_unify.append(
                pa.schema(
                    [f for f in self._pending_schema if f.name not in INTERNAL_COLS]
                )
            )
        unified_change = unify_schemas(to_unify)
        snapshot_target = pa.schema(
            [f for f in unified_change if f.name not in CHANGE_META_COLS]
            + [pa.field("_offset", pa.int64()), pa.field("_deleted", pa.bool_())]
        )
        self._pending_schema = snapshot_target

        cfg, wm = self.cfg, self.watermark
        B, S, A = self.B, self.S, self.num_actors
        actors = self.actors
        required, strict = cfg.required, cfg.strict

        def decode_route(batch: pa.Table) -> pa.Table:
            from ..errors import SchemaValidationError

            batch = validate_batch(
                batch, unified_change, required=required, strict=strict
            )
            ok_op = pc.is_in(batch.column("op"), value_set=pa.array(VALID_OPS))
            if not pc.all(ok_op).as_py():
                if strict:
                    raise SchemaValidationError("invalid op value in change batch")
                batch = batch.filter(ok_op)
            if wm >= 0:
                batch = batch.filter(pc.greater(batch.column("offset"), wm))
            batch = add_partition_cols(batch, B, S)
            part = batch.column("part").to_numpy(zero_copy_only=False).astype(np.int64)
            if S > 1:
                salt = batch.column("salt").to_numpy(zero_copy_only=False)
                gid = part * S + salt.astype(np.int64)
                batch = batch.drop_columns(["part", "salt"])
            else:
                gid = part
                batch = batch.drop_columns(["part"])
            order = np.argsort(gid, kind="stable")
            sorted_batch = batch.take(pa.array(order))
            sg = gid[order]
            bounds = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
            per_actor_gids: list[list[int]] = [[] for _ in range(A)]
            per_actor_blocks: list[list[pa.Table]] = [[] for _ in range(A)]
            for i, b in enumerate(bounds):
                end = bounds[i + 1] if i + 1 < len(bounds) else len(sg)
                g = int(sg[b])
                per_actor_gids[g % A].append(g)
                per_actor_blocks[g % A].append(sorted_batch.slice(b, end - b))
            refs = [
                actors[a].apply_many.remote(per_actor_gids[a], per_actor_blocks[a])
                for a in range(A)
                if per_actor_gids[a]
            ]
            applied = sum(ray.get(refs))  # ack = backpressure
            return pa.table({"applied": pa.array([applied], pa.int64())})

        planned = sum(
            pq.read_metadata(p).num_rows for p in chosen
        )
        if planned <= TAIL_TASK_PATH_MAX_ROWS:
            # micro-batch fast path: a tail wave is SMALL by definition,
            # and the Dataset streaming executor's per-run startup
            # (operator graph, scheduling loop, iterator teardown) is a
            # fixed serial cost paid every poll. Plain Ray tasks over
            # file chunks do the identical per-batch work (each file
            # read with its own schema, decode_route normalizes) with
            # none of it. Large waves keep the Dataset path for
            # streaming backpressure + spill.
            ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
            n_chunks = min(len(chosen), ncpu * 2)
            chunks = [chosen[i::n_chunks] for i in range(n_chunks)]
            applied = sum(
                ray.get(
                    [
                        _route_files_task.remote(c, decode_route, cfg.batch_size)
                        for c in chunks
                    ]
                )
            )
        else:
            parts_ds = []
            for grp in schema_groups:
                parts_ds.append(
                    ray.data.read_parquet(grp).map_batches(
                        decode_route, batch_format="pyarrow", batch_size=cfg.batch_size
                    )
                )
            ds = parts_ds[0]
            for other in parts_ds[1:]:
                ds = ds.union(other)
            applied = sum(r["applied"] for r in ds.take_all())
        self._pending_events += applied
        self.watermark = new_wm
        return applied

    def commit(self) -> TailResult:
        """Flush actors and atomically publish the epoch."""
        if self._pending_events == 0:
            return TailResult(
                epoch=self.epoch,
                global_watermark=self.watermark,
                events_read=0,
                partitions_updated=0,
                skipped=True,
            )
        epoch = self.epoch + 1
        from .cdc import attempt_epoch_dir

        epoch_dir = attempt_epoch_dir(
            epoch, f"tail|{self.cfg.write_mode}|{self.watermark}|{self._pending_events}"
        )
        fields = [
            (f.name, str(f.type), f.nullable) for f in self._pending_schema
        ]
        manifest = load_manifest(self.root)
        # a tail session owns its table: if another writer advanced the
        # manifest beneath us, our actors' resident snapshots are stale
        # and committing would silently overwrite the other writer's
        # partitions — the generic epoch check can't catch this because
        # we (correctly) base carried-forward entries on the manifest we
        # just loaded. Fail loudly instead; the operator restarts the
        # session (which reloads committed state and replays the WAL).
        # (Checked BEFORE flushing so a conflict leaves no orphan files.)
        cur_epoch = manifest["epoch"] if manifest else 0
        if cur_epoch != self.epoch:
            from ..errors import ConcurrentCommitError

            raise ConcurrentCommitError(
                f"table advanced to epoch {cur_epoch} while this tail session "
                f"was at epoch {self.epoch}; restart the TailSession"
            )
        prior_parts = (
            {int(k): v for k, v in manifest["partitions"].items()} if manifest else {}
        )
        # MOR: per-slot on-disk run lists drive the actors' inline
        # compaction decision (flush reads them back only when a slot
        # hits mor_compact_runs)
        prior_run_paths: dict[int, list[str]] = {}
        if self.cfg.write_mode == "mor":
            for part, entry in prior_parts.items():
                if entry.get("salt", 1) != self.S:
                    continue  # layout mismatch is caught by assembly below
                for f in entry["files"]:
                    g = part * self.S + int(f.get("salt", 0))
                    prior_run_paths.setdefault(g, []).append(f["path"])
        rows_nested = ray.get(
            [
                a.flush.remote(epoch_dir, fields, prior_run_paths)
                for a in self.actors
            ]
        )
        by_part: dict[int, list[dict]] = {}
        for rows in rows_nested:
            for r in rows:
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
                # untouched slots carry forward; a delta run APPENDS to
                # its slot's prior runs, a full rewrite replaces them
                files += [f for f in prior["files"] if f["salt"] not in full_salts]
            wm_new = max(int(r["watermark"]) for r in rows)
            if prior:
                wm_new = max(wm_new, prior.get("watermark", -1))
            updated[str(part)] = {
                "files": files,
                "salt": self.S,
                "rows": sum(f["rows"] for f in files),
                "live_rows": sum(f["live_rows"] for f in files),
                "tombstones": sum(f["tombstones"] for f in files),
                "bytes": sum(f["bytes"] for f in files),
                "watermark": wm_new,
                "events_applied": 0,
                "epoch": epoch,
            }
        new_manifest = commit_manifest(
            self.root,
            manifest,
            table=self.cfg.table_name,
            num_partitions=self.B,
            schema=self._pending_schema,
            new_watermark=self.watermark,
            updated_partitions=updated,
            metrics={
                "epoch_events_applied": self._pending_events,
                "salt": self.S,
                "mode": "tail",
            },
        )
        events = self._pending_events
        self._pending_events = 0
        self.epoch = new_manifest["epoch"]
        return TailResult(
            epoch=self.epoch,
            global_watermark=self.watermark,
            events_read=events,
            partitions_updated=len(updated),
        )

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []

"""Tail mode: incremental micro-batch ingestion with a stateful merger
actor pool (SURVEY.md §2.3 X5 "incremental tail mode", §7 step 6).

The batch path (pipelines/cdc.py) re-reads the prior snapshot every
epoch — right for big replays, wasteful for a tailer applying small
deltas every few seconds. Tail mode keeps each partition's live state
resident in a ``MergerActor`` between micro-batches:

- actors are the ONLY stateful stage (reference analog: the CKAN
  datastore holding current rows between chunked upserts,
  wprdc-etl pipeline/loaders.py::CKANDatastoreLoader);
- events flow worker→actor (the driver never holds row data): the
  decode ``map_batches`` tasks split each Arrow batch by partition and
  ``.apply.remote`` the slices to the owning actor;
- ``commit()`` flushes every actor's partitions to Parquet and performs
  the same atomic manifest flip as the batch path — crash before a
  commit loses only actor memory; restart reloads the committed
  snapshot and replays events above the watermark to the identical
  table (exactly-once, deterministic arg-max merge).

A tail-mode table is byte-compatible with the batch path: same snapshot
schema, same LWW semantics, same manifest; the e2e test asserts the
final tables are equal row-for-row.
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
    """Owns a set of partitions; holds their live snapshot + pending
    events between micro-batches. Merge work is the same vectorized
    arg-max as the batch path — the actor only AMORTIZES snapshot IO
    across micro-batches, it does not change semantics."""

    def __init__(self, table_root: str, parts: list[int]):
        self.root = table_root
        self.parts = set(parts)
        self.snapshots: dict[int, pa.Table | None] = {}
        self.pending: dict[int, list[pa.Table]] = {p: [] for p in parts}
        self.events_applied = 0
        manifest = load_manifest(table_root)
        if manifest:
            for p in parts:
                entry = manifest["partitions"].get(str(p))
                if entry:
                    tables = [
                        pq.read_table(os.path.join(table_root, f["path"]))
                        for f in entry["files"]
                    ]
                    self.snapshots[p] = (
                        pa.concat_tables(tables) if len(tables) > 1 else tables[0]
                    )

    def apply(self, part: int, block: pa.Table) -> int:
        """Buffer a micro-batch slice for one owned partition."""
        self.pending[part].append(block)
        self.events_applied += block.num_rows
        return block.num_rows

    def compact(self, part: int) -> None:
        """Fold pending events into the in-memory snapshot (bounds actor
        memory between commits for hot tails)."""
        if not self.pending[part]:
            return
        events = pa.concat_tables(self.pending[part], promote_options="permissive")
        self.snapshots[part] = _as_snapshot(
            merge_with_snapshot(events, self.snapshots.get(part))
        )
        self.pending[part] = []

    def flush(self, epoch_dir: str, target_fields: list[tuple[str, str, bool]]) -> list[dict]:
        """Merge + write every owned partition that has pending events or
        (on schema evolution) a stale snapshot; return manifest rows."""
        from ..schema import fields_to_schema

        target = fields_to_schema(
            [{"id": n, "type": t, "nullable": nu} for n, t, nu in target_fields]
        )
        out = []
        for p in sorted(self.parts):
            if not self.pending[p] and p in self.snapshots:
                continue  # untouched partition carries forward
            if not self.pending[p] and p not in self.snapshots:
                continue  # nothing at all for this partition
            self.compact(p)
            merged = normalize_batch(self.snapshots[p], target)
            self.snapshots[p] = merged
            rel = os.path.join("data", epoch_dir, f"part-{p:05d}-s00.parquet")
            abs_path = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(abs_path), exist_ok=True)
            pq.write_table(merged, abs_path)
            deleted = merged.column("_deleted")
            n_tomb = pc.sum(pc.cast(deleted, pa.int64())).as_py() or 0
            wm = pc.max(merged.column("_offset")).as_py()
            out.append(
                {
                    "part": p,
                    "salt": 0,
                    "path": rel,
                    "rows": merged.num_rows,
                    "live_rows": merged.num_rows - n_tomb,
                    "tombstones": n_tomb,
                    "bytes": os.path.getsize(abs_path),
                    "watermark": -1 if wm is None else int(wm),
                }
            )
        return out

    def stats(self) -> dict:
        return {
            "events_applied": self.events_applied,
            "partitions": sorted(self.parts),
            "resident_rows": sum(
                t.num_rows for t in self.snapshots.values() if t is not None
            ),
        }


def _as_snapshot(merged: pa.Table) -> pa.Table:
    return merged


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
        if manifest and int(manifest.get("metrics", {}).get("salt", 1)) > 1:
            from ..errors import InvalidConfigError

            raise InvalidConfigError(
                "tail mode writes salt=1 runs; this table has salted runs — "
                "re-salt first: compact(table_root, to_salt=1)"
            )
        self.watermark = manifest["global_watermark"] if manifest else -1
        self.epoch = manifest["epoch"] if manifest else 0
        # num_partitions is a table property (see run_ingest): a session
        # over an existing table MUST use the committed B — a different
        # value would re-hash keys and merge against the wrong partitions
        if manifest and manifest.get("num_partitions"):
            self.B = int(manifest["num_partitions"])
        else:
            self.B = self.cfg.num_partitions
        B = self.B
        owned: list[list[int]] = [[] for _ in range(num_actors)]
        for p in range(B):
            owned[p % num_actors].append(p)
        self.actors = [
            MergerActor.remote(table_root, parts) for parts in owned
        ]
        self._pending_events = 0
        self._pending_schema: pa.Schema | None = (
            public_schema(manifest) if manifest else None
        )

    def poll(self) -> int:
        """Apply all WAL segments beyond the watermark to the actor pool.
        Returns the number of events routed (0 = nothing new)."""
        chosen, new_wm, schema_groups = plan_segments(self.wal_dir, self.watermark)
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
        B, A = self.B, self.num_actors
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
            batch = add_partition_cols(batch, B, 1)
            part = batch.column("part").to_numpy(zero_copy_only=False)
            order = np.argsort(part, kind="stable")
            sorted_batch = batch.take(pa.array(order))
            sp = part[order]
            bounds = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
            refs = []
            for i, b in enumerate(bounds):
                end = bounds[i + 1] if i + 1 < len(bounds) else len(sp)
                p = int(sp[b])
                slice_t = sorted_batch.slice(b, end - b).drop_columns(["part"])
                refs.append(actors[p % A].apply.remote(p, slice_t))
            applied = sum(ray.get(refs))  # ack = backpressure
            return pa.table({"applied": pa.array([applied], pa.int64())})

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
            epoch, f"tail|{self.watermark}|{self._pending_events}"
        )
        fields = [
            (f.name, str(f.type), f.nullable) for f in self._pending_schema
        ]
        rows_nested = ray.get(
            [a.flush.remote(epoch_dir, fields) for a in self.actors]
        )
        manifest = load_manifest(self.root)
        updated = {}
        for rows in rows_nested:
            for r in rows:
                updated[str(r["part"])] = {
                    "files": [
                        {
                            "path": r["path"],
                            "salt": 0,
                            "rows": r["rows"],
                            "live_rows": r["live_rows"],
                            "tombstones": r["tombstones"],
                            "bytes": r["bytes"],
                            "epoch": epoch,
                        }
                    ],
                    "salt": 1,
                    "rows": r["rows"],
                    "live_rows": r["live_rows"],
                    "tombstones": r["tombstones"],
                    "bytes": r["bytes"],
                    "watermark": r["watermark"],
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
            metrics={"epoch_events_applied": self._pending_events, "salt": 1,
                     "mode": "tail"},
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

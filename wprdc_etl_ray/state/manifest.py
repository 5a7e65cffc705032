"""Manifest store: two-phase commit, watermarks, lineage (SURVEY.md §2.3 X7/X8/X10).

Reference parity: wprdc-etl keeps a SQLite ``status`` table with one row
per run — ``(name, display_name, last_ran, start_time, input_checksum,
status, num_lines)`` (pipeline/status.py::Status.write) — and uses the
input checksum as a duplicate guard (pipeline/pipeline.py::Pipeline.run
→ DuplicateFileException). This engine generalizes that to a per-table
JSON **manifest**:

- ``global_watermark`` — the max applied event offset; replays of
  already-committed segments are no-ops (exactly-once at event
  granularity, not file granularity);
- per-partition entries — data file path, row/tombstone counts,
  partition watermark, applied-event metrics (lineage);
- ``epoch`` — monotone commit counter; every commit writes
  ``manifest/epoch-{E}.json`` (history) and atomically replaces
  ``manifest/manifest.json`` via ``os.replace`` (POSIX atomic rename).

Data files are written under ``data/epoch={E}/`` *before* the manifest
flips — a crashed run leaves invisible orphan files, never a torn
table. Readers resolve files ONLY through the manifest. Partitions
untouched by an epoch carry their previous file forward without a
rewrite (no write amplification on cold partitions — the property that
matters at 10^10-event scale).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

from ..errors import ConcurrentCommitError, WatermarkRegressionError
from ..schema import fields_to_schema, schema_to_fields

MANIFEST_DIR = "manifest"
MANIFEST_FILE = "manifest.json"


def manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST_DIR, MANIFEST_FILE)


def load_manifest(root: str) -> dict | None:
    """Read the current committed manifest, or None for a fresh table."""
    path = manifest_path(root)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def empty_manifest(table: str, num_partitions: int) -> dict:
    return {
        "table": table,
        "epoch": 0,
        "committed_at": None,
        "global_watermark": -1,
        "num_partitions": num_partitions,
        "schema": None,
        "partitions": {},
    }


def public_schema(manifest: dict) -> pa.Schema | None:
    if manifest.get("schema") is None:
        return None
    return fields_to_schema(manifest["schema"])


def commit_manifest(
    root: str,
    prev: dict | None,
    *,
    table: str,
    num_partitions: int,
    schema: pa.Schema,
    new_watermark: int,
    updated_partitions: dict[str, dict],
    replace_all: bool = False,
    metrics: dict | None = None,
) -> dict:
    """Atomically publish a new epoch.

    ``updated_partitions`` maps partition id (str) → entry dict for
    partitions rewritten this epoch; all other partitions carry forward
    from ``prev``. Raises WatermarkRegressionError if the commit would
    move the global watermark backwards. ``replace_all=True`` (full
    refresh, the reference's drop-and-recreate ``method='insert'`` path)
    REPLACES the partition set wholesale and may rewind the watermark —
    old files stop being referenced at the same atomic flip.
    """
    if prev is None:
        prev = empty_manifest(table, num_partitions)
    if not replace_all and new_watermark < prev["global_watermark"]:
        raise WatermarkRegressionError(
            f"watermark {new_watermark} < committed {prev['global_watermark']}"
        )
    parts = dict(updated_partitions) if replace_all else dict(prev["partitions"])
    if not replace_all:
        parts.update(updated_partitions)
    manifest = {
        "table": table,
        "epoch": prev["epoch"] + 1,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "global_watermark": int(new_watermark),
        "num_partitions": num_partitions,
        "schema": schema_to_fields(schema),
        "partitions": parts,
        "metrics": metrics or {},
    }
    mdir = os.path.join(root, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    # optimistic concurrency under a commit lock: two racing writers
    # would otherwise both base on the same prev and the second
    # os.replace would silently drop the first's partitions. The loser
    # gets ConcurrentCommitError and must re-plan against the new
    # manifest (its watermark filter then skips the winner's events).
    import fcntl

    lock_path = os.path.join(mdir, ".commit.lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        current = load_manifest(root)
        cur_epoch = current["epoch"] if current else 0
        if cur_epoch != prev["epoch"]:
            raise ConcurrentCommitError(
                f"manifest moved to epoch {cur_epoch} while this commit was "
                f"based on epoch {prev['epoch']}; re-plan and retry"
            )
        # history copy (lineage per epoch), then atomic flip
        hist = os.path.join(mdir, f"epoch-{manifest['epoch']:06d}.json")
        with open(hist, "w") as f:
            json.dump(manifest, f, indent=1)
        tmp = os.path.join(mdir, f".tmp-{manifest['epoch']}")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, manifest_path(root))
    return manifest


def load_epoch_manifest(root: str, epoch: int) -> dict | None:
    """A committed epoch's manifest from the history dir (every commit
    writes ``epoch-{E}.json``, so any past table version stays
    addressable — the time-travel hook). Epoch 0 = the empty table."""
    if epoch == 0:
        return None
    path = os.path.join(root, MANIFEST_DIR, f"epoch-{epoch:06d}.json")
    with open(path) as f:
        return json.load(f)


def data_files(manifest: dict) -> list[str]:
    """Committed data file paths (relative to table root)."""
    return [
        f["path"]
        for e in manifest["partitions"].values()
        for f in e.get("files", [])
        if f.get("rows")
    ]


def tag_epoch(root: str, name: str, epoch: int | None = None) -> dict:
    """Name a committed epoch (git-tag / Delta version-alias analog):
    tags live in ``manifest/tags.json`` and pin nothing by themselves —
    pair with ``vacuum(keep_epochs=…)`` retention so tagged epochs'
    files survive as long as you need them readable."""
    import fcntl

    cur = load_manifest(root)
    if cur is None:
        raise ValueError(f"no committed table at {root}")
    e = int(cur["epoch"]) if epoch is None else int(epoch)
    hist = os.path.join(root, MANIFEST_DIR, f"epoch-{e:06d}.json")
    if e == 0 or not os.path.exists(hist):
        raise ValueError(f"epoch {e} was never committed at {root}")
    mdir = os.path.join(root, MANIFEST_DIR)
    path = os.path.join(mdir, "tags.json")
    with open(os.path.join(mdir, ".commit.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        tags = {}
        if os.path.exists(path):
            with open(path) as f:
                tags = json.load(f)
        tags[name] = e
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(tags, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    return tags


def resolve_tag(root: str, name: str) -> int:
    path = os.path.join(root, MANIFEST_DIR, "tags.json")
    if not os.path.exists(path):
        raise KeyError(f"no tags at {root}")
    with open(path) as f:
        tags = json.load(f)
    if name not in tags:
        raise KeyError(f"unknown tag {name!r} (have {sorted(tags)})")
    return int(tags[name])

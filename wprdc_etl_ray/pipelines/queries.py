"""Driver correctness-harness queries (SURVEY.md §2.3 X12) + DuckDB oracles.

One entry per implemented operator/pipeline; each callable takes
``sf_dir`` and returns a Dataset / pandas DataFrame / pyarrow Table.
Column names are IDENTICAL between the Ray implementation and the
oracle SQL (the driver's value-hash sorts columns by name).

Precision policy (engine-agnostic float comparison): every float
AGGREGATE is converted to FIXED-POINT BIGINT **per row, before
aggregation** (``floor(x*100+0.5)`` cents / basis points) so the sums
are exact integers — identical under every association order, engine,
partitioning and data scale. (Rounding a float SUM instead drifts by
1 ulp at large N when engines associate additions differently —
observed at sf0.1 and eliminated by this policy.) Means/ratios derive
by exact integer division (``cents * 10^4 // n``). Raw per-row doubles
(no re-aggregation) are kept as doubles: identical IEEE ops give
bit-identical values. Cosines are computed in float64 on BOTH sides
(DuckDB list_cosine_similarity is cast to DOUBLE[]).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_candidates,
    simhash_signatures,
)
from ..functions.multimodal import multimodal_features
from ..functions.relational import (
    broadcast_join,
    distinct_sorted,
    filter_batches,
    grouped_agg,
    hash_join,
    latest_per_key,
    read_table,
    semi_join,
)
from ..functions.similarity import all_pairs_nn, brute_force_topk, ivf_topk
from ..functions.text import fingerprint, lang_id, quality, token_stats

# --- helpers -----------------------------------------------------------------


def _to_cents_cols(cols: list[str], scale: int = 100):
    """PER-ROW fixed-point conversion floor(x*scale+0.5) -> int64,
    applied BEFORE any aggregation. Integer sums are exact under every
    association order, so the result is identical across engines,
    partitionings and data scales — unlike rounding a float SUM, which
    drifts by 1 ulp at large N when the two engines associate the
    additions differently (observed at sf0.1). The SQL side mirrors
    with SUM(CAST(FLOOR(x*scale+0.5) AS BIGINT))."""

    def fn(batch: pa.Table) -> pa.Table:
        for col in cols:
            i = batch.schema.get_field_index(col)
            v = pc.floor(
                pc.add(pc.multiply(batch.column(col).cast(pa.float64()), float(scale)), 0.5)
            ).cast(pa.int64())
            batch = batch.set_column(i, col, v)
        return batch

    return fn


def _avg_micro(batch: pa.Table, out_col: str, cents_col: str, n_col: str) -> pa.Table:
    """avg in micro-units from integer pieces: cents*10^4 // n (exact)."""
    cents = batch.column(cents_col).to_numpy(zero_copy_only=False)
    n = batch.column(n_col).to_numpy(zero_copy_only=False)
    val = (cents * 10000) // n
    return batch.append_column(out_col, pa.array(val, pa.int64()))


def _as_int64(cols: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        for col in cols:
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(i, col, batch.column(col).cast(pa.int64()))
        return batch

    return fn


# --- flagship CDC pipeline as a driver-checked query -------------------------

CDC_TMP = "/tmp/graft_cdc_oracle_v2"


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    return float(name.replace("sf", "")) if name.startswith("sf") else 0.01


def cdc_wal_dir(sf_dir: str) -> str:
    """Deterministic WAL for the flagship query, cached per scale factor.
    Generated with evolve_at=0.5: the first half of the segments carry
    the v1 schema (no tool metadata, int32 turn_idx), the rest v2 — so
    the driver-checked flagship exercises mid-stream schema evolution
    (X3) end to end, and the oracle reads the mixed-schema WAL with
    union_by_name."""
    sf = _sf_of(sf_dir)
    n_events = max(2000, int(6_000_000 * sf))
    out = os.path.join(CDC_TMP, os.path.basename(os.path.normpath(sf_dir)))
    wal = os.path.join(out, "wal")
    marker = os.path.join(out, f".complete-{n_events}")
    if not os.path.exists(marker):
        from ..gen import generate_change_log, write_wal

        log = generate_change_log(n_events, seed=42)
        write_wal(out, log, segment_rows=max(1000, n_events // 24), evolve_at=0.5)
        with open(marker, "w") as f:
            f.write(str(n_events))
    return wal


def q_cdc_flagship(sf_dir: str):
    """WAL tail → LWW upsert merge → exactly-once commit → read back.
    The whole engine in one query; oracle = the A5 window SQL over the
    same WAL files."""
    from .cdc import CDCConfig, read_transcripts, run_ingest

    wal = cdc_wal_dir(sf_dir)
    root = os.path.join(os.path.dirname(wal), "table")
    run_ingest(wal, root, CDCConfig(num_partitions=32))
    return read_transcripts(root)


def _cdc_oracle_sql() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")  # driver compares at sf0.01
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true)
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text, tool,
       tool_call_id, tool_args, ts
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_tail(sf_dir: str):
    """The STATEFUL path under the driver's hash gate: the flagship WAL
    delivered in four waves to a live TailSession (merger actors hold
    state between polls; each commit is the same atomic flip), read
    back. Oracle = the full-WAL replay — equality proves tail mode is
    byte-equivalent to batch ingest at the driver's scale too."""
    from ..state.manifest import load_manifest
    from .cdc import CDCConfig, list_segments, read_transcripts
    from .tail import TailSession

    wal = cdc_wal_dir(sf_dir)
    base = os.path.dirname(wal)
    root = os.path.join(base, "table_tail")
    m = load_manifest(root)
    if not m or m["epoch"] < 4:
        segs = list_segments(wal)
        live = os.path.join(base, "wal_tail_live")
        import shutil as _shutil

        _shutil.rmtree(root, ignore_errors=True)
        _shutil.rmtree(live, ignore_errors=True)
        os.makedirs(live)
        sess = TailSession(
            live, root, CDCConfig(num_partitions=32), num_actors=8
        )
        waves = 4
        per = (len(segs) + waves - 1) // waves
        for w in range(waves):
            for s in segs[w * per : (w + 1) * per]:
                os.symlink(s, os.path.join(live, os.path.basename(s)))
            sess.poll()
            sess.commit()
        sess.shutdown()
    return read_transcripts(root)


def q_conv_text_export(sf_dir: str):
    """The CDC→training handoff: each conversation of the MATERIALIZED
    flagship table assembled into one role-prefixed training document
    (string_agg ORDER BY turn_idx) — bucketed exchange on conv_id,
    in-bucket sort + vectorized per-key join, no global sort. Oracle =
    string_agg over the replayed live state."""
    from ..functions.relational import bucketed_group_map
    from .cdc import read_transcripts

    wal = cdc_wal_dir(sf_dir)
    root = os.path.join(os.path.dirname(wal), "table")
    from .cdc import CDCConfig, run_ingest

    run_ingest(wal, root, CDCConfig(num_partitions=32))  # no-op when committed
    ds = read_transcripts(root, columns=["conv_id", "turn_idx", "role", "text"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        line = g["role"].fillna("") + ": " + g["text"].fillna("")
        out = (
            pd.DataFrame({"conv_id": g["conv_id"], "line": line})
            .groupby("conv_id", sort=False)["line"]
            .agg("\n".join)
            .reset_index()
            .rename(columns={"line": "doc"})
        )
        out["n_chars"] = out["doc"].str.len().astype("int64")
        return out

    return bucketed_group_map(ds, ["conv_id"], per_bucket)


def _sql_conv_text_export() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")  # driver compares at sf0.01
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true)),
live AS (SELECT conv_id, turn_idx, role, text
         FROM ranked WHERE rn = 1 AND op <> 'delete')
SELECT conv_id,
       string_agg(coalesce(role, '') || ': ' || coalesce(text, ''),
                  chr(10) ORDER BY turn_idx) AS doc,
       CAST(length(string_agg(coalesce(role, '') || ': ' || coalesce(text, ''),
                  chr(10) ORDER BY turn_idx)) AS BIGINT) AS n_chars
FROM live GROUP BY conv_id
"""


def q_cdc_tail_mor(sf_dir: str):
    """The fourth cell of the (batch|tail) × (cow|mor) matrix under the
    driver's hash gate: a MOR tail session (actors hold only pending
    winners, commits append delta runs) over the flagship WAL in four
    waves. Oracle = the full replay, same as the other three cells."""
    from ..state.manifest import load_manifest
    from .cdc import CDCConfig, list_segments, read_transcripts
    from .tail import TailSession

    wal = cdc_wal_dir(sf_dir)
    base = os.path.dirname(wal)
    root = os.path.join(base, "table_tail_mor")
    m = load_manifest(root)
    if not m or m["epoch"] < 4:
        segs = list_segments(wal)
        live = os.path.join(base, "wal_tailmor_live")
        import shutil as _shutil

        _shutil.rmtree(root, ignore_errors=True)
        _shutil.rmtree(live, ignore_errors=True)
        os.makedirs(live)
        sess = TailSession(
            live, root,
            CDCConfig(num_partitions=32, write_mode="mor"), num_actors=8,
        )
        waves = 4
        per = (len(segs) + waves - 1) // waves
        for w in range(waves):
            for s in segs[w * per : (w + 1) * per]:
                os.symlink(s, os.path.join(live, os.path.basename(s)))
            sess.poll()
            sess.commit()
        sess.shutdown()
    return read_transcripts(root)


def q_cdc_mor(sf_dir: str):
    """Merge-on-read ingest: the flagship WAL applied in THREE epochs
    with write_mode='mor' — epochs append per-key delta runs instead of
    rewriting slots (write amplification O(epoch delta), the 10^10-event
    shape) and the read path LWW-merges each multi-run slot. Oracle =
    the same full-WAL replay SQL as the flagship: equality proves the
    deferred merge reaches the identical table state."""
    from .cdc import read_transcripts

    return read_transcripts(_cdc_mor_root(sf_dir))


def _cdc_mor_root(sf_dir: str) -> str:
    """Three-epoch MOR table over the flagship WAL, cached per scale
    factor; idempotent via the committed epoch counter."""
    from ..state.manifest import load_manifest
    from .cdc import CDCConfig, list_segments, run_ingest

    wal = cdc_wal_dir(sf_dir)
    base = os.path.dirname(wal)
    root = os.path.join(base, "table_mor")
    segs = list_segments(wal)
    m = load_manifest(root)
    epoch = m["epoch"] if m else 0
    for i in (1, 2, 3):
        if epoch >= i:
            continue
        sub = os.path.join(base, f"wal_mor_{i}")
        os.makedirs(sub, exist_ok=True)
        for s in segs[: round(len(segs) * i / 3)]:
            dst = os.path.join(sub, os.path.basename(s))
            if not os.path.exists(dst):
                os.symlink(s, dst)
        run_ingest(sub, root, CDCConfig(num_partitions=32, write_mode="mor"))
    return root


def q_delete_where(sf_dir: str):
    """Bulk DELETE FROM … WHERE over a shallow CLONE of the two-epoch
    table (hardlinked branch — the mutation never touches the shared
    fixture): every tool-call turn is tombstoned through the MERGE
    machinery, and the surviving table must equal the replay filtered
    by the same predicate."""
    from ..state.manifest import load_manifest
    from .cdc import clone_table, delete_where, read_transcripts

    base = _cdc_cf_root(sf_dir)
    root = os.path.join(os.path.dirname(base), "table_del")
    if load_manifest(root) is None:
        clone_table(base, root)
    if load_manifest(root)["epoch"] < 3:  # cf table commits at epoch 2
        delete_where(root, lambda b: pc.is_valid(b.column("tool")))
    return read_transcripts(root)


def _sql_delete_where() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")  # driver compares at sf0.01
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true))
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text, tool,
       tool_call_id, tool_args, ts
FROM ranked WHERE rn = 1 AND op <> 'delete' AND tool IS NULL
"""


def q_restore(sf_dir: str):
    """RESTORE verified against the WAL: a two-epoch table rolled back
    to epoch 1 must equal the replay of events up to epoch 1's
    watermark — state AND watermark rewind together. (Built as its own
    table: restore targets the table's OWN history — a shallow clone
    deliberately does not carry pre-birth epochs.)"""
    from ..state.manifest import load_manifest
    from .cdc import CDCConfig, read_transcripts, restore_table, run_ingest

    base = os.path.dirname(cdc_wal_dir(sf_dir))
    _cdc_cf_root(sf_dir)  # ensures the half-WAL symlink dir exists
    half = os.path.join(base, "wal_half")
    wal = os.path.join(base, "wal")
    root = os.path.join(base, "table_restore")
    m = load_manifest(root)
    epoch = m["epoch"] if m else 0
    if epoch < 1:
        run_ingest(half, root, CDCConfig(num_partitions=32))
    if epoch < 2:
        run_ingest(wal, root, CDCConfig(num_partitions=32))
    if epoch < 3:
        restore_table(root, epoch=1)
    return read_transcripts(root)


def _sql_restore() -> str:
    from ..state.manifest import load_epoch_manifest

    q_restore("/root/testdata/sf0.01")  # materialize; driver compares at sf0.01
    root = os.path.join(os.path.dirname(cdc_wal_dir("/root/testdata/sf0.01")), "table_restore")
    w1 = load_epoch_manifest(root, 1)["global_watermark"]
    wal = cdc_wal_dir("/root/testdata/sf0.01")
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true)
  WHERE "offset" <= {w1})
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""
# the restored table's schema is epoch 1's (pre-evolution v1: no tool
# metadata, int32 turn_idx) — schema rolls back WITH the state, so the
# oracle selects only v1 columns at v1 types


def q_branch_merge(sf_dir: str):
    """The full branch workflow, oracle-checked: a fresh clone of the
    two-epoch table fast-forwards the delete-branch's divergence via
    table_diff → merge_branch; the result must equal the branch (and
    hence the replay filtered by the branch's predicate)."""
    from ..state.manifest import load_manifest
    from .cdc import clone_table, merge_branch, read_transcripts

    base = _cdc_cf_root(sf_dir)
    q_delete_where(sf_dir)  # materialize the delete-branch fixture
    branch_root = os.path.join(os.path.dirname(base), "table_del")
    root = os.path.join(os.path.dirname(base), "table_bm")
    if load_manifest(root) is None:
        clone_table(base, root)
    if load_manifest(root)["epoch"] < 3:  # clone at 2; merge commits 3
        merge_branch(root, branch_root)
    return read_transcripts(root)


def q_update_where(sf_dir: str):
    """Bulk UPDATE … SET text WHERE tool IS NOT NULL over a clone
    branch: matched rows get redacted text through the partial-update
    MERGE (other columns keep prior values). Oracle = CASE over the
    replay."""
    import pyarrow.compute as _pc

    from ..state.manifest import load_manifest
    from .cdc import clone_table, read_transcripts, update_where

    base = _cdc_cf_root(sf_dir)
    root = os.path.join(os.path.dirname(base), "table_upd")
    if load_manifest(root) is None:
        clone_table(base, root)
    if load_manifest(root)["epoch"] < 3:  # clone at 2; update commits 3
        update_where(
            root,
            lambda b: _pc.is_valid(b.column("tool")),
            lambda hit: pa.table(
                {"text": pa.array(["[REDACTED]"] * hit.num_rows, pa.string())}
            ),
            set_cols=["text"],
        )
    return read_transcripts(root)


def _sql_update_where() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")  # driver compares at sf0.01
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true))
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
       CASE WHEN tool IS NOT NULL THEN '[REDACTED]' ELSE text END AS text,
       tool, tool_call_id, tool_args, ts
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def q_tool_index(sf_dir: str):
    """CDF-maintained secondary index: the inverted (tool → conv_id,
    n_turns) map over the two-epoch table — built at first call,
    incrementally refreshed from the pre/post-image change feed after
    (pipelines/index.py). Returns the FULL index content so the oracle
    verifies every pair, not a point probe."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from .index import refresh_index, _index_dir

    root = _cdc_cf_root(sf_dir)
    refresh_index(root, "tool")  # build on first call; no-op after
    files = sorted(_glob.glob(os.path.join(_index_dir(root, "tool"), "bucket-*.parquet")))
    t = pa.concat_tables([_pq.read_table(f) for f in files])
    return t.sort_by([("value", "ascending"), ("conv_id", "ascending")])


def _sql_tool_index() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")  # driver compares at sf0.01
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true))
SELECT tool AS value, conv_id, count(*) AS n_turns
FROM ranked WHERE rn = 1 AND op <> 'delete' AND tool IS NOT NULL
GROUP BY tool, conv_id
"""


def q_cdc_merge(sf_dir: str):
    """MERGE INTO: a source Dataset derived from the epoch-1 table via
    time travel (upper-cased upserts on turn%10==0, deletes on ==1,
    brand-new keys for ==2) applied in one atomic epoch — source rows
    win unconditionally when matched, no watermark movement. Oracle
    rebuilds the same source from the replay CTE and composes the
    post-merge table in SQL."""
    from .cdc import read_transcripts

    return read_transcripts(_cdc_merge_root(sf_dir))


def _cdc_merge_root(sf_dir: str) -> str:
    import pyarrow.compute as pc

    from ..state.manifest import load_manifest
    from .cdc import CDCConfig, merge_into, read_transcripts, run_ingest

    wal = cdc_wal_dir(sf_dir)
    base = os.path.dirname(wal)
    root = os.path.join(base, "table_merge")
    m = load_manifest(root)
    epoch = m["epoch"] if m else 0
    if epoch < 1:
        run_ingest(wal, root, CDCConfig(num_partitions=32))
    if epoch < 2:

        def mk_src(batch: pa.Table) -> pa.Table:
            import numpy as np

            turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
            mod = pa.array(turn.astype(np.int64) % 10, pa.int64())
            u = batch.filter(pc.equal(mod, 0))
            i = batch.filter(pc.equal(mod, 2))
            d = batch.filter(pc.equal(mod, 1))
            payload = ["role", "text", "tool", "tool_call_id", "tool_args", "ts"]

            def slab(t: pa.Table, turn_col, role, text, action):
                n = t.num_rows
                cols = {
                    "conv_id": t.column("conv_id"),
                    "turn_idx": turn_col,
                    "role": pa.array([role] * n, pa.string()),
                    "text": text,
                    "tool": t.column("tool"),
                    "tool_call_id": t.column("tool_call_id"),
                    "tool_args": t.column("tool_args"),
                    "ts": t.column("ts"),
                    "_action": pa.array([action] * n, pa.string()),
                }
                return pa.table(cols)

            outs = [
                slab(u, u.column("turn_idx"), "merged",
                     pc.utf8_upper(u.column("text")), "upsert"),
                slab(i, pc.add(i.column("turn_idx"), 100000), "merged",
                     pa.array(["NEW"] * i.num_rows, pa.string()), "upsert"),
                slab(d, d.column("turn_idx"), "merged",
                     pa.nulls(d.num_rows, pa.string()), "delete"),
            ]
            return pa.concat_tables(outs)

        src = read_transcripts(root, epoch=1).map_batches(
            mk_src, batch_format="pyarrow"
        )
        merge_into(root, src, job_id="q_cdc_merge")
    return root


def _cdc_merge_sql() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")  # driver compares at sf0.01
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true)
),
t AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text, tool,
         tool_call_id, tool_args, ts
  FROM ranked WHERE rn = 1 AND op <> 'delete')
SELECT conv_id, turn_idx, role, text, tool, tool_call_id, tool_args, ts
FROM t WHERE turn_idx % 10 NOT IN (0, 1)
UNION ALL
SELECT conv_id, turn_idx, 'merged', upper(text), tool,
       tool_call_id, tool_args, ts
FROM t WHERE turn_idx % 10 = 0
UNION ALL
SELECT conv_id, turn_idx + 100000, 'merged', 'NEW', tool,
       tool_call_id, tool_args, ts
FROM t WHERE turn_idx % 10 = 2
"""


def _cdc_cf_root(sf_dir: str) -> str:
    """Two-epoch table for the change-feed query: epoch 1 = first half
    of the flagship WAL's segments (symlinked into a sub-dir), epoch 2 =
    the rest. Idempotent: skips ingests the manifest already covers."""
    from .cdc import CDCConfig, list_segments, run_ingest
    from ..state.manifest import load_manifest

    wal = cdc_wal_dir(sf_dir)
    base = os.path.dirname(wal)
    root = os.path.join(base, "table_cf")
    half = os.path.join(base, "wal_half")
    segs = list_segments(wal)
    os.makedirs(half, exist_ok=True)
    for s in segs[: len(segs) // 2]:
        dst = os.path.join(half, os.path.basename(s))
        if not os.path.exists(dst):
            os.symlink(s, dst)
    m = load_manifest(root)
    epoch = m["epoch"] if m else 0
    if epoch < 1:
        run_ingest(half, root, CDCConfig(num_partitions=32))
    if epoch < 2:
        run_ingest(wal, root, CDCConfig(num_partitions=32))
    return root


def q_cdc_changes(sf_dir: str):
    """Change-data-feed between two committed epochs: per-key
    insert/update/delete rows derived purely from the epoch manifests —
    only REWRITTEN (part, salt) runs are read, carried-forward runs are
    pruned by path equality. Oracle = full-outer diff of the two LWW
    replays at the epochs' watermarks."""
    from .cdc import table_changes

    root = _cdc_cf_root(sf_dir)
    return table_changes(root, from_epoch=1, to_epoch=2)


def _cdc_changes_sql() -> str:
    from ..state.manifest import load_epoch_manifest

    root = _cdc_cf_root("/root/testdata/sf0.01")  # driver compares at sf0.01
    w1 = load_epoch_manifest(root, 1)["global_watermark"]
    wal = cdc_wal_dir("/root/testdata/sf0.01")
    glob_path = os.path.join(wal, "seg-*.parquet")
    payload = ["role", "text", "tool", "tool_call_id", "tool_args", "ts"]
    pick = ",\n       ".join(
        f"CASE WHEN n.conv_id IS NULL THEN o.{c} ELSE n.{c} END AS {c}" for c in payload
    )
    differs = " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}" for c in payload)
    return f"""
WITH ev AS (SELECT * FROM read_parquet('{glob_path}', union_by_name=true)),
old_r AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM ev WHERE "offset" <= {w1}),
old_s AS (SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                 role, text, tool, tool_call_id, tool_args, ts
          FROM old_r WHERE rn = 1 AND op <> 'delete'),
new_r AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM ev),
new_s AS (SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                 role, text, tool, tool_call_id, tool_args, ts
          FROM new_r WHERE rn = 1 AND op <> 'delete')
SELECT coalesce(n.conv_id, o.conv_id) AS conv_id,
       coalesce(n.turn_idx, o.turn_idx) AS turn_idx,
       {pick},
       CASE WHEN o.conv_id IS NULL THEN 'insert'
            WHEN n.conv_id IS NULL THEN 'delete'
            ELSE 'update' END AS change_type
FROM old_s o
FULL OUTER JOIN new_s n ON o.conv_id = n.conv_id AND o.turn_idx = n.turn_idx
WHERE o.conv_id IS NULL OR n.conv_id IS NULL OR ({differs})
"""


def q_cdc_incremental_view(sf_dir: str):
    """Incremental materialized-view maintenance: per-conv (n_turns,
    total_chars) at epoch 2 = the epoch-1 view (time-travel read) plus
    signed deltas from the pre/post-image change feed — the epoch-2
    table is never rescanned. Oracle = the full aggregate over the LWW
    replay of the whole WAL; equality proves the IVM algebra."""
    from .cdc import incremental_conv_stats

    root = _cdc_cf_root(sf_dir)
    return incremental_conv_stats(root, from_epoch=1, to_epoch=2)


def _cdc_incremental_view_sql() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true))
SELECT conv_id,
       count(*)::BIGINT AS n_turns,
       sum(length(coalesce(text, '')))::BIGINT AS total_chars
FROM ranked WHERE rn = 1 AND op <> 'delete'
GROUP BY conv_id
"""


def q_conv_role_quality(sf_dir: str):
    """Transcript data-quality audit over the MATERIALIZED table: per
    conversation, turn count, adjacent same-role repeats (a broken
    user/assistant alternation signal) and tool-call turns. One
    bucketed exchange on conv_id; the in-bucket kernel is a sort +
    shifted vector compare — no per-conv loop."""
    from ..functions.relational import bucketed_group_map
    from .cdc import read_transcripts

    root = _cdc_cf_root(sf_dir)
    ds = read_transcripts(root, columns=["conv_id", "turn_idx", "role", "tool"])

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        same_conv = s["conv_id"].to_numpy()[1:] == s["conv_id"].to_numpy()[:-1]
        role = s["role"].to_numpy()
        rep = np.concatenate([[False], (role[1:] == role[:-1]) & same_conv])
        s = s.assign(_rep=rep.astype(np.int64), _tool=s["tool"].notna().to_numpy().astype(np.int64))
        g = s.groupby("conv_id", sort=False).agg(
            n_turns=("turn_idx", "size"),
            n_role_repeats=("_rep", "sum"),
            n_tool_turns=("_tool", "sum"),
        )
        return g.reset_index().astype(
            {"n_turns": "int64", "n_role_repeats": "int64", "n_tool_turns": "int64"}
        )

    return bucketed_group_map(ds, ["conv_id"], per_bucket, num_buckets=16)


def _conv_role_quality_sql() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true)),
live AS (SELECT conv_id, turn_idx, role, tool FROM ranked
         WHERE rn = 1 AND op <> 'delete'),
lagged AS (
  SELECT conv_id, role, tool,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM live)
SELECT conv_id,
       count(*)::BIGINT AS n_turns,
       count(*) FILTER (role = prev_role)::BIGINT AS n_role_repeats,
       count(tool)::BIGINT AS n_tool_turns
FROM lagged GROUP BY conv_id
"""


def q_cdc_turn_counts(sf_dir: str):
    """Aggregate over the MERGED transcripts table (exercises the
    manifest-resolved read path end-to-end): per conversation, the live
    turn count and last event time. Oracle = the same aggregate over the
    window-deduped WAL."""
    from ..functions.relational import grouped_agg
    from .cdc import CDCConfig, read_transcripts, run_ingest

    wal = cdc_wal_dir(sf_dir)
    root = os.path.join(os.path.dirname(wal), "table")
    run_ingest(wal, root, CDCConfig(num_partitions=32))  # no-op if committed
    ds = read_transcripts(root, columns=["conv_id", "ts"])
    out = grouped_agg(
        ds, ["conv_id"], [("", "count", "n_turns"), ("ts", "max", "last_ts")]
    )
    return out.map_batches(_as_int64(["n_turns"]), batch_format="pyarrow")


def _cdc_turn_counts_sql() -> str:
    wal = cdc_wal_dir("/root/testdata/sf0.01")
    glob_path = os.path.join(wal, "seg-*.parquet")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY ts DESC, "offset" DESC) AS rn
  FROM read_parquet('{glob_path}', union_by_name=true)
),
final AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'delete')
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns, MAX(ts) AS last_ts
FROM final GROUP BY conv_id
"""


# --- relational / aggregate queries ------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter + grouped aggregates (Sum/Mean/Count with
    tree-combine inside Ray Data's aggregate)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    ds = filter_batches(
        ds, lambda t: pc.less_equal(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1998-09-02")))
    )

    def to_units(t: pa.Table) -> pa.Table:
        # per-row integer units BEFORE aggregation (exact at any scale):
        # qty/price in cents, discount in basis points; disc_price =
        # price_cents * (100 - disc_bp), an exact integer in 1e-4 $
        t = _to_cents_cols(["l_quantity", "l_extendedprice", "l_discount"])(t)
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(100, pa.int64()), t.column("l_discount")),
        )
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(to_units, batch_format="pyarrow")
    out = grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price"),
            ("disc_price", "sum", "sum_disc_price"),
            ("l_discount", "sum", "_sum_disc"),
            ("", "count", "count_order"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _as_int64(
            ["sum_qty", "sum_base_price", "sum_disc_price", "_sum_disc", "count_order"]
        )(t)
        t = _avg_micro(t, "avg_qty", "sum_qty", "count_order")
        t = _avg_micro(t, "avg_disc", "_sum_disc", "count_order")
        return t.drop_columns(["_sum_disc"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_PRICING = """
WITH u AS (
  SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)      AS qty_c,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)      AS disc_bp
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02')
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty_c) AS BIGINT)                    AS sum_qty,
       CAST(SUM(price_c) AS BIGINT)                  AS sum_base_price,
       CAST(SUM(price_c * (100 - disc_bp)) AS BIGINT) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT)                      AS count_order,
       CAST(SUM(qty_c) AS BIGINT) * 10000 // COUNT(*)   AS avg_qty,
       CAST(SUM(disc_bp) AS BIGINT) * 10000 // COUNT(*) AS avg_disc
FROM u
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_revenue(sf_dir: str):
    """Vectorized filter + projection with a computed column (per-row
    IEEE arithmetic — bit-identical across engines, no rounding)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    ds = filter_batches(
        ds,
        lambda t: pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
            pc.less(t.column("l_shipdate"), pa.scalar(hi)),
        ),
    )

    def proj(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "revenue": rev,
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")


SQL_FILTER_REVENUE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
"""


def q_table_profile(sf_dir: str):
    """Column-profiling sweep over orders: per column (n, nulls, exact
    n_distinct); per-batch pre-dedup shrinks the distinct explode
    before it shuffles."""
    from ..functions.relational import table_profile

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    ds = read_table(sf_dir, "orders", columns=cols)
    return table_profile(ds, cols)


SQL_TABLE_PROFILE = """
SELECT 'o_orderkey' AS col, count(*)::BIGINT AS n,
       (count(*) - count(o_orderkey))::BIGINT AS nulls,
       count(DISTINCT o_orderkey)::BIGINT AS n_distinct FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
       count(DISTINCT o_totalprice) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority) FROM orders
"""


def q_bucketed_join(sf_dir: str):
    """Co-partitioned storage join: orders and customer are written ONCE
    hash-bucketed by custkey (resumable sink, schema-recorded layout),
    then the join runs one local task per bucket with NO shuffle —
    the pay-the-exchange-once pattern for keys joined repeatedly
    (functions/bucketed.py). Oracle = the plain SQL equi-join."""
    from ..functions.bucketed import bucketed_join, bucketed_write

    base = os.path.join(
        "/tmp/graft_bucketed", os.path.basename(os.path.normpath(sf_dir))
    )
    odir, cdir = os.path.join(base, "orders"), os.path.join(base, "customer")
    if not os.path.exists(os.path.join(odir, "_BUCKETS.json")):
        bucketed_write(
            read_table(sf_dir, "orders",
                       columns=["o_orderkey", "o_custkey", "o_totalprice"]),
            odir, key="o_custkey", n_buckets=16,
        )
    if not os.path.exists(os.path.join(cdir, "_BUCKETS.json")):
        bucketed_write(
            read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]),
            cdir, key="c_custkey", n_buckets=16,
        )
    joined = bucketed_join(odir, cdir, how="inner")

    def to_cents(batch: pa.Table) -> pa.Table:
        v = pc.floor(
            pc.add(pc.multiply(batch.column("o_totalprice").cast(pa.float64()), 100.0), 0.5)
        ).cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_custkey": batch.column("o_custkey"),
                "c_name": batch.column("c_name"),
                "o_total_cents": v,
            }
        )

    return joined.map_batches(to_cents, batch_format="pyarrow")


SQL_BUCKETED_JOIN = """
SELECT o_orderkey, o_custkey, c_name,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS o_total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_event_pivot(sf_dir: str):
    """PIVOT events to one wide row per user (count column per event
    type): batch-local widening BEFORE the shuffle, composable sums
    after. Oracle = the count(*) FILTER block."""
    from ..functions.relational import pivot_counts

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    out = pivot_counts(
        ds, "user_id", "event_type",
        ["click", "error", "purchase", "signup", "view"],
    )

    def cast(batch: pa.Table) -> pa.Table:
        cols = {"user_id": batch.column("user_id").cast(pa.int64())}
        for v in ("click", "error", "purchase", "signup", "view"):
            cols[v] = batch.column(v).cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(cast, batch_format="pyarrow")


SQL_EVENT_PIVOT = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id
"""


def q_event_melt(sf_dir: str):
    """UNPIVOT composition: the wide per-user pivot melted back to long
    (user_id, variable, value) — wide→long is batch-local, no shuffle.
    Oracle = native UNPIVOT over the FILTER-block pivot."""
    from ..functions.relational import melt

    wide = q_event_pivot(sf_dir)
    return melt(
        wide, ["user_id"],
        ["click", "error", "purchase", "signup", "view"],
    )


SQL_EVENT_MELT = f"""
WITH wide AS ({SQL_EVENT_PIVOT})
SELECT user_id, variable, value
FROM wide UNPIVOT (value FOR variable IN (click, error, purchase, signup, view))
"""


def q_priority_rollup(sf_dir: str):
    """Multi-granularity aggregate in one logical pass: GROUP BY
    ROLLUP(o_orderpriority, o_orderstatus) — the finest level is the
    only aggregation of the INPUT (partial pre-agg + one shuffle);
    coarser levels re-aggregate the finest result, never rescanning.
    Oracle = native ROLLUP + GROUPING_ID."""
    from ..functions.relational import rollup_agg

    ds = read_table(
        sf_dir, "orders",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    ).map_batches(_to_cents_cols(["o_totalprice"]), batch_format="pyarrow")
    out = rollup_agg(
        ds,
        ["o_orderpriority", "o_orderstatus"],
        [("o_totalprice", "sum", "sum_cents"), ("o_totalprice", "count", "n")],
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "o_orderstatus": batch.column("o_orderstatus"),
                "sum_cents": batch.column("sum_cents").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
                "lvl": batch.column("lvl").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


SQL_PRIORITY_ROLLUP = """
SELECT o_orderpriority, o_orderstatus,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       COUNT(*) AS n,
       GROUPING_ID(o_orderpriority, o_orderstatus) AS lvl
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_priority_cube(sf_dir: str):
    """GROUP BY CUBE: all four granularities of (priority, status) from
    ONE aggregation of the input (subsets derive from the materialized
    finest level). Oracle = native CUBE + GROUPING_ID."""
    from ..functions.relational import cube_agg

    ds = read_table(
        sf_dir, "orders",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    ).map_batches(_to_cents_cols(["o_totalprice"]), batch_format="pyarrow")
    out = cube_agg(
        ds,
        ["o_orderpriority", "o_orderstatus"],
        [("o_totalprice", "sum", "sum_cents"), ("o_totalprice", "count", "n")],
    )

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "o_orderstatus": batch.column("o_orderstatus"),
                "sum_cents": batch.column("sum_cents").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
                "lvl": batch.column("lvl").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


SQL_PRIORITY_CUBE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       COUNT(*) AS n,
       GROUPING_ID(o_orderpriority, o_orderstatus) AS lvl
FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


def q_region_revenue(sf_dir: str):
    """Four-table join chain (TPC-H Q5 shape): lineitem ⋈ orders ⋈
    customer partitioned on their keys, nation⋈region folded driver-side
    and BROADCAST (tiny dimension chain — no shuffle for the small
    sides). Revenue quantized per row (floor(p·(1−d)·10^4 + 0.5)) BEFORE
    the sum so integer aggregation is order-independent; the join
    payload is pre-narrowed to (key, rev) before any exchange."""
    import pyarrow.parquet as pq

    from ..functions.relational import broadcast_join, grouped_agg, hash_join

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def rev(batch: pa.Table) -> pa.Table:
        p = batch.column("l_extendedprice").cast(pa.float64())
        d = batch.column("l_discount").cast(pa.float64())
        r = pc.floor(
            pc.add(pc.multiply(pc.multiply(p, pc.subtract(pa.scalar(1.0), d)), 10000.0), 0.5)
        ).cast(pa.int64())
        return pa.table({"l_orderkey": batch.column("l_orderkey"), "rev": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    # Group key (r_name) is functionally dependent on the join keys, so
    # MAP-SIDE partials push BELOW each join (local_combine — in-batch
    # Arrow group_by, no extra exchange, no empty-block normalization):
    # lineitem pre-combines per order, the order-level partials
    # pre-combine per customer below the second join, and the final
    # region rollup sums partials. Reduction = block-local key
    # duplication (see q_segment_revenue's docstring for the measured
    # trade-off vs a global pre-agg).
    from ..functions.relational import local_combine

    pre_ord = local_combine(
        li, ["l_orderkey"], [("rev", "sum", "_rev"), ("", "count", "_n")]
    )
    ords = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j1 = hash_join(pre_ord, ords, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    pre_cust = local_combine(
        j1, ["o_custkey"], [("_rev", "sum", "_rev"), ("_n", "sum", "_n")]
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j2 = hash_join(pre_cust, cust, on="o_custkey", right_on="c_custkey", num_partitions=8)

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    j3 = broadcast_join(j2, dim, on="c_nationkey", right_on="n_nationkey")
    out = grouped_agg(
        j3, ["r_name"], [("_n", "sum", "n_items"), ("_rev", "sum", "revenue")]
    )
    return out.map_batches(_as_int64(["n_items", "revenue"]), batch_format="pyarrow")


SQL_REGION_REVENUE = """
SELECT r_name,
       count(*)::BIGINT AS n_items,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                AS BIGINT))::BIGINT AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_topk_orders(sf_dir: str):
    """Global sort + top-k with a deterministic tiebreak."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_segment_revenue(sf_dir: str):
    """Partitioned hash join (Dataset.join) orders ⋈ customer → grouped sum.

    The group key (c_mktsegment) is functionally dependent on the join
    key, so orders pre-combine per o_custkey below the join with a
    MAP-SIDE-ONLY partial (local_combine — no extra exchange, no
    empty-block normalization) and the final segment rollup sums the
    partials — same result exactly. The reduction equals the
    block-local key duplication: ~8% at sf0.1's 2.3 k-row blocks
    (ds.stats(): 150 000 → 138 840 join rows), approaching the full
    10:1 fact/key ratio as block size grows past the key space or when
    the table is key-clustered. The GLOBAL pre-agg variant (grouped_agg
    below the join) ships exactly one row per customer but measured
    SLOWER end-to-end at bench scale (4.15 s vs 2.64 s — its native
    groupby + empty-block normalization outweigh the shuffle savings);
    at 100 TB, where the join's all-to-all dominates, flip to it."""
    from ..functions.relational import local_combine

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    o = orders.map_batches(_to_cents_cols(["o_totalprice"]), batch_format="pyarrow")
    pre = local_combine(
        o,
        ["o_custkey"],
        [("o_totalprice", "sum", "_rev"), ("", "count", "_n")],
    )
    j = hash_join(pre, cust, on="o_custkey", right_on="c_custkey", num_partitions=8)
    out = grouped_agg(
        j,
        ["c_mktsegment"],
        [("_rev", "sum", "total_revenue"), ("_n", "sum", "n_orders")],
    )
    return out.map_batches(
        _as_int64(["total_revenue", "n_orders"]), batch_format="pyarrow"
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_revenue,
       CAST(COUNT(*) AS BIGINT)                             AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_region_customers(sf_dir: str):
    """Broadcast join: dimension chain nation⋈region merged driver-side
    (tiny), ray.put once, merged per customer batch — no shuffle."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    j = broadcast_join(cust, dim, on="c_nationkey", right_on="n_nationkey")
    j = j.map_batches(_to_cents_cols(["c_acctbal"]), batch_format="pyarrow")
    out = grouped_agg(
        j,
        ["r_name"],
        [("", "count", "n_customers"), ("c_acctbal", "sum", "_sum_bal")],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _as_int64(["_sum_bal", "n_customers"])(t)
        t = _avg_micro(t, "avg_acctbal", "_sum_bal", "n_customers")
        return t.drop_columns(["_sum_bal"])

    return out.map_batches(finish, batch_format="pyarrow")


SQL_REGION_CUSTOMERS = """
SELECT r_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) * 10000 // COUNT(*) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_distinct_event_types(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type"])
    return distinct_sorted(ds, "event_type")


SQL_DISTINCT_EVENT_TYPES = "SELECT DISTINCT event_type FROM events"


def q_event_windows(sf_dir: str):
    """Tumbling event-time window (1 day) per event_type: the engine's
    windowed-aggregate op (floor_temporal + groupby)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        return pa.table(
            {"event_type": t.column("event_type"), "day": day, "value": t.column("value")}
        )

    out = grouped_agg(
        ds.map_batches(bucket, batch_format="pyarrow").map_batches(
            _to_cents_cols(["value"]), batch_format="pyarrow"
        ),
        ["event_type", "day"],
        [("", "count", "n"), ("value", "sum", "sum_value")],
    )
    return out.map_batches(_as_int64(["n", "sum_value"]), batch_format="pyarrow")


SQL_EVENT_WINDOWS = """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
FROM events GROUP BY event_type, date_trunc('day', ts)
"""


def q_latest_event_per_user(sf_dir: str):
    """Latest-event-wins per user — the CDC arg-max kernel over the
    driver's events table (per-batch partial arg-max, bucket shuffle,
    per-bucket final arg-max)."""
    # column-pruned read: without columns= the wide props JSON string
    # rides the whole arg-max exchange only to be dropped at the end
    ds = read_table(
        sf_dir, "events", columns=["user_id", "event_id", "event_type", "value", "ts"]
    )
    out = latest_per_key(ds, ["user_id"], ["ts", "event_id"], num_buckets=8)
    return out.select_columns(["user_id", "event_id", "event_type", "value", "ts"])


SQL_LATEST_EVENT = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events)
SELECT user_id, event_id, event_type, value, ts FROM ranked WHERE rn = 1
"""


def q_sessionize(sf_dir: str):
    """Gap-based sessionization (30 min) per user: bucketed group-map
    (ONE task per hash bucket, not per user — per-key task overhead
    would dominate at millions of users), vectorized sort+diff inside
    the bucket."""
    from ..functions.relational import bucketed_group_map

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"])
        new_user = b["user_id"] != b["user_id"].shift()
        gap = (b["ts"].diff() > pd.Timedelta(minutes=30)) & ~new_user
        # sessions per user = 1 + number of >30min gaps within the user
        out = (
            pd.DataFrame({"user_id": b["user_id"], "g": gap})
            .groupby("user_id", sort=False)["g"]
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {"user_id": out["user_id"], "n_sessions": (1 + out["g"]).astype("int64")}
        )

    out = bucketed_group_map(ds, ["user_id"], sessions, num_buckets=32)
    return out.map_batches(_as_int64(["n_sessions"]), batch_format="pyarrow")


SQL_SESSIONIZE = """
WITH d AS (
  SELECT user_id, ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id,
       CAST(1 + SUM(CASE WHEN gap > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM d GROUP BY user_id
"""


def q_asof_purchase(sf_dir: str):
    """As-of join (custom operator — Ray Data has none): every event
    picks up the user's latest purchase value at-or-before its ts.
    One hash shuffle on user_id; pd.merge_asof inside the bucket."""
    from ..functions.relational import asof_join

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    pur = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    pur = filter_batches(
        pur, lambda t: pc.equal(t.column("event_type"), pa.scalar("purchase"))
    ).select_columns(["user_id", "ts", "value"])
    out = asof_join(ev, pur, on="ts", by="user_id", num_buckets=16)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"value": "last_purchase_value"})

    return out.map_batches(finish, batch_format="pandas")


SQL_ASOF_PURCHASE = """
SELECT a.event_id, a.user_id, a.ts, b.value AS last_purchase_value
FROM events a ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def q_semi_join_parts(sf_dir: str):
    """Semi join via broadcast key set (no shuffle of the big side)."""
    import pyarrow.parquet as pq

    parts = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    keys = parts.filter(pc.greater(parts.column("p_size"), 40)).column("p_partkey")
    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_returnflag", "l_quantity"])
    f = semi_join(ds, keys.to_numpy(), "l_partkey")
    f = f.map_batches(_to_cents_cols(["l_quantity"]), batch_format="pyarrow")
    out = grouped_agg(
        f, ["l_returnflag"], [("", "count", "n"), ("l_quantity", "sum", "sum_qty")]
    )
    return out.map_batches(_as_int64(["n", "sum_qty"]), batch_format="pyarrow")


SQL_SEMI_JOIN_PARTS = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
GROUP BY l_returnflag
"""


def q_anti_join_customers(sf_dir: str):
    """Anti join via broadcast key set: customers with no high-value
    order (the NOT IN set is built from a filtered scan)."""
    import pyarrow.parquet as pq

    ot = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    okeys = ot.filter(pc.greater(ot.column("o_totalprice"), 300000.0)).column("o_custkey")
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    f = semi_join(ds, okeys.to_numpy(), "c_custkey", anti=True)
    out = grouped_agg(f, ["c_mktsegment"], [("", "count", "n_customers")])
    return out.map_batches(_as_int64(["n_customers"]), batch_format="pyarrow")


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
GROUP BY c_mktsegment
"""


def q_order_priority(sf_dir: str):
    """TPC-H Q4 shape: EXISTS semi-join.

    EXISTS(l_shipdate > o_orderdate) ⟺ MAX(l_shipdate) > o_orderdate,
    so lineitem pre-aggregates to its per-order max shipdate BELOW the
    join: the exchange ships one row per order instead of one per
    lineitem, and the post-join rows are already order-distinct (the r4
    plan joined the full lineitem stream and deduped after). The
    pre-agg runs through latest_per_key's pre-reduced warm exchange —
    measured faster than a native grouped_agg here (4.1 vs 4.8 s at
    sf0.01/32), whose sort shuffle + empty-block normalization cost
    more than the join savings."""
    from ..functions.relational import latest_per_key

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    pre = latest_per_key(li, ["l_orderkey"], ["l_shipdate"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    j = hash_join(pre, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    j = filter_batches(
        j, lambda t: pc.greater(t.column("l_shipdate"), t.column("o_orderdate"))
    )
    out = grouped_agg(j, ["o_orderpriority"], [("", "count", "n_orders")])
    return out.map_batches(_as_int64(["n_orders"]), batch_format="pyarrow")


SQL_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q_user_value_stats(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column(
            "value_c",
            pc.floor(pc.add(pc.multiply(t.column("value").cast(pa.float64()), 100.0), 0.5)).cast(pa.int64()),
        )

    out = grouped_agg(
        ds.map_batches(add_cents, batch_format="pyarrow"),
        ["user_id"],
        [
            ("", "count", "n"),
            ("value_c", "sum", "sum_value"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _as_int64(["n", "sum_value"])(t)
        return _avg_micro(t, "avg_value", "sum_value", "n")

    return out.map_batches(finish, batch_format="pyarrow")


SQL_USER_VALUE_STATS = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value,
       MIN(value)               AS min_value,
       MAX(value)               AS max_value,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) * 10000 // COUNT(*) AS avg_value
FROM events GROUP BY user_id
"""


def q_top_orders_per_segment(sf_dir: str):
    """Windowed rank: top-3 orders by price per market segment —
    per-batch local top-k combiner, one bucket shuffle, per-bucket
    head(k) (functions/relational.py::topk_per_key)."""
    from ..functions.relational import topk_per_key

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def local_top3_per_cust(b: pd.DataFrame) -> pd.DataFrame:
        # batch-local combiner BELOW the join: a customer contributes at
        # most its own top-3 to its segment's top-3, so keeping 3 rows
        # per customer per batch (map-only, no exchange) is a lossless
        # superset that shrinks the join's all-to-all input.
        s = b.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        return s.groupby("o_custkey", sort=False).head(3)

    orders = orders.map_batches(local_top3_per_cust, batch_format="pandas")
    j = hash_join(orders, cust, on="o_custkey", right_on="c_custkey", num_partitions=8)
    j = j.select_columns(["c_mktsegment", "o_orderkey", "o_totalprice"])
    return topk_per_key(
        j,
        ["c_mktsegment"],
        ["o_totalprice", "o_orderkey"],
        k=3,
        descending=[True, False],
    )


SQL_TOP_ORDERS_PER_SEGMENT = """
WITH j AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM j)
SELECT c_mktsegment, o_orderkey, o_totalprice FROM r WHERE rn <= 3
"""


def q_user_value_spread(sf_dir: str):
    """Per-user variance + exact median in integer units (population
    variance in cents² via (nΣx²-(Σx)²)//n²; median in micro-units) —
    grouped second-moment aggregates the basic Sum/Count layer lacks."""
    from ..functions.relational import bucketed_group_map

    ds = read_table(sf_dir, "events", columns=["user_id", "value"])

    def spread(bucket: pd.DataFrame) -> pd.DataFrame:
        xc = np.floor(bucket["value"].to_numpy() * 100 + 0.5).astype("int64")
        b = pd.DataFrame({"user_id": bucket["user_id"], "xc": xc, "x2": xc * xc})

        def p95(v: pd.Series) -> int:
            # exact discrete percentile: sorted[floor(0.95*(n-1))], the
            # same zero-based index rule the SQL window mirror uses
            a = np.sort(v.to_numpy())
            return int(a[int(np.floor(0.95 * (len(a) - 1)))])

        g = b.groupby("user_id", sort=False).agg(
            n=("xc", "size"), s=("xc", "sum"), s2=("x2", "sum"),
            med=("xc", "median"), p95_cents=("xc", p95),
        ).reset_index()
        n = g["n"].to_numpy().astype("int64")
        s = g["s"].to_numpy().astype("int64")
        s2 = g["s2"].to_numpy().astype("int64")
        return pd.DataFrame(
            {
                "user_id": g["user_id"],
                "n": n,
                "var_cents2": (n * s2 - s * s) // (n * n),
                "median_micro": np.floor(g["med"].to_numpy() * 10000 + 0.5).astype(
                    "int64"
                ),
                "p95_cents": g["p95_cents"].astype("int64"),
            }
        )

    return bucketed_group_map(ds, ["user_id"], spread, num_buckets=16)


SQL_USER_VALUE_SPREAD = """
WITH c AS (
  SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS xc FROM events),
r AS (
  SELECT user_id, xc,
         row_number() OVER (PARTITION BY user_id ORDER BY xc) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM c),
p AS (
  SELECT user_id, xc AS p95_cents FROM r
  WHERE rn = 1 + CAST(FLOOR(0.95 * (n - 1)) AS BIGINT))
SELECT c2.user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST((COUNT(*) * SUM(xc * xc) - SUM(xc) * SUM(xc))
            // (COUNT(*) * COUNT(*)) AS BIGINT) AS var_cents2,
       CAST(FLOOR(median(xc) * 10000 + 0.5) AS BIGINT) AS median_micro,
       CAST(ANY_VALUE(p.p95_cents) AS BIGINT) AS p95_cents
FROM c c2 JOIN p ON c2.user_id = p.user_id
GROUP BY c2.user_id
"""


_VALUE_BANDS = [(0.0, 5.0, "low"), (5.0, 25.0, "mid"), (25.0, float("inf"), "high")]


def q_value_bands(sf_dir: str):
    """Range join via broadcast binning: the (tiny) interval table is a
    broadcast np.searchsorted lookup inside map_batches — no shuffle of
    the big side, the standard scale shape for interval/range joins
    against a small band table."""
    ds = read_table(sf_dir, "events", columns=["value"])
    edges = np.array([b[1] for b in _VALUE_BANDS[:-1]])
    labels = np.array([b[2] for b in _VALUE_BANDS], dtype=object)

    def bin_batch(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, v, side="right")
        return pa.table(
            {"band": pa.array(labels[idx], pa.string()), "value": t.column("value")}
        )

    out = grouped_agg(
        ds.map_batches(bin_batch, batch_format="pyarrow").map_batches(
            _to_cents_cols(["value"]), batch_format="pyarrow"
        ),
        ["band"],
        [("", "count", "n"), ("value", "sum", "sum_value")],
    )
    return out.map_batches(_as_int64(["n", "sum_value"]), batch_format="pyarrow")


SQL_VALUE_BANDS = """
WITH bands(lo, hi, band) AS (
  VALUES (0.0, 5.0, 'low'), (5.0, 25.0, 'mid'), (25.0, 1e308, 'high'))
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
"""


# --- dedup / text / similarity / multimodal ----------------------------------


def q_dedup_exact(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(ds)


SQL_DEDUP_EXACT = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text
"""


def q_token_stats(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_stats, batch_format="pyarrow")


SQL_TOKEN_STATS = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS BIGINT) * 1000000
         // GREATEST(len(regexp_split_to_array(trim(text), '\s+')), 1) AS avg_token_len
FROM documents
"""

_STOPWORDS = "the and of a to in is it that for on with as are this".split()


def q_quality(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return quality(ds)


SQL_QUALITY = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(t, x -> list_contains({stop}, x))) AS BIGINT) * 1000000
         // GREATEST(len(t), 1) AS stopword_ratio
FROM toks
""".replace("{stop}", "[" + ",".join(f"'{w}'" for w in _STOPWORDS) + "]")


def q_quality_filter(sf_dir: str):
    """The C4/Gopher-style combined pretraining filter: language-ID +
    repetition + length rules evaluated in ONE batch pass over the
    corpus (all three kernels are batch-local — single scan, zero
    shuffle), emitting keep + a reason bitmask per document. Oracle
    composes the three per-signal SQLs and applies identical rules."""
    from ..functions.text import LangId, repetition_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    lang_kernel = LangId()

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        li = lang_kernel(batch)
        rep = repetition_stats(batch)
        bits = (
            (li["lang_pred"].to_numpy() != "en").astype("int64") * 1
            + (rep["dup_word_ratio"].to_numpy() > 600_000).astype("int64") * 2
            + (rep["n_tokens"].to_numpy() < 20).astype("int64") * 4
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "keep": (bits == 0).astype("int64"),
                "reasons": bits,
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def _sql_quality_filter() -> str:
    return f"""
WITH l AS (SELECT * FROM ({_sql_lang_id()})),
r AS (SELECT * FROM ({SQL_DOC_REPETITION}))
SELECT l.doc_id,
       CAST(CASE WHEN l.lang_pred = 'en' AND r.dup_word_ratio <= 600000
                  AND r.n_tokens >= 20 THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST((CASE WHEN l.lang_pred <> 'en' THEN 1 ELSE 0 END)
          + (CASE WHEN r.dup_word_ratio > 600000 THEN 2 ELSE 0 END)
          + (CASE WHEN r.n_tokens < 20 THEN 4 ELSE 0 END) AS BIGINT) AS reasons
FROM l JOIN r ON l.doc_id = r.doc_id
"""


def q_bpe_tokens(sf_dir: str):
    """BPE-ish token counting — RE2 regex kernels in pure Arrow."""
    from ..functions.text import bpe_token_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(bpe_token_stats, batch_format="pyarrow")


SQL_BPE_TOKENS = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(coalesce(text,''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(coalesce(text,''), '[A-Za-z]+')) AS BIGINT) AS n_alpha_tokens,
       CAST(len(regexp_extract_all(coalesce(text,''), '[0-9]+')) AS BIGINT) AS n_numeric_tokens,
       CAST(len(regexp_extract_all(coalesce(text,''), '[^A-Za-z0-9\s]')) AS BIGINT) AS n_other_tokens
FROM documents
"""


def q_event_windows_sliding(sf_dir: str):
    """SLIDING event-time window (24h window, 12h hop): every event
    lands in size/hop windows via an in-batch replicate, then the same
    partial-pre-agg grouped sum as the tumbling case. window_start is
    exported as BIGINT epoch-microseconds so both engines compare
    integers, not timestamp reconstructions."""
    HOP = 12 * 3600 * 1_000_000
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def windows(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // HOP) * HOP
        et = t.column("event_type")
        val = t.column("value")
        out = pa.table(
            {
                "event_type": pa.concat_arrays(
                    [et.combine_chunks(), et.combine_chunks()]
                ),
                "window_start_us": pa.array(
                    np.concatenate([base, base - HOP]), pa.int64()
                ),
                "value": pa.concat_arrays([val.combine_chunks(), val.combine_chunks()]),
            }
        )
        return out

    out = grouped_agg(
        ds.map_batches(windows, batch_format="pyarrow").map_batches(
            _to_cents_cols(["value"]), batch_format="pyarrow"
        ),
        ["event_type", "window_start_us"],
        [("", "count", "n"), ("value", "sum", "sum_value")],
    )
    return out.map_batches(_as_int64(["n", "sum_value"]), batch_format="pyarrow")


SQL_EVENT_WINDOWS_SLIDING = """
WITH w AS (
  SELECT event_type, value,
         unnest([(epoch_us(ts) // 43200000000) * 43200000000,
                 (epoch_us(ts) // 43200000000) * 43200000000 - 43200000000]) AS window_start_us
  FROM events)
SELECT event_type, window_start_us,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
FROM w GROUP BY event_type, window_start_us
"""


def q_embed_stats(sf_dir: str):
    """Feature-hashing document embeddings (model-free embedder): the
    oracle compares the exact integer projections norm_sq / nnz of the
    hashed ±1 bucket vector per document."""
    from ..functions.embed import embed_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return embed_stats(ds)


SQL_EMBED_STATS = r"""
WITH words AS (
  SELECT doc_id, unnest(CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+') END) AS w
  FROM documents),
hs AS (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 16))::UBIGINT % 64 AS bucket,
         CASE WHEN (('0x' || substr(md5(w), 1, 16))::UBIGINT >> 63) & 1 = 1
              THEN 1 ELSE -1 END AS sign
  FROM words),
vecs AS (
  SELECT doc_id, bucket, SUM(sign) AS v FROM hs GROUP BY doc_id, bucket),
stats AS (
  SELECT doc_id,
         SUM(v * v) AS norm_sq,
         SUM(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS nnz
  FROM vecs GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(s.norm_sq, 0) AS BIGINT) AS norm_sq,
       CAST(COALESCE(s.nnz, 0) AS BIGINT) AS nnz
FROM documents d LEFT JOIN stats s ON d.doc_id = s.doc_id
"""


def q_streaming_dedup(sf_dir: str):
    """Cross-dataset STREAMING exact dedup driven as three arrival
    waves over sharded seen-hash actors (functions/dedup.py::
    StreamingDeduper). WHICH duplicate survives depends on arrival
    order (inherent to streaming), but the surviving TEXT SET is exact
    and deterministic — so the query projects the surviving texts,
    giving the streaming path a value-checkable oracle
    (= SELECT DISTINCT text). Each wave is consumed eagerly in order
    to pin the cross-wave state sequence."""
    from ..functions.dedup import StreamingDeduper

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    dd = StreamingDeduper(num_actors=4)
    tabs = []
    try:
        for w in range(3):

            def in_wave(t: pa.Table, w=w) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                return t.filter(pa.array(ids % 3 == w))

            wave = docs.map_batches(in_wave, batch_format="pyarrow")
            tabs.append(
                pa.table(
                    {"text": dd.apply(wave).select_columns(["text"]).to_pandas()["text"]}
                )
            )
    finally:
        dd.shutdown()
    return pa.concat_tables(tabs)


SQL_STREAMING_DEDUP = "SELECT DISTINCT text FROM documents"


def q_resumable_sink(sf_dir: str):
    """Round trip through the resumable partitioned sink: documents
    partitioned by ``source`` (one dir + one _SUCCESS marker each),
    read back via read_resumable (markers gate visibility), counted per
    partition. Checks the write→marker→read contract end to end against
    a plain GROUP BY oracle."""
    import shutil as _shutil

    from ..functions.relational import grouped_agg
    from ..sources.sinks import read_resumable, resumable_write

    out_dir = os.path.join(
        "/tmp/graft_sink", os.path.basename(os.path.normpath(sf_dir))
    )
    _shutil.rmtree(out_dir, ignore_errors=True)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    resumable_write(ds, out_dir, partition_col="source")
    back = read_resumable(out_dir)  # hive partition col comes back str

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["source"] = batch["source"].astype(str)
        batch["n_docs"] = batch["n_docs"].astype("int64")
        return batch

    return grouped_agg(back, ["source"], [("", "count", "n_docs")]).map_batches(
        finish, batch_format="pandas"
    )


SQL_RESUMABLE_SINK = (
    "SELECT CAST(source AS VARCHAR) AS source, COUNT(*) AS n_docs "
    "FROM documents GROUP BY source"
)


def q_hash_sample(sf_dir: str):
    """Deterministic Bernoulli corpus subsample: keep iff
    md5_u64(str(doc_id)) < frac·2^64 — reproducible, engine-agnostic,
    shuffle-free (the training-data subsample staple)."""
    from ..functions.sampling import hash_sample

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return hash_sample(ds, frac=0.25, key_col="doc_id")


def _sql_hash_sample() -> str:
    from ..functions.sampling import sample_threshold

    thr = sample_threshold(0.25)
    return f"""
SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
      < {thr}::UBIGINT
"""


def q_stratified_split(sf_dir: str):
    """Exact stratified train/val split by source: within each stratum
    rank doc_ids by (md5 hash, id); first floor(0.2·n) are 'val'.
    Per-stratum proportions exact and deterministic."""
    from ..functions.sampling import stratified_split

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return stratified_split(ds, by="source", val_frac=0.2, key_col="doc_id")


SQL_STRATIFIED_SPLIT = r"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT,
                    doc_id) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT doc_id, source,
       CASE WHEN rk < CAST(FLOOR(0.2 * n) AS BIGINT) THEN 'val' ELSE 'train' END AS split
FROM r
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style within-document repetition filter signals
    (duplicate-word / top-word / duplicate-2-gram fractions) — pure
    per-batch kernel, no shuffle."""
    from ..functions.text import repetition_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats, batch_format="pandas")


SQL_DOC_REPETITION = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents),
words AS (SELECT doc_id, unnest(t) AS w FROM toks),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
agg AS (
  SELECT doc_id, count(*) AS nd, max(c) AS maxc FROM wc GROUP BY doc_id),
g AS (
  SELECT doc_id,
         [t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)] AS g2
  FROM toks)
SELECT toks.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST((len(t) - coalesce(nd, 0)) * 1000000
            // GREATEST(len(t), 1) AS BIGINT) AS dup_word_ratio,
       CAST(coalesce(maxc, 0) * 1000000
            // GREATEST(len(t), 1) AS BIGINT) AS top_word_ratio,
       CAST((len(g2) - len(list_distinct(g2))) * 1000000
            // GREATEST(len(g2), 1) AS BIGINT) AS dup_2gram_ratio
FROM toks
LEFT JOIN agg USING (doc_id)
JOIN g USING (doc_id)
"""


def q_ngram_topk(sf_dir: str):
    """Global top-20 word-2-grams by corpus count (corpus statistics /
    boilerplate discovery): per-batch partial counts → one partial
    pre-agg groupby on the gram → per-block top-20 prune → tiny final
    sort over ≤ 20·blocks rows. The full gram vocabulary never sits in
    one place."""
    from ..functions.hashing import split_flat
    from ..functions.relational import grouped_agg

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens = split_flat(batch["text"])
        if len(flat) < 2:
            return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        doc_of = np.repeat(np.arange(len(lens)), lens)
        same = doc_of[1:] == doc_of[:-1]
        g = (pd.Series(flat[:-1], dtype=object) + " " + pd.Series(flat[1:], dtype=object))[same]
        vc = g.value_counts()
        return pd.DataFrame({"gram": vc.index.to_numpy(dtype=object),
                             "c": vc.to_numpy(dtype=np.int64)})

    counts = grouped_agg(
        ds.map_batches(partial_counts, batch_format="pandas"),
        ["gram"],
        [("c", "sum", "c")],
    )

    def block_prune(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["c", "gram"], ascending=[False, True]).head(20)

    return counts.map_batches(block_prune, batch_format="pandas").sort(
        ["c", "gram"], descending=[True, False]
    ).limit(20)


SQL_NGRAM_TOPK = r"""
WITH toks AS (
  SELECT CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents),
g AS (
  SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)]) AS gram
  FROM toks)
SELECT gram, count(*)::BIGINT AS c
FROM g GROUP BY gram
ORDER BY c DESC, gram LIMIT 20
"""


def q_chunk_docs(sf_dir: str):
    """Fixed-token training chunks with overlap (context-window prep):
    stride 24 = 32 − 8, batch-local flat_map, no shuffle."""
    from ..functions.pack import chunk_docs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_docs(ds, max_tokens=32, overlap=8)


SQL_CHUNK_DOCS = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents)
SELECT doc_id,
       i AS chunk_idx,
       array_to_string(t[i*24+1 : LEAST(i*24+32, len(t))], ' ') AS chunk_text,
       CAST(LEAST(i*24+32, len(t)) - i*24 AS BIGINT) AS n_chunk_tokens
FROM toks,
     UNNEST(generate_series(0, CASE WHEN len(t) = 0 THEN -1
                                    ELSE (len(t)-1)//24 END)) AS u(i)
"""


def q_tfidf_top_term(sf_dir: str):
    """Per-doc most-characteristic term by integer TF·IDF (two-pass:
    df groupby + broadcast, then batch-local scoring/argmax)."""
    from ..functions.text import tfidf_top_term

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_top_term(ds)


SQL_TFIDF_TOP_TERM = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents),
words AS (SELECT doc_id, unnest(t) AS w FROM toks),
tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf FROM words GROUP BY doc_id, w),
df AS (SELECT w, count(DISTINCT doc_id)::BIGINT AS df FROM words GROUP BY w),
scored AS (
  SELECT doc_id, w,
         tf * (((SELECT count(*) FROM documents) * 1000000) // df) AS score
  FROM tf JOIN df USING (w)),
top AS (
  SELECT doc_id, w, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w ASC) AS rn
  FROM scored)
SELECT d.doc_id,
       coalesce(t.w, '') AS top_term,
       CAST(coalesce(t.score, 0) AS BIGINT) AS tfidf_score
FROM documents d
LEFT JOIN top t ON d.doc_id = t.doc_id AND t.rn = 1
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: eval split = doc_id % 50 == 0; flag
    train docs sharing any word 5-gram with the eval corpus (distinct
    eval-gram hashes broadcast once; the train side streams)."""
    from ..functions.dedup import decontaminate

    def split(pred):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy()
            return b.filter(pa.array(pred(ids)))

        return fn

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    train = docs.map_batches(split(lambda i: i % 50 != 0), batch_format="pyarrow")
    ev = docs.map_batches(split(lambda i: i % 50 == 0), batch_format="pyarrow")
    return decontaminate(train, ev, n=5)


SQL_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents),
grams AS (
  SELECT doc_id,
    CASE WHEN len(t) = 0 THEN []::VARCHAR[]
         WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
         ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                             || t[i+3] || ' ' || t[i+4]
                             FOR i IN generate_series(1, len(t)-4)])
    END AS g
  FROM toks),
ev AS (
  SELECT list_distinct(flatten(list(g))) AS eg FROM grams WHERE doc_id % 50 = 0)
SELECT doc_id,
       CAST(len(list_intersect(g, eg)) AS BIGINT) AS n_overlap,
       CAST(len(list_intersect(g, eg)) > 0 AS BIGINT) AS contaminated
FROM grams, ev
WHERE doc_id % 50 <> 0
"""


def q_seq_pack(sf_dir: str):
    """Concat-then-chunk sequence packing: assign every document to the
    fixed 2048-token training-sequence bin its first token falls in,
    via a DISTRIBUTED ordered prefix sum (range-partitioned three-phase
    scan — no global sort, no driver materialization; see
    functions/pack.py)."""
    from ..functions.pack import seq_pack

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return seq_pack(ds, budget=2048, num_ranges=16)


SQL_SEQ_PACK = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS pre_tokens
  FROM t)
SELECT doc_id, n_tokens, pre_tokens, pre_tokens // 2048 AS bin FROM s
"""


def q_seq_pack_by_source(sf_dir: str):
    """Per-domain sequence packing: exclusive running token count
    WITHIN each source, floor-divided by the budget — the shard layout
    that keeps mixture domains separable. Oracle = the partitioned
    window sum."""
    from ..functions.pack import seq_pack_per_key

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
    withsrc = ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "source": b.column("source"),
                "n_tokens": pa.array(
                    pd.Series(b.column("text").to_pandas()).fillna("").str.split().str.len().astype("int64")
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = seq_pack_per_key(withsrc, "source", "doc_id", "n_tokens", budget=2000)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": batch["source"],
                "doc_id": batch["doc_id"].astype("int64"),
                "bin": batch["bin"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_SEQ_PACK_BY_SOURCE = r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS BIGINT)
           * CASE WHEN trim(coalesce(text,'')) = '' THEN 0 ELSE 1 END AS n_tokens
  FROM documents)
SELECT source, doc_id,
       CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens)
            // 2000 AS BIGINT) AS bin
FROM t
"""


def q_shuffle_rank(sf_dir: str):
    """Deterministic global shuffle position (training order): rank of
    each doc under the md5 hash of its id — a reproducible full-corpus
    permutation computed as a distributed prefix COUNT, no global
    payload sort, no RNG."""
    from ..functions.pack import shuffle_rank

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return shuffle_rank(ds, key_col="doc_id", num_ranges=16)


SQL_SHUFFLE_RANK = r"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
       ) - 1 AS pos
FROM documents
"""


def q_cap_per_source(sf_dir: str):
    """Per-source document cap (anti-over-representation): keep the 10
    hash-smallest docs of each source — deterministic, nested in the
    cap, partial-pre-aggregated (shuffle carries ≤ cap rows per
    (source, batch))."""
    from ..functions.sampling import cap_per_key

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return cap_per_key(ds, by="source", cap=10, key_col="doc_id")


SQL_CAP_PER_SOURCE = r"""
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT AS hh
  FROM documents)
SELECT doc_id, source FROM h
QUALIFY row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) <= 10
"""


_MIXTURE_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
_MIXTURE_DEFAULT = 0.25


def q_mixture_sample(sf_dir: str):
    """Weighted source mixture: keep src0 fully, src1 at 0.5, drop
    src2, everything else at 0.25 — deterministic per-key Bernoulli,
    shuffle-free, composable with hash_sample (shared key hash)."""
    from ..functions.sampling import mixture_sample

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return mixture_sample(
        ds, _MIXTURE_WEIGHTS, by="source", key_col="doc_id",
        default=_MIXTURE_DEFAULT,
    )


def _sql_mixture_sample() -> str:
    from ..functions.sampling import sample_threshold

    cases = " ".join(
        f"WHEN '{s}' THEN {sample_threshold(w)}::UBIGINT"
        for s, w in _MIXTURE_WEIGHTS.items()
    )
    dflt = sample_threshold(_MIXTURE_DEFAULT)
    return f"""
SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
      < (CASE source {cases} ELSE {dflt}::UBIGINT END)
"""


def q_clean_text(sf_dir: str):
    """Corpus normalization + PII-style redaction: email/phone/IP/
    card-number redaction, ASCII case-fold, whitespace collapse —
    pure Arrow RE2 kernels, zero Python per row."""
    from ..functions.text import clean_text

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(clean_text, batch_format="pyarrow")


def _sql_clean_text() -> str:
    from ..functions.text import ASCII_LOWER, ASCII_UPPER, REDACT_PATTERNS

    chain = "text"
    for pat, repl in REDACT_PATTERNS:
        chain = f"regexp_replace({chain}, '{pat}', '{repl}', 'g')"
    counts = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for pat, _ in REDACT_PATTERNS
    )
    return f"""
SELECT doc_id,
       trim(regexp_replace(
           translate({chain}, '{ASCII_UPPER}', '{ASCII_LOWER}'),
           '\\s+', ' ', 'g')) AS clean,
       CAST({counts} AS BIGINT) AS n_redactions
FROM documents
"""


def q_user_event_sequences(sf_dir: str):
    """Ordered per-user event-type sequence (behavior-sequence export
    for training): one bucketed exchange on user_id, in-bucket sort by
    (ts, event_id), vectorized per-user join — the `string_agg(...
    ORDER BY ...)` shape without a global sort."""
    from ..functions.relational import bucketed_group_map

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        s = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        agg = s.groupby("user_id", sort=False)["event_type"].agg(",".join)
        n = s.groupby("user_id", sort=False)["event_id"].size()
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(),
                "seq": agg.to_numpy(),
                "n_events": n.to_numpy().astype(np.int64),
            }
        )

    return bucketed_group_map(ds, ["user_id"], per_bucket, num_buckets=16)


SQL_USER_EVENT_SEQUENCES = r"""
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
"""


def q_export_shards(sf_dir: str):
    """Final training-shard export end to end: md5-rank shuffle →
    shard = pos % 16 → resumable partitioned write → read BACK the
    marked shards from disk and count per shard. The oracle derives
    shard membership from the same md5 rank in SQL, so the on-disk
    layout itself is verified."""
    import shutil as _shutil

    from ..functions.relational import grouped_agg
    from ..sources.sinks import export_shards, read_resumable

    out_dir = os.path.join(
        "/tmp/graft_shards", os.path.basename(os.path.normpath(sf_dir))
    )
    _shutil.rmtree(out_dir, ignore_errors=True)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    export_shards(ds, out_dir, n_shards=16)
    back = read_resumable(out_dir)  # hive partition col comes back str

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "shard": batch["shard"].astype("int64"),
                "n_docs": batch["n_docs"].astype("int64"),
                "chars": batch["chars"].astype("int64"),
            }
        )

    stats = back.map_batches(
        lambda b: pd.DataFrame(
            {"shard": b["shard"], "_len": b["text"].fillna("").str.len().astype("int64")}
        ),
        batch_format="pandas",
    )
    return grouped_agg(
        stats, ["shard"], [("", "count", "n_docs"), ("_len", "sum", "chars")]
    ).map_batches(finish, batch_format="pandas")


SQL_EXPORT_SHARDS = """
WITH ranked AS (
  SELECT doc_id, text,
         row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
         ) - 1 AS pos
  FROM documents)
SELECT pos % 16 AS shard,
       count(*)::BIGINT AS n_docs,
       sum(length(coalesce(text, '')))::BIGINT AS chars
FROM ranked GROUP BY shard
"""


def q_props_stats(sf_dir: str):
    """Semi-structured decode: extract the integer `k` field from the
    JSON `props` column (vectorized Arrow RE2, no per-row json.loads),
    then per-event-type count/sum/min/max. Oracle parses with DuckDB's
    NATIVE json_extract — the engines cross-check each other's parse."""
    from ..functions.relational import grouped_agg
    from ..functions.text import json_int_field

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])
    ext = ds.map_batches(json_int_field, batch_format="pyarrow").drop_columns(["props"])
    return grouped_agg(
        ext,
        ["event_type"],
        [
            ("", "count", "n"),
            ("v", "sum", "sum_k"),
            ("v", "min", "min_k"),
            ("v", "max", "max_k"),
        ],
    )


SQL_PROPS_STATS = """
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type
"""


def q_heavy_hitters(sf_dir: str):
    """Corpus tokens occurring in ≥3.3% of the token stream — exact,
    via the bounded-memory two-pass Misra-Gries shape (per-batch ≤k-row
    summaries → guaranteed-superset candidates → broadcast recount).
    No full-vocabulary structure anywhere."""
    from ..functions.hashing import split_flat
    from ..functions.relational import heavy_hitters

    ds = read_table(sf_dir, "documents", columns=["text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        flat, _ = split_flat(batch["text"])
        return pd.DataFrame({"w": flat})

    words = ds.map_batches(explode, batch_format="pandas")
    return heavy_hitters(words, "w", threshold_micro=33_000)


SQL_HEAVY_HITTERS = r"""
WITH toks AS (
  SELECT CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents),
words AS (SELECT unnest(t) AS w FROM toks),
tot AS (SELECT count(*) AS n FROM words)
SELECT w, count(*)::BIGINT AS c
FROM words, tot GROUP BY w, n
HAVING count(*) * 1000000 >= 33000 * n
"""


def q_retention_cohorts(sf_dir: str):
    """Cohort retention triangle: users grouped by first-activity day
    (epoch days — integer arithmetic, no date-dtype skew between
    engines), counted per (cohort_day, day_offset) of later activity.
    Shape: narrow (user, day) projection → distinct via partial
    pre-agg → cohort via grouped min → partitioned hash join → final
    grouped count; every shuffle carries pre-aggregated narrow rows."""
    from ..functions.relational import grouped_agg, hash_join

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def days(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pa.array(ts // 86_400_000_000, pa.int64()),
            }
        )

    ud = ds.map_batches(days, batch_format="pyarrow")
    dedup = grouped_agg(ud, ["user_id", "day"], [("", "count", "_c")]).drop_columns(["_c"])
    cohort = grouped_agg(ud, ["user_id"], [("day", "min", "cohort_day")])
    j = hash_join(dedup, cohort, on="user_id")

    def offs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cohort_day": batch["cohort_day"].astype("int64"),
                "day_offset": (batch["day"] - batch["cohort_day"]).astype("int64"),
            }
        )

    per = j.map_batches(offs, batch_format="pandas")
    return grouped_agg(per, ["cohort_day", "day_offset"], [("", "count", "users")])


SQL_RETENTION_COHORTS = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
SELECT cohort_day, day - cohort_day AS day_offset, count(*)::BIGINT AS users
FROM ud JOIN cohort USING (user_id)
GROUP BY cohort_day, day_offset
"""


def q_event_funnel(sf_dir: str):
    """Sequential view → click → purchase funnel per user (strictly
    increasing timestamps): one bucketed exchange on user_id, per-bucket
    vectorized groupby-min passes, O(buckets·stages) partial rows."""
    from ..functions.relational import funnel_counts

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return funnel_counts(ds, ["view", "click", "purchase"])


SQL_EVENT_FUNNEL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT 1::BIGINT AS stage, count(*)::BIGINT AS users FROM v
UNION ALL SELECT 2, count(*) FROM c
UNION ALL SELECT 3, count(*) FROM p
"""


def q_event_ntile(sf_dir: str):
    """NTILE(4) of each user's events by event_id — the quartile-bucket
    window staple with exact boundary semantics. Oracle = native NTILE
    over a unique ordering column (ties would be nondeterministic)."""
    from ..functions.relational import ntile_per_key

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id"])
    out = ntile_per_key(ds, "user_id", "event_id", n=4)

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "tile": batch["tile"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_EVENT_NTILE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS tile
FROM events
"""


def q_event_gaps(sf_dir: str):
    """Inter-event gap per user: micros since the user's previous event
    (LAG window) — the dwell/latency primitive. Integer-exact: both
    engines subtract epoch-microsecond timestamps."""
    from ..functions.relational import lag_per_key

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    out = lag_per_key(ds, "user_id", "event_id", "ts", out_col="prev_ts")

    def gap(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].astype("datetime64[us]").astype("int64")
        prev = batch["prev_ts"].astype("datetime64[us]").astype("int64")
        d = ts - prev
        d[batch["prev_ts"].isna()] = pd.NA
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                # float64 with NaN for first events — matching the
                # oracle's pandas null representation; the values are
                # exact (micros < 2^53)
                "gap_micros": d.astype("float64"),
            }
        )

    return out.map_batches(gap, batch_format="pandas")


SQL_EVENT_GAPS = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (
            PARTITION BY user_id ORDER BY event_id)) AS BIGINT) AS gap_micros
FROM events
"""


def q_rolling_user_value(sf_dir: str):
    """Per-user rolling 5-event value sum (cents) ordered by (ts,
    event_id) — the ROWS-window function as one bucketed exchange +
    vectorized grouped rolling."""
    from ..functions.relational import rolling_per_key

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")
    out = rolling_per_key(
        ds, ["user_id"], ["ts", "event_id"], "value", window=5,
        out_col="roll_cents",
    )
    return out.select_columns(["user_id", "event_id", "roll_cents"])


SQL_ROLLING_USER_VALUE = r"""
WITH t AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events)
SELECT user_id, event_id,
       CAST(SUM(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents
FROM t
"""


def q_price_quantiles(sf_dir: str):
    """EXACT global quantiles of line-item price (integer cents) via
    the distributed-selection scan: corpus collapses to distinct-value
    counts (partial pre-agg), the ordered prefix sum ranks them, each
    quantile picks the value covering its target rank — no sketch
    error, no single-node sort, O(distinct) data movement."""
    from ..functions.pack import exact_quantiles

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    ds = ds.map_batches(_to_cents_cols(["l_extendedprice"]), batch_format="pyarrow")
    return exact_quantiles(
        ds, "l_extendedprice", [0.25, 0.5, 0.75, 0.875], num_ranges=16
    )


SQL_PRICE_QUANTILES = r"""
WITH t AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem)
SELECT q, value FROM (
  SELECT 0.25::DOUBLE AS q, quantile_disc(v, 0.25) AS value FROM t
  UNION ALL SELECT 0.5::DOUBLE, quantile_disc(v, 0.5) FROM t
  UNION ALL SELECT 0.75::DOUBLE, quantile_disc(v, 0.75) FROM t
  UNION ALL SELECT 0.875::DOUBLE, quantile_disc(v, 0.875) FROM t)
ORDER BY q
"""


def q_lang_source_stats(sf_dir: str):
    """Text stats grouped by document METADATA (lang × source): doc
    counts + exact integer token sums/means — the text kernels composed
    with the relational layer over the catalog columns."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(pc.fill_null(t.column("text"), ""))
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        n = pc.list_value_length(toks).cast(pa.int64())
        empty = pc.equal(trimmed, "")
        n = pc.if_else(empty, pa.scalar(0, pa.int64()), n)
        return pa.table(
            {"lang": t.column("lang"), "source": t.column("source"), "n_tokens": n}
        )

    out = grouped_agg(
        ds.map_batches(tokens, batch_format="pyarrow"),
        ["lang", "source"],
        [("", "count", "n_docs"), ("n_tokens", "sum", "sum_tokens")],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = _as_int64(["n_docs", "sum_tokens"])(t)
        return _avg_micro(t, "avg_tokens_micro", "sum_tokens", "n_docs")

    return out.map_batches(finish, batch_format="pyarrow")


SQL_LANG_SOURCE_STATS = r"""
WITH t AS (
  SELECT lang, source,
         CASE WHEN trim(coalesce(text,'')) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_tokens) AS BIGINT) * 10000 // COUNT(*) AS avg_tokens_micro
FROM t GROUP BY lang, source
"""


def q_corpus_freq(sf_dir: str):
    """Two-pass global-statistic scoring (corpus token frequency)."""
    from ..functions.text import corpus_freq_score

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return corpus_freq_score(ds)


def q_corpus_freq_join(sf_dir: str):
    """The no-resident-vocabulary scale path: token frequencies join the
    (doc_id, token) rows instead of broadcasting a driver dict. Same
    oracle as corpus_freq — the two modes are value-identical."""
    from ..functions.text import corpus_freq_score

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return corpus_freq_score(ds, vocab="join")


SQL_CORPUS_FREQ = r"""
WITH words AS (
  SELECT doc_id, unnest(CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+') END) AS w
  FROM documents),
cnt AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
per_doc AS (
  SELECT words.doc_id, SUM(c) AS s, COUNT(*) AS n
  FROM words JOIN cnt USING (w) GROUP BY words.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.s * 1000000 // p.n, 0) AS BIGINT) AS freq_score
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def q_multimodal_features(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return multimodal_features(ds)


SQL_MULTIMODAL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


def q_multimodal_pipeline(sf_dir: str):
    """Full multimodal chain: payload → image-decode (actor pool, fake
    dims as a pure function of the bytes) → resize plan → frame-sample
    plan. The deterministic fake makes the whole chain oracle-checkable;
    a real codec swaps into ImageDecodeStub(mode='real')."""
    from ..functions.multimodal import multimodal_pipeline

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return multimodal_pipeline(ds)


def q_video_frames(sf_dir: str):
    """Frame-SAMPLING over video-like payloads: one output row per
    sampled frame (max 4, integer-strided across the track) with a
    per-frame content hash — VideoFrameSampler in its deterministic
    fake mode (byte-derived), so the whole exploded-row stage is
    oracle-checkable; mode='real' decodes actual MJPEG-in-MP4 pixels
    through the same actor signature (pytest-verified)."""
    from ..functions.multimodal import VideoFrameSampler, attach_payload

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(attach_payload, batch_format="pyarrow").map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"mode": "fake", "max_frames": 4},
        batch_format="pyarrow",
        concurrency=4,
        batch_size=512,
    )


SQL_VIDEO_FRAMES = """
WITH b AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         CASE WHEN octet_length(encode(text)) = 0 THEN 0
              ELSE ('0x' || substr(hex(encode(text)), 1, 2))::INT END AS first_byte
  FROM documents WHERE text IS NOT NULL),
f AS (
  SELECT doc_id, text, n, first_byte,
         1 + n // 16 AS n_frames,
         LEAST(4, 1 + n // 16) AS k
  FROM b),
idx AS (
  SELECT DISTINCT doc_id, text, n, first_byte, n_frames,
         (g.i * n_frames) // k AS frame_idx
  FROM f CROSS JOIN (SELECT unnest(range(0, 4)) AS i) g
  WHERE g.i < f.k)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(16 + (first_byte % 240) AS BIGINT) AS width,
       CAST(16 + (n % 240) AS BIGINT) AS height,
       md5(text || CAST(frame_idx AS VARCHAR)) AS frame_md5
FROM idx
"""


SQL_MULTIMODAL_PIPELINE = """
WITH b AS (
  SELECT doc_id,
         octet_length(encode(coalesce(text,''))) AS n,
         CASE WHEN octet_length(encode(coalesce(text,''))) = 0 THEN 0
              ELSE ('0x' || substr(hex(encode(text)), 1, 2))::INT END AS first_byte
  FROM documents),
dims AS (
  SELECT doc_id,
         16 + (first_byte % 240) AS width,
         16 + (n % 240) AS height,
         n
  FROM b),
resized AS (
  SELECT doc_id, width, height, n,
         CASE WHEN GREATEST(width, height) > 64
              THEN GREATEST(1, (width * 64) // GREATEST(width, height)) ELSE width END AS out_width,
         CASE WHEN GREATEST(width, height) > 64
              THEN GREATEST(1, (height * 64) // GREATEST(width, height)) ELSE height END AS out_height
  FROM dims)
SELECT doc_id,
       CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       CAST(out_width AS BIGINT) AS out_width, CAST(out_height AS BIGINT) AS out_height,
       CAST(1 + n // 16 AS BIGINT) AS n_frames,
       CAST(LEAST(4, 1 + n // 16) AS BIGINT) AS sampled_frames
FROM resized
"""


def q_knn_all(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return all_pairs_nn(ds)


SQL_KNN_ALL = """
WITH sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS c
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, nn_id) rn
  FROM sims)
SELECT vec_id, nn_id, CAST(FLOOR(c * 1000000 + 0.5) AS BIGINT) AS cosine
FROM ranked WHERE rn = 1
"""


def q_cosine_topk(sf_dir: str):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(
        emb.filter(pc.equal(emb.column("vec_id"), 0)).column("embedding")[0].as_py(),
        dtype=np.float64,
    )
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, qvec, k=5, exclude=0)


SQL_COSINE_TOPK = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id = 0)
SELECT b.vec_id AS vec_id,
       CAST(FLOOR(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), (SELECT e FROM q)) * 1000000 + 0.5) AS BIGINT) AS cosine
FROM embeddings b WHERE b.vec_id <> 0
ORDER BY list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), (SELECT e FROM q)) DESC, b.vec_id
LIMIT 5
"""


# --- text-analysis oracles (engine-agnostic hash kernels, see
# functions/hashing.py: md5-prefix word hash + Horner mod 2^64 are
# computed identically by numpy and by DuckDB SQL) ---------------------------

_WRAP = (
    "(CASE WHEN {e} >= 9223372036854775808::HUGEINT "
    "THEN {e} - 18446744073709551616::HUGEINT ELSE {e} END)::BIGINT"
)
_HORNER = "(a, x) -> (a * 1099511628211::HUGEINT + x) % 18446744073709551616::HUGEINT"


def _sql_simhash_ctes() -> str:
    """Shared CTE chain computing every document's 64-bit simhash."""
    sig = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << j}::HUGEINT ELSE 0::HUGEINT END)"
        for j in range(64)
    )
    return f"""
WITH words AS (
  SELECT doc_id, unnest(CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
  FROM documents),
hs AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM words),
votes AS (SELECT doc_id, {sig} AS sig FROM hs GROUP BY doc_id),
sigs AS (
  SELECT d.doc_id, COALESCE({_WRAP.format(e='v.sig')}, 0) AS simhash
  FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id)"""


def _sql_simhash() -> str:
    return _sql_simhash_ctes() + "\nSELECT doc_id, simhash FROM sigs\n"


def _sql_simhash_pairs(max_hamming: int = 7) -> str:
    return (
        _sql_simhash_ctes()
        + f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""
    )


def _sql_fingerprint() -> str:
    return f"""
WITH base AS (SELECT doc_id, coalesce(text,'') AS t FROM documents),
cp AS (
  SELECT doc_id,
    CASE WHEN t = '' THEN 0::HUGEINT
         ELSE list_reduce([unicode(c)::HUGEINT for c in string_split(t, '')], {_HORNER})
    END AS fp,
    CASE WHEN trim(t) = '' THEN []::HUGEINT[]
         ELSE [('0x' || substr(md5(w), 1, 16))::UBIGINT::HUGEINT
               for w in regexp_split_to_array(trim(t), '\\s+')]
    END AS hs
  FROM base),
win AS (
  SELECT doc_id, fp,
    CASE WHEN len(hs) = 0 THEN 0::HUGEINT
         ELSE list_min([list_reduce(hs[k : k + LEAST(8, len(hs)) - 1], {_HORNER})
                        for k in generate_series(1, len(hs) - LEAST(8, len(hs)) + 1)])
    END AS mw
  FROM cp)
SELECT doc_id, {_WRAP.format(e='fp')} AS fingerprint,
       {_WRAP.format(e='mw')} AS min_window_hash
FROM win
"""


def _sql_lang_id() -> str:
    from ..functions.text import _LANG_MARKERS

    def cnt(m: str) -> str:
        e = m.replace("'", "''")
        return f"((length(s) - length(replace(s, '{e}', ''))) // {len(m)})"

    langs = list(_LANG_MARKERS)
    score_cols = ",\n  ".join(
        " + ".join(cnt(m) for m in ms) + f" AS sc_{lang}"
        for lang, ms in _LANG_MARKERS.items()
    )
    # argmax with ties broken by marker-table order (numpy argmax = first max)
    case = "CASE WHEN greatest(" + ", ".join(f"sc_{l}" for l in langs) + ") = 0 THEN 'und'\n"
    for i, l in enumerate(langs):
        conds = " AND ".join(f"sc_{l} >= sc_{m}" for m in langs[i + 1 :])
        if conds:
            case += f" WHEN {conds} THEN '{l}'\n"
        else:
            case += f" ELSE '{l}' END"
    return f"""
WITH padded AS (SELECT doc_id, ' ' || lower(coalesce(text,'')) || ' ' AS s FROM documents),
scores AS (SELECT doc_id, {score_cols} FROM padded)
SELECT doc_id, {case} AS lang_pred FROM scores
"""


def q_lang_id(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return lang_id(ds).select_columns(["doc_id", "lang_pred"])


def q_fingerprint(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint, batch_format="pyarrow")


def q_minhash_pairs(sf_dir: str):
    """MinHash LSH candidates + distributed exact-Jaccard verification
    (the full near-dup pipeline). Oracle = exact all-pairs word-3-gram
    Jaccard ≥ 0.8 in SQL; equality additionally proves LSH recall=1.0
    on this corpus (its true pairs all sit at Jaccard ≥ 0.9)."""
    from ..functions.dedup import minhash_near_dups

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_dups(ds, threshold_micro=800_000)


SQL_MINHASH_PAIRS = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents),
grams AS (
  SELECT doc_id,
    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                             for i in generate_series(1, len(t)-2)])
    END AS g
  FROM toks),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.g, b.g)) AS inter,
         len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS uni
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST((inter * 2000000 + uni) // (2 * uni) AS BIGINT) AS jaccard
FROM pairs
WHERE (inter * 2000000 + uni) // (2 * uni) >= 800000
"""


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard similarity self-join via PREFIX FILTERING
    (no LSH): candidates = docs sharing a shingle within each side's
    (s - ceil(t*s) + 1)-prefix under the df-ascending global shingle
    order (guaranteed recall by the prefix-filtering principle), then
    the same distributed exact-Jaccard verify as minhash_pairs. Oracle
    = exact all-pairs word-3-gram Jaccard >= 0.8 — equality here is
    GUARANTEED (modulo 64-bit shingle-hash collisions), unlike the
    probabilistic-recall LSH path."""
    from ..functions.dedup import ngram_jaccard_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold_micro=800_000, order="df")


def q_dedup_clusters(sf_dir: str):
    """Full dedup pipeline tail: near-dup PAIRS → duplicate CLUSTERS
    (distributed connected components, hash-to-min label propagation
    with pointer jumping) → canonical = min doc_id per cluster."""
    from ..functions.dedup import minhash_near_dups
    from ..functions.graph import connected_components

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_near_dups(ds, threshold_micro=800_000)
    cc = connected_components(pairs)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["node"].astype("int64"),
                "canonical_id": b["comp"].astype("int64"),
            }
        )

    return cc.map_batches(finish, batch_format="pandas")


def _sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE p AS ({SQL_MINHASH_PAIRS}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach AS (
  SELECT n, n AS m FROM nodes
  UNION
  SELECT r.n, e.b AS m FROM reach r JOIN edges e ON r.m = e.a)
SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS canonical_id
FROM reach GROUP BY n
"""


def q_dedup_corpus(sf_dir: str):
    """Dedup APPLIED: the corpus with non-canonical near-dup cluster
    members removed — pairs → connected components → drop-list anti
    join → streamed filter. The end-to-end 'give me the deduplicated
    training set' pipeline.

    The drop list (duplicate members only, a tiny fraction of the
    corpus) goes through ``anti_join_keys``: broadcast below its 5 M-key
    ceiling (one ray.put array, zero shuffle of the corpus), bloom-split
    exact anti join above it — see SURVEY §2.9 for the ceiling row."""
    from ..functions.dedup import minhash_near_dups
    from ..functions.graph import connected_components
    from ..functions.relational import anti_join_keys

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cc = connected_components(minhash_near_dups(ds, threshold_micro=800_000))

    def drop_list(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b.loc[b["node"] != b["comp"], "node"].astype("int64")}
        )

    drops = cc.map_batches(drop_list, batch_format="pandas")
    corpus = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return anti_join_keys(corpus, drops, "doc_id")


def _sql_dedup_corpus() -> str:
    return f"""
WITH clusters AS (SELECT * FROM ({_sql_dedup_clusters()}))
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM clusters WHERE doc_id <> canonical_id)
"""


def q_embed_dedup_clusters(sf_dir: str):
    """Semantic (embedding-cosine) dedup end-to-end: exact block-pair
    cosine-threshold pairs → distributed connected components →
    canonical = min vec_id per cluster. The semantic twin of
    `dedup_clusters` (which clusters lexical MinHash pairs)."""
    from ..functions.graph import connected_components

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = embedding_near_dups(ds, threshold=0.2)
    cc = connected_components(pairs, a_col="vec_a", b_col="vec_b")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "vec_id": b["node"].astype("int64"),
                "canonical_id": b["comp"].astype("int64"),
            }
        )

    return cc.map_batches(finish, batch_format="pandas")


def _sql_embed_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE p AS ({SQL_EMBEDDING_NEAR_DUPS}),
edges AS (SELECT vec_a AS a, vec_b AS b FROM p
          UNION ALL SELECT vec_b, vec_a FROM p),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach AS (
  SELECT n, n AS m FROM nodes
  UNION
  SELECT r.n, e.b AS m FROM reach r JOIN edges e ON r.m = e.a)
SELECT n AS vec_id, CAST(MIN(m) AS BIGINT) AS canonical_id
FROM reach GROUP BY n
"""


def q_simhash(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_signatures(ds)


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs with pigeonhole-exact banding (hamming<=7
    over 8 bands of 8 bits: guaranteed recall, verified in-bucket)."""
    from ..functions.dedup import simhash_near_dups

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=7, bands=8)


def q_embedding_near_dups(sf_dir: str):
    """Exact cosine-threshold pair join, block-pair partitioned (no
    full-matrix broadcast; see functions/similarity.py)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dups(ds, threshold=0.2)


SQL_EMBEDDING_NEAR_DUPS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.5)
            AS BIGINT) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.2
"""


def q_pagerank(sf_dir: str):
    """PageRank over the embedding near-dup graph (canonical-doc
    scoring for dedup clusters): exact block-pair cosine pairs as
    edges, 2 power iterations in exact integer micro-units — edge list
    stays a Dataset (per-batch bincount partials + combiner groupby per
    iteration), rank vector is the broadcast small side. Oracle = the
    same floor-division algebra as chained CTEs."""
    import pyarrow.parquet as _pq

    from ..functions.graph import pagerank
    from ..functions.similarity import blocked_near_dup_pairs

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = blocked_near_dup_pairs(emb, threshold=0.2)
    ids = _pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"]
    ).column("vec_id").to_numpy(zero_copy_only=False)
    return pagerank(pairs, ids, n_iter=2)


def _sql_pagerank(n_iter: int = 2) -> str:
    ctes = [
        """pairs AS (
  SELECT CAST(a.vec_id AS BIGINT) AS va, CAST(b.vec_id AS BIGINT) AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.2)""",
        "edges AS (SELECT va AS src, vb AS dst FROM pairs"
        " UNION ALL SELECT vb, va FROM pairs)",
        "nodes AS (SELECT CAST(vec_id AS BIGINT) AS v FROM embeddings)",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "r0 AS (SELECT v, CAST(1000000 // (SELECT count(*) FROM nodes)"
        " AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        ctes += [
            f"c{i} AS (SELECT e.dst AS v, SUM(r{i-1}.r // deg.d) AS s"
            f" FROM edges e JOIN r{i-1} ON r{i-1}.v = e.src"
            f" JOIN deg ON deg.src = e.src GROUP BY e.dst)",
            f"r{i} AS (SELECT n.v, CAST((150000 // (SELECT count(*) FROM nodes))"
            f" + (85 * COALESCE(c{i}.s, 0)) // 100 AS BIGINT) AS r"
            f" FROM nodes n LEFT JOIN c{i} ON c{i}.v = n.v)",
        ]
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT v AS vec_id, r AS rank_micro FROM r{n_iter}"
    )


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroid (k-means/IVF building block) in
    exact integer micro-units: quantize per element, integer-sum via a
    partial pre-agg scatter, floor-divide."""
    from ..functions.similarity import label_centroids

    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])
    return label_centroids(ds)


def q_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over every embedding: per-iteration
    map_batches partial (count, per-dim sum) reduced to new centroids on
    the driver, no shuffle; integer micro-unit arithmetic keeps numpy
    and the SQL oracle bit-identical (functions/cluster.py). Oracle =
    one chained CTE per iteration (assign → floor-div update), final
    assignment under the last centroids."""
    from ..functions.cluster import kmeans

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans(ds, k=8, n_iter=2)


def q_kmeans_purity(sf_dir: str):
    """Cluster-composition audit (mixture-balancing / dedup-bucket QA):
    k-means assignments crossed with the table's labels — (cluster,
    label, n). The assignment pass carries the label through, then one
    partial-pre-agg groupby; oracle = the same iteration CTEs joined
    back to the labels."""
    from ..functions.cluster import kmeans

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    asg = kmeans(ds, k=8, n_iter=2, keep_cols=["label"])
    out = grouped_agg(asg, ["cluster", "label"], [("vec_id", "count", "n")])

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster": batch.column("cluster").cast(pa.int64()),
                "label": batch.column("label").cast(pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


def _sql_kmeans(k: int = 8, n_iter: int = 2, purity: bool = False) -> str:
    dist = (
        "list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.v)"
        " + list_dot_product(c.v, c.v)"
    )
    ctes = [
        "e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,"
        " list_transform(CAST(embedding AS DOUBLE[]),"
        " x -> FLOOR(x * 1000000 + 0.5)) AS v FROM embeddings)",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v"
        f" FROM e ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(1, n_iter + 1):
        ctes += [
            f"a{i} AS (SELECT vec_id, v, cid FROM ("
            f"SELECT e.vec_id, e.v, c.cid, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn"
            f" FROM e, c{i-1} c) WHERE rn = 1)",
            f"u{i} AS (SELECT cid, CAST(generate_subscripts(v, 1) AS BIGINT)"
            f" AS dim, unnest(v) AS val FROM a{i})",
            f"s{i} AS (SELECT cid, dim, FLOOR(SUM(val) / COUNT(*)) AS nv"
            f" FROM u{i} GROUP BY cid, dim)",
            f"n{i} AS (SELECT cid, list(nv ORDER BY dim) AS v FROM s{i}"
            f" GROUP BY cid)",
            f"c{i} AS (SELECT p.cid, COALESCE(n.v, p.v) AS v"
            f" FROM c{i-1} p LEFT JOIN n{i} n USING (cid))",
        ]
    if purity:
        tail = f"""
SELECT cid AS cluster, CAST(emb.label AS BIGINT) AS label,
       count(*) AS n
FROM (
  SELECT e.vec_id, c.cid, row_number() OVER (
      PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn
  FROM e, c{n_iter} c) fin
JOIN embeddings emb ON fin.vec_id = emb.vec_id
WHERE rn = 1 GROUP BY 1, 2
"""
    else:
        tail = f"""
SELECT vec_id, cid AS cluster FROM (
  SELECT e.vec_id, c.cid, row_number() OVER (
      PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn
  FROM e, c{n_iter} c) WHERE rn = 1
"""
    return "WITH " + ",\n".join(ctes) + tail


SQL_LABEL_CENTROIDS = """
WITH x AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(FLOOR(unnest(CAST(embedding AS DOUBLE[])) * 1000000 + 0.5) AS BIGINT) AS v,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
  FROM embeddings)
SELECT label, dim,
       CAST(FLOOR(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS centroid_micro
FROM x GROUP BY label, dim
"""


def q_cosine_lsh_pairs(sf_dir: str):
    """Sub-quadratic ANN near-dups via random-hyperplane LSH (sign
    signatures → band buckets → in-bucket cosine verify). Oracle
    reproduces the exact same bucketing in SQL (plane literals inlined),
    so the pipeline is checked end to end; recall vs the exact
    block-pair join is the documented LSH tradeoff."""
    from ..functions.similarity import cosine_lsh_near_dups

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_lsh_near_dups(ds, threshold=0.2)


def _sql_cosine_lsh(sf_dir: str = "/root/testdata/sf0.01") -> str:
    import pyarrow.parquet as pq

    from ..functions.similarity import lsh_planes

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    dim = len(emb.column("embedding")[0])
    planes = lsh_planes(dim, 16, seed=99)

    def lit(v) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"

    terms = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {lit(p)}) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, ({terms})::BIGINT AS sig FROM embeddings),
bands AS (
  SELECT vec_id, t.b AS band_id, (sig >> (t.b * 4)) & 15 AS band_val
  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) t),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b,
       CAST(FLOOR(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                         CAST(eb.embedding AS DOUBLE[])) * 1000000 + 0.5) AS BIGINT) AS cosine
FROM cand
JOIN embeddings ea ON cand.vec_a = ea.vec_id
JOIN embeddings eb ON cand.vec_b = eb.vec_id
WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[])) >= 0.2
"""


_IVF_CELLS, _IVF_PROBE, _IVF_SEED = 16, 4, 7


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic centroids from the first-N sample, computed WITHOUT
    Ray (plain pyarrow) so the oracle SQL generator and the Ray query
    use byte-identical centroids."""
    import pyarrow.parquet as pq

    from ..functions.similarity import kmeans_lite

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    n = min(4096, 128 * _IVF_CELLS, emb.num_rows)
    sample = np.stack(
        [np.asarray(x, np.float64) for x in emb.column("embedding").slice(0, n).to_pylist()]
    )
    return kmeans_lite(sample, _IVF_CELLS, seed=_IVF_SEED)


def _ivf_query_vec(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return np.asarray(
        emb.filter(pc.equal(emb.column("vec_id"), 0)).column("embedding")[0].as_py(),
        dtype=np.float64,
    )


def q_ivf_topk(sf_dir: str):
    """Top-k through the PERSISTED cell-partitioned IVF index (built
    once per sf_dir, cached; the query reads ONLY the probed cells'
    files). Oracle = exact top-k over the SAME probed cells, with the
    centroids inlined into the SQL — it checks cell assignment,
    partition pruning and the in-cell top-k end to end."""
    from ..functions.similarity import IvfIndex

    qvec = _ivf_query_vec(sf_dir)
    cent = _ivf_centroids(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    index_dir = os.path.join(
        "/tmp/graft_ivf", os.path.basename(os.path.normpath(sf_dir))
    )
    if IvfIndex.is_complete(index_dir):
        idx = IvfIndex.open(index_dir)
    else:
        idx = IvfIndex.build(ds, index_dir, n_cells=_IVF_CELLS, centroids=cent)
    return idx.query(qvec, k=5, n_probe=_IVF_PROBE)


_IVF_BATCH_QIDS = (0, 1, 2)


def _ivf_query_vecs(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = []
    for qid in _IVF_BATCH_QIDS:
        out.append(
            np.asarray(
                emb.filter(pc.equal(emb.column("vec_id"), qid)).column("embedding")[0].as_py(),
                dtype=np.float64,
            )
        )
    return np.stack(out)


def q_ivf_topk_batch(sf_dir: str):
    """Multi-query IVF: queries grouped by probed cell, each touched
    cell scanned ONCE for all its queries (the large-query-set scale
    path). Oracle = per-query exact top-k over the same probed cells."""
    from ..functions.similarity import IvfIndex

    cent = _ivf_centroids(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    index_dir = os.path.join(
        "/tmp/graft_ivf", os.path.basename(os.path.normpath(sf_dir))
    )
    if IvfIndex.is_complete(index_dir):
        idx = IvfIndex.open(index_dir)
    else:
        idx = IvfIndex.build(ds, index_dir, n_cells=_IVF_CELLS, centroids=cent)
    out = idx.query_batch(_ivf_query_vecs(sf_dir), k=5, n_probe=_IVF_PROBE)
    out["qid"] = out["qid"].astype("int64")
    return out


def _sql_ivf_topk_batch(sf_dir: str = "/root/testdata/sf0.01") -> str:
    cent = _ivf_centroids(sf_dir)
    qs = _ivf_query_vecs(sf_dir)

    def lit(v: np.ndarray) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"

    scores = ", ".join(
        f"list_cosine_similarity(CAST(embedding AS DOUBLE[]), {lit(c)})" for c in cent
    )
    selects = []
    for qid, q in zip(_IVF_BATCH_QIDS, qs):
        qn = q / max(np.linalg.norm(q), 1e-12)
        probes = np.argsort(-(cent @ qn))[: _IVF_PROBE].tolist()
        probe_list = ", ".join(str(p) for p in probes)
        selects.append(
            f"""(
  SELECT {qid}::BIGINT AS qid, vec_id,
         CAST(FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]), {lit(q)}) * 1000000 + 0.5) AS BIGINT) AS cosine
  FROM cells WHERE cell IN ({probe_list})
  ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {lit(q)}) DESC, vec_id
  LIMIT 5)"""
        )
    return f"""
WITH assigned AS (
  SELECT vec_id, embedding, [{scores}] AS sc FROM embeddings),
cells AS (
  SELECT vec_id, embedding, list_position(sc, list_max(sc)) - 1 AS cell FROM assigned)
{" UNION ALL ".join(selects)}
"""


def _sql_ivf_topk(sf_dir: str = "/root/testdata/sf0.01") -> str:
    cent = _ivf_centroids(sf_dir)
    q = _ivf_query_vec(sf_dir)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(cent @ qn))[: _IVF_PROBE].tolist()

    def lit(v: np.ndarray) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"

    scores = ", ".join(
        f"list_cosine_similarity(CAST(embedding AS DOUBLE[]), {lit(c)})" for c in cent
    )
    probe_list = ", ".join(str(p) for p in probes)
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id = 0),
assigned AS (
  SELECT vec_id, embedding, [{scores}] AS sc FROM embeddings),
cells AS (
  SELECT vec_id, embedding, list_position(sc, list_max(sc)) - 1 AS cell FROM assigned)
SELECT vec_id,
       CAST(FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT e FROM q)) * 1000000 + 0.5) AS BIGINT) AS cosine
FROM cells
WHERE cell IN ({probe_list})
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT e FROM q)) DESC, vec_id
LIMIT 5
"""


def q_event_rank(sf_dir: str):
    """ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) — the
    per-key rank window via one bucketed exchange (rank_per_key also
    provides RANK/DENSE_RANK; those are tie-stable and pytest-covered)."""
    from ..functions.relational import rank_per_key

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id"])
    out = rank_per_key(ds, "user_id", "event_id", out_col="rn")

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "event_id": batch["event_id"].astype("int64"),
                "rn": batch["rn"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_EVENT_RANK = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS rn
FROM events
"""


def q_user_type_diversity(sf_dir: str):
    """COUNT(DISTINCT event_type) per user — the exact two-phase
    distinct count (per-batch distinct pairs → pair-keyed exchange →
    per-key partial counts → tiny sum)."""
    from ..functions.relational import count_distinct_per_key

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    out = count_distinct_per_key(ds, "user_id", "event_type", out_col="n_types")

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "n_types": batch["n_types"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_USER_TYPE_DIVERSITY = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
"""


def q_value_quantiles_by_type(sf_dir: str):
    """Exact per-event-type value quartiles (cents) — quantiles_per_key,
    the PARTITION BY form of the global exact_quantiles scan. Same
    discrete convention as DuckDB quantile_disc (index ceil(q·n)−1)."""
    from ..functions.relational import quantiles_per_key

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")
    out = quantiles_per_key(
        ds, "event_type", "value", [0.25, 0.5, 0.75], out_cols=["q25", "q50", "q75"]
    )

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"].astype(str),
                "q25": batch["q25"].astype("int64"),
                "q50": batch["q50"].astype("int64"),
                "q75": batch["q75"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_VALUE_QUANTILES_BY_TYPE = """
SELECT event_type,
       CAST(quantile_disc(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 0.50) AS BIGINT) AS q50,
       CAST(quantile_disc(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 0.75) AS BIGINT) AS q75
FROM events GROUP BY event_type
"""


def q_priority_sets(sf_dir: str):
    """GROUP BY GROUPING SETS((priority, status), (status), ()) — the
    generic OLAP form rollup/cube specialize; finest level aggregated
    once, each requested set derived from the materialized result."""
    from ..functions.relational import grouping_sets_agg

    ds = read_table(
        sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )
    ds = ds.map_batches(_to_cents_cols(["o_totalprice"]), batch_format="pyarrow")
    out = grouping_sets_agg(
        ds,
        ["o_orderpriority", "o_orderstatus"],
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        [("", "count", "n"), ("o_totalprice", "sum", "sum_cents")],
    )
    return out.map_batches(_as_int64(["n", "sum_cents"]), batch_format="pyarrow")


SQL_PRIORITY_SETS = """
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(GROUPING_ID(o_orderpriority, o_orderstatus) AS BIGINT) AS lvl
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
"""


def q_part_coverage(sf_dir: str):
    """FULL OUTER join of two partially-overlapping aggregates: small
    parts (p_size ≤ 10) against heavy lineitem demand (quantity ≥ 40)
    per part — unmatched rows survive from BOTH sides (the join type
    the engine had not yet exercised through its empty-block-hardened
    Dataset.join)."""
    from ..functions.relational import grouped_agg, hash_join

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_size"])
    parts = filter_batches(parts, lambda t: pc.less_equal(t.column("p_size"), 10))
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li = filter_batches(li, lambda t: pc.greater_equal(t.column("l_quantity"), 40))
    li = li.map_batches(_to_cents_cols(["l_extendedprice"]), batch_format="pyarrow")
    demand = grouped_agg(
        li, ["l_partkey"], [("", "count", "n_li"), ("l_extendedprice", "sum", "rev_cents")]
    )
    j = hash_join(
        parts, demand, on="p_partkey", right_on="l_partkey", join_type="full_outer"
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["p_partkey"]
        if "l_partkey" in batch.columns:
            key = key.fillna(batch["l_partkey"])
        return pd.DataFrame(
            {
                "partkey": key.astype("int64"),
                # nullable sides stay float64-with-NaN (the DuckDB→pandas
                # null representation; values exact below 2^53)
                "p_size": batch["p_size"].astype("float64"),
                "n_li": batch["n_li"].astype("float64"),
                "rev_cents": batch["rev_cents"].astype("float64"),
            }
        )

    return j.map_batches(finish, batch_format="pandas")


SQL_PART_COVERAGE = """
WITH p AS (SELECT p_partkey, p_size FROM part WHERE p_size <= 10),
d AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_li,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem WHERE l_quantity >= 40 GROUP BY l_partkey)
SELECT CAST(COALESCE(p.p_partkey, d.l_partkey) AS BIGINT) AS partkey,
       CAST(p.p_size AS DOUBLE) AS p_size,
       CAST(d.n_li AS DOUBLE) AS n_li,
       CAST(d.rev_cents AS DOUBLE) AS rev_cents
FROM p FULL OUTER JOIN d ON p.p_partkey = d.l_partkey
"""


def _priority_custkeys(sf_dir: str, priority: str):
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    return filter_batches(
        ds, lambda t: pc.equal(t.column("o_orderpriority"), priority)
    ).select_columns(["o_custkey"])


def q_urgent_only_customers(sf_dir: str):
    """SQL EXCEPT: customers with URGENT orders but no LOW orders — the
    distributed set-difference (per-batch distinct combiner, one tuple
    exchange, bucket-local membership)."""
    from ..functions.relational import except_distinct

    out = except_distinct(
        _priority_custkeys(sf_dir, "1-URGENT"),
        _priority_custkeys(sf_dir, "5-LOW"),
        ["o_custkey"],
    )

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_custkey": batch["o_custkey"].astype("int64")})

    return out.map_batches(cast, batch_format="pandas")


SQL_URGENT_ONLY = """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
"""


def q_urgent_and_low_customers(sf_dir: str):
    """SQL INTERSECT over the same split."""
    from ..functions.relational import intersect_distinct

    out = intersect_distinct(
        _priority_custkeys(sf_dir, "1-URGENT"),
        _priority_custkeys(sf_dir, "5-LOW"),
        ["o_custkey"],
    )

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_custkey": batch["o_custkey"].astype("int64")})

    return out.map_batches(cast, batch_format="pandas")


SQL_URGENT_AND_LOW = """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
"""


def q_embedding_unnest(sf_dir: str):
    """UNNEST WITH ORDINALITY over the embedding list column — the
    list→rows reshape (batch-local Arrow list_flatten, zero shuffle).
    Values are the parquet doubles untouched, so the hash compare is
    exact."""
    from ..functions.relational import explode_list

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = explode_list(ds, ["vec_id"], "embedding", value_name="val", pos_col="pos")

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype("int64"),
                "val": batch["val"].astype("float64"),
                "pos": batch["pos"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_EMBEDDING_UNNEST = """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(unnest(embedding) AS DOUBLE) AS val,
       CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos
FROM embeddings
"""


def q_value_ohlc_daily(sf_dir: str):
    """OHLC bars: per (event_type, day) the opening value (at the
    earliest (ts, event_id)), high, low, close (latest) and count.

    ONE events scan: each batch pre-combines to per-key OHLC partials
    (one row per key per batch — the partial carries the arg-min/arg-max
    ordering tuples so partials MERGE exactly), then a single
    ``bucketed_group_map`` folds partials per key with the merge itself
    as ``pre_reduce`` (same-schema idempotent ⇒ O(result) receiver
    memory). Replaces the r4 three-branch plan (grouped_agg +
    first_per_key + latest_per_key + two joins) that re-executed the
    upstream read three times."""
    from ..functions.relational import bucketed_group_map

    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "event_id", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": day,
                "ts": t.column("ts"),
                "event_id": t.column("event_id"),
                "value": t.column("value"),
            }
        )

    keyed = ds.map_batches(bucket, batch_format="pyarrow").map_batches(
        _to_cents_cols(["value"]), batch_format="pyarrow"
    )

    PART_COLS = [
        "event_type", "day", "open_ts", "open_eid", "open",
        "close_ts", "close_eid", "close", "low", "high", "n",
    ]

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner: one OHLC partial row per key in the batch
        b = b.sort_values(
            ["event_type", "day", "ts", "event_id"], kind="mergesort"
        )
        b["day"] = b["day"].astype("datetime64[us]")
        b["ts"] = b["ts"].astype("datetime64[us]").astype("int64")  # µs
        grp = b.groupby(["event_type", "day"], sort=False)
        first = grp[["ts", "event_id", "value"]].first()
        last = grp[["ts", "event_id", "value"]].last()
        out = pd.DataFrame(
            {
                "open_ts": first["ts"],
                "open_eid": first["event_id"].astype("int64"),
                "open": first["value"].astype("int64"),
                "close_ts": last["ts"],
                "close_eid": last["event_id"].astype("int64"),
                "close": last["value"].astype("int64"),
                "low": grp["value"].min().astype("int64"),
                "high": grp["value"].max().astype("int64"),
                "n": grp.size().astype("int64"),
            }
        ).reset_index()
        return out[PART_COLS]

    def merge_partials(g: pd.DataFrame) -> pd.DataFrame:
        # fold partials: open from the lexicographically-earliest
        # (open_ts, open_eid) partial, close from the latest, min/max/sum
        ga = g.sort_values(
            ["event_type", "day", "open_ts", "open_eid"], kind="mergesort"
        )
        grp_a = ga.groupby(["event_type", "day"], sort=False)
        opens = grp_a[["open_ts", "open_eid", "open"]].first()
        gd = g.sort_values(
            ["event_type", "day", "close_ts", "close_eid"], kind="mergesort"
        )
        closes = gd.groupby(["event_type", "day"], sort=False)[
            ["close_ts", "close_eid", "close"]
        ].last()
        rest = grp_a.agg(low=("low", "min"), high=("high", "max"), n=("n", "sum"))
        out = opens.join([closes, rest]).reset_index()
        return out[PART_COLS]

    bars = bucketed_group_map(
        keyed.map_batches(partials, batch_format="pandas"),
        ["event_type", "day"],
        merge_partials,
        num_buckets=16,
        pre_reduce=merge_partials,
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"].astype(str),
                "day": b["day"].astype("datetime64[us]"),
                "open": b["open"].astype("int64"),
                "high": b["high"].astype("int64"),
                "low": b["low"].astype("int64"),
                "close": b["close"].astype("int64"),
                "n": b["n"].astype("int64"),
            }
        )

    return bars.map_batches(cast, batch_format="pandas")


SQL_VALUE_OHLC = """
WITH c AS (
  SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM c)
SELECT event_type, day,
       CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open,
       CAST(MAX(cents) AS BIGINT) AS high,
       CAST(MIN(cents) AS BIGINT) AS low,
       CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r GROUP BY event_type, day
"""


def q_clustered_value_scan(sf_dir: str):
    """Zone-map data skipping: events re-clustered by value (cents) into
    range files once per sf (cached under /tmp), then a BETWEEN scan
    reads only the overlapping files (pytest asserts the pruning; the
    oracle checks exactness incl. the boundary residual filter)."""
    import os

    from ..functions.layout import cluster_read, cluster_write

    sfname = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/graft_cluster/{sfname}/events_value"
    if not os.path.exists(os.path.join(root, "_CLUSTER.json")):
        ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])
        ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")
        cluster_write(ds, root, "value", num_files=8)

    scan = cluster_read(root, lo=2000, hi=5000)
    out = grouped_agg(
        scan, ["user_id"], [("", "count", "n"), ("value", "sum", "sum_cents")]
    )
    return out.map_batches(_as_int64(["user_id", "n", "sum_cents"]), batch_format="pyarrow")


SQL_CLUSTERED_SCAN = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
WHERE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) BETWEEN 2000 AND 5000
GROUP BY user_id
"""


def q_value_hour_regression(sf_dir: str):
    """Per-event-type OLS of value (cents) on hour-of-day, in exact
    integer micro-units — distributed normal equations (five int64
    moment partials through one grouped aggregate, arbitrary-precision
    finalize). The stats-layer pattern: never float running aggregates
    across engines."""
    from ..functions.stats import linreg_per_key

    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "h": pc.hour(t.column("ts")).cast(pa.int64()),
                "c": pc.cast(
                    pc.floor(pc.add(pc.multiply(t.column("value"), 100.0), 0.5)),
                    pa.int64(),
                ),
            }
        )

    out = linreg_per_key(
        ds.map_batches(prep, batch_format="pyarrow"), "event_type", "h", "c"
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"].astype(str),
                "n": b["n"].astype("int64"),
                "slope_micro": b["slope_micro"].astype("int64"),
                "intercept_micro": b["intercept_micro"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_VALUE_HOUR_REGRESSION = """
WITH base AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(h) AS HUGEINT) AS sx, CAST(SUM(c) AS HUGEINT) AS sy,
         CAST(SUM(h * c) AS HUGEINT) AS sxy, CAST(SUM(h * h) AS HUGEINT) AS sxx
  FROM base GROUP BY event_type),
s AS (
  SELECT *, (n * sxy - sx * sy) * CAST(1000000 AS HUGEINT) AS num,
         (n * sxx - sx * sx) AS den
  FROM m),
sl AS (  -- floored division: DuckDB // truncates, so subtract the positive mod
  SELECT *, (num - ((num % den + den) % den)) // den AS slope FROM s),
fin AS (
  SELECT event_type, n, slope, (sy * CAST(1000000 AS HUGEINT) - slope * sx) AS num2
  FROM sl)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(slope AS BIGINT) AS slope_micro,
       CAST((num2 - ((num2 % n + n) % n)) // n AS BIGINT) AS intercept_micro
FROM fin
"""


def q_zorder_scan(sf_dir: str):
    """Z-ordered 2-D data skipping: lineitem clustered on (price cents,
    quantity) rank space, a 2-D BETWEEN box reads only zone-overlapping
    files, then aggregates by return flag."""
    import os

    from ..functions.layout import zorder_read, zorder_write

    sfname = os.path.basename(os.path.normpath(sf_dir))
    root = f"/tmp/graft_cluster/{sfname}/li_zorder"
    if not os.path.exists(os.path.join(root, "_CLUSTER.json")):
        ds = read_table(
            sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_quantity"]
        )

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_returnflag": t.column("l_returnflag"),
                    "price_cents": pc.cast(
                        pc.floor(
                            pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)
                        ),
                        pa.int64(),
                    ),
                    "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                }
            )

        zorder_write(
            ds.map_batches(prep, batch_format="pyarrow"),
            root,
            "price_cents",
            "qty",
            num_files=16,
        )

    scan = zorder_read(root, a_lo=1_000_000, a_hi=3_000_000, b_lo=10, b_hi=20)
    out = grouped_agg(
        scan,
        ["l_returnflag"],
        [("", "count", "n"), ("price_cents", "sum", "sum_cents")],
    )
    return out.map_batches(_as_int64(["n", "sum_cents"]), batch_format="pyarrow")


SQL_ZORDER_SCAN = """
WITH c AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem)
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(price_cents) AS BIGINT) AS sum_cents
FROM c
WHERE price_cents BETWEEN 1000000 AND 3000000 AND qty BETWEEN 10 AND 20
GROUP BY l_returnflag
"""


def q_event_value_pivot(sf_dir: str):
    """PIVOT with SUM: per-user value cents widened per event type
    before the shuffle (exact int64 masked scatter per batch) — the
    aggregate companion to the count PIVOT."""
    from ..functions.relational import pivot_sum

    types = ["click", "error", "purchase", "signup", "view"]
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])
    ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")
    out = pivot_sum(ds, "user_id", "event_type", types, "value")
    return out.map_batches(_as_int64(["user_id"] + types), batch_format="pyarrow")


SQL_EVENT_VALUE_PIVOT = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COALESCE(SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) FILTER (WHERE event_type='click'), 0) AS BIGINT) AS click,
       CAST(COALESCE(SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) FILTER (WHERE event_type='error'), 0) AS BIGINT) AS error,
       CAST(COALESCE(SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) FILTER (WHERE event_type='purchase'), 0) AS BIGINT) AS purchase,
       CAST(COALESCE(SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) FILTER (WHERE event_type='signup'), 0) AS BIGINT) AS signup,
       CAST(COALESCE(SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) FILTER (WHERE event_type='view'), 0) AS BIGINT) AS view
FROM events GROUP BY user_id
"""


def q_streaming_window(sf_dir: str):
    """The streaming tumbling-window aggregator replayed over the events
    table as an ordered stream (10 waves): with lateness covering the
    stream's disorder, the finalized+drained stream must equal the
    batch GROUP BY exactly — the streaming/batch unification contract."""
    import pyarrow.parquet as pq_

    from .window import StreamingWindowSession

    t = pq_.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    cents = pc.cast(
        pc.floor(pc.add(pc.multiply(t.column("value"), 100.0), 0.5)), pa.int64()
    )
    t = pa.table(
        {"event_type": t.column("event_type"), "ts": t.column("ts"), "v": cents}
    ).sort_by([("ts", "ascending")])

    day_us = 86_400_000_000
    sess = StreamingWindowSession(
        "event_type", "ts", "v", width_us=day_us, allowed_lateness_us=0, num_shards=4
    )
    outs = []
    n = t.num_rows
    step = max(1, n // 10)
    for lo in range(0, n, step):
        outs.append(sess.feed(t.slice(lo, step)))
    outs.append(sess.drain())
    assert sess.stats()["late_dropped"] == 0  # sorted feed: nothing late
    sess.shutdown()
    out = pa.concat_tables(outs)

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["key"].astype(str),
                "wstart": b["wstart"].astype("int64"),
                "n": b["n"].astype("int64"),
                "s": b["s"].astype("int64"),
            }
        )

    return cast(out.to_pandas())


SQL_STREAMING_WINDOW = """
SELECT event_type AS key,
       CAST((epoch_us(ts) // 86400000000) * 86400000000 AS BIGINT) AS wstart,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
FROM events GROUP BY 1, 2
"""


def q_rolling_hour_value(sf_dir: str):
    """RANGE-frame window: each event's sum of the same user's value
    cents over the trailing hour (ts-peers included, SQL RANGE
    semantics) — prefix sums + two searchsorted probes per key segment."""
    from ..functions.relational import rolling_range_per_key

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
    ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")
    out = rolling_range_per_key(
        ds, "user_id", "ts", "value", window_us=3_600_000_000, out_col="hour_cents"
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "event_id": b["event_id"].astype("int64"),
                "hour_cents": b["hour_cents"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_ROLLING_HOUR = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS hour_cents
FROM events
"""


def q_streaming_sessions(sf_dir: str):
    """Streaming gap-sessionization (30 min) replayed over the ordered
    events stream — finalized+drained sessions must equal the batch
    window-function sessionization exactly (one row per session with
    start/end/count)."""
    import pyarrow.parquet as pq_

    from .window import StreamingSessionizer

    t = pq_.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    t = pa.table(
        {"user_id": t.column("user_id").cast(pa.string()), "ts": t.column("ts")}
    ).sort_by([("ts", "ascending")])

    sess = StreamingSessionizer(
        "user_id", "ts", gap_us=30 * 60 * 1_000_000, allowed_lateness_us=0, num_shards=4
    )
    outs = []
    n = t.num_rows
    step = max(1, n // 10)
    for lo in range(0, n, step):
        outs.append(sess.feed(t.slice(lo, step)))
    outs.append(sess.drain())
    assert sess.stats()["late_dropped"] == 0
    sess.shutdown()
    out = pa.concat_tables(outs)

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["key"].astype("int64"),
                "session_start": b["session_start"].astype("int64"),
                "session_end": b["session_end"].astype("int64"),
                "n": b["n"].astype("int64"),
            }
        )

    return cast(out.to_pandas())


SQL_STREAMING_SESSIONS = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM d)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s GROUP BY user_id, sid
"""


def q_value_mode_by_type(sf_dir: str):
    """Exact MODE of value cents per event type (deterministic
    tie-break: highest count, then smallest value)."""
    from ..functions.relational import mode_per_key

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")
    out = mode_per_key(ds, "event_type", "value", out_col="mode_cents")

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"].astype(str),
                "mode_cents": b["mode_cents"].astype("int64"),
                "n": b["n"].astype("int64"),
            }
        )

    return out.map_batches(cast, batch_format="pandas")


SQL_VALUE_MODE = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
t AS (
  SELECT event_type, cents, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, cents) AS rn
  FROM c GROUP BY event_type, cents)
SELECT event_type, CAST(cents AS BIGINT) AS mode_cents, CAST(n AS BIGINT) AS n
FROM t WHERE rn = 1
"""


def q_event_cume_dist(sf_dir: str):
    """CUME_DIST of each event's value cents within its type — the
    fraction-of-peers-at-or-below window; one integer division in
    float64 keeps both engines bit-identical."""
    from ..functions.relational import rank_per_key

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])
    ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                # carry (value, event_id) as order key via a struct? —
                # no: cume_dist is defined on the VALUE ordering alone,
                # ties share the same cume, so value suffices
                "value": b["value"].astype("int64"),
                "event_id": b["event_id"].astype("int64"),
            }
        )

    out = rank_per_key(
        ds.map_batches(keyed, batch_format="pandas"),
        "event_type",
        "value",
        out_col="cume",
        method="cume_dist",
    )

    # rank_per_key returns (key, order) pairs; ties collapse to the same
    # (value, cume), so join back onto the event spine for per-event rows
    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"].astype(str),
                "value": b["value"].astype("int64"),
                "cume": b["cume"].astype("float64"),
            }
        ).drop_duplicates()

    return out.map_batches(cast, batch_format="pandas")


SQL_EVENT_CUME = """
SELECT DISTINCT event_type,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value,
       CUME_DIST() OVER (PARTITION BY event_type
                         ORDER BY CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cume
FROM events
"""


def q_event_percent_rank(sf_dir: str):
    """PERCENT_RANK of each event's value cents within its type —
    (rank−1)/(n−1), the normalized-rank window; ties collapse to one
    (value, pr) row like the CUME_DIST twin."""
    from ..functions.relational import rank_per_key

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    ds = ds.map_batches(_to_cents_cols(["value"]), batch_format="pyarrow")

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "value": b["value"].astype("int64"),
            }
        )

    out = rank_per_key(
        ds.map_batches(keyed, batch_format="pandas"),
        "event_type",
        "value",
        out_col="pr",
        method="percent_rank",
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"].astype(str),
                "value": b["value"].astype("int64"),
                "pr": b["pr"].astype("float64"),
            }
        ).drop_duplicates()

    return out.map_batches(cast, batch_format="pandas")


SQL_EVENT_PERCENT_RANK = """
SELECT DISTINCT event_type,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value,
       PERCENT_RANK() OVER (PARTITION BY event_type
                            ORDER BY CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS pr
FROM events
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): BUILDING-segment customers ⋈
    orders before a date ⋈ lineitems shipped after it → revenue per
    order → global top-10. Semi-filter the orders by the small customer
    key set (broadcast — customers are the dimension side), pre-combine
    lineitem revenue per order map-side, ONE partitioned join, top-k by
    (revenue, orderkey) with the local-combiner topk kernel."""
    import pyarrow.parquet as _pq

    from ..functions.relational import (
        grouped_agg,
        hash_join,
        local_combine,
        semi_join,
        topk_per_key,
    )

    CUT = pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = (
        cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING"))
        .column("c_custkey")
        .to_numpy(zero_copy_only=False)
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    orders = filter_batches(
        orders, lambda t: pc.less(t.column("o_orderdate"), CUT)
    )
    orders = semi_join(orders, keys, "o_custkey")

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    li = filter_batches(
        li, lambda t: pc.greater(t.column("l_shipdate"), CUT)
    )

    def rev(t: pa.Table) -> pa.Table:
        p = t.column("l_extendedprice").cast(pa.float64())
        d = t.column("l_discount").cast(pa.float64())
        r = pc.floor(
            pc.add(pc.multiply(pc.multiply(p, pc.subtract(pa.scalar(1.0), d)), 10000.0), 0.5)
        ).cast(pa.int64())
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    pre = local_combine(li, ["l_orderkey"], [("rev", "sum", "rev")])
    j = hash_join(pre, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    per_order = grouped_agg(
        j, ["l_orderkey", "o_orderdate"], [("rev", "sum", "revenue")]
    )

    def one_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_g"] = 0
        b["o_orderdate"] = b["o_orderdate"].astype("datetime64[us]")
        return b

    top = topk_per_key(
        per_order.map_batches(one_key, batch_format="pandas"),
        ["_g"],
        ["revenue", "l_orderkey"],
        k=10,
        descending=[True, False],
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].astype("int64"),
                "revenue": b["revenue"].astype("int64"),
                "o_orderdate": b["o_orderdate"].astype("datetime64[us]"),
            }
        )

    return top.map_batches(cast, batch_format="pandas")


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey AS o_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate  > DATE '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- registry ----------------------------------------------------------------


def queries():
    """Registry order note (round 5): the correctness driver samples
    the FIRST 50 entries, so the 48 queries never driver-sampled in
    rounds 1-4 lead the dict; the 65 already driver-green entries
    follow. Name->callable mapping is unchanged."""
    return {
        "video_frames": q_video_frames,
        "event_percent_rank": q_event_percent_rank,
        "shipping_priority": q_shipping_priority,
        "rolling_user_value": q_rolling_user_value,
        "event_ntile": q_event_ntile,
        "event_gaps": q_event_gaps,
        "event_funnel": q_event_funnel,
        "retention_cohorts": q_retention_cohorts,
        "heavy_hitters": q_heavy_hitters,
        "props_stats": q_props_stats,
        "export_shards": q_export_shards,
        "region_revenue": q_region_revenue,
        "bucketed_join": q_bucketed_join,
        "priority_rollup": q_priority_rollup,
        "priority_cube": q_priority_cube,
        "event_pivot": q_event_pivot,
        "event_melt": q_event_melt,
        "table_profile": q_table_profile,
        "user_event_sequences": q_user_event_sequences,
        "doc_repetition": q_doc_repetition,
        "decontaminate": q_decontaminate,
        "tfidf_top_term": q_tfidf_top_term,
        "chunk_docs": q_chunk_docs,
        "ngram_topk": q_ngram_topk,
        "streaming_dedup": q_streaming_dedup,
        "resumable_sink": q_resumable_sink,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_corpus": q_dedup_corpus,
        "embed_dedup_clusters": q_embed_dedup_clusters,
        "label_centroids": q_label_centroids,
        "pagerank": q_pagerank,
        "kmeans": q_kmeans,
        "kmeans_purity": q_kmeans_purity,
        "event_rank": q_event_rank,
        "user_type_diversity": q_user_type_diversity,
        "value_quantiles_by_type": q_value_quantiles_by_type,
        "priority_sets": q_priority_sets,
        "part_coverage": q_part_coverage,
        "urgent_only_customers": q_urgent_only_customers,
        "urgent_and_low_customers": q_urgent_and_low_customers,
        "embedding_unnest": q_embedding_unnest,
        "value_ohlc_daily": q_value_ohlc_daily,
        "clustered_value_scan": q_clustered_value_scan,
        "value_hour_regression": q_value_hour_regression,
        "zorder_scan": q_zorder_scan,
        "event_value_pivot": q_event_value_pivot,
        "streaming_window": q_streaming_window,
        "rolling_hour_value": q_rolling_hour_value,
        "streaming_sessions": q_streaming_sessions,
        "value_mode_by_type": q_value_mode_by_type,
        "event_cume_dist": q_event_cume_dist,
        "cdc_flagship": q_cdc_flagship,
        "cdc_turn_counts": q_cdc_turn_counts,
        "cdc_mor": q_cdc_mor,
        "cdc_tail": q_cdc_tail,
        "cdc_tail_mor": q_cdc_tail_mor,
        "conv_text_export": q_conv_text_export,
        "cdc_merge": q_cdc_merge,
        "tool_index": q_tool_index,
        "cdc_delete_where": q_delete_where,
        "cdc_update_where": q_update_where,
        "cdc_restore": q_restore,
        "cdc_branch_merge": q_branch_merge,
        "cdc_changes": q_cdc_changes,
        "cdc_incremental_view": q_cdc_incremental_view,
        "conv_role_quality": q_conv_role_quality,
        "pricing_summary": q_pricing_summary,
        "filter_revenue": q_filter_revenue,
        "topk_orders": q_topk_orders,
        "segment_revenue": q_segment_revenue,
        "region_customers": q_region_customers,
        "distinct_event_types": q_distinct_event_types,
        "event_windows": q_event_windows,
        "latest_event_per_user": q_latest_event_per_user,
        "sessionize": q_sessionize,
        "asof_purchase": q_asof_purchase,
        "semi_join_parts": q_semi_join_parts,
        "anti_join_customers": q_anti_join_customers,
        "order_priority": q_order_priority,
        "user_value_stats": q_user_value_stats,
        "top_orders_per_segment": q_top_orders_per_segment,
        "user_value_spread": q_user_value_spread,
        "value_bands": q_value_bands,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "bpe_tokens": q_bpe_tokens,
        "event_windows_sliding": q_event_windows_sliding,
        "quality_score": q_quality,
        "quality_filter": q_quality_filter,
        "corpus_freq": q_corpus_freq,
        "corpus_freq_join": q_corpus_freq_join,
        "lang_source_stats": q_lang_source_stats,
        "hash_sample": q_hash_sample,
        "stratified_split": q_stratified_split,
        "seq_pack": q_seq_pack,
        "seq_pack_by_source": q_seq_pack_by_source,
        "shuffle_rank": q_shuffle_rank,
        "cap_per_source": q_cap_per_source,
        "mixture_sample": q_mixture_sample,
        "clean_text": q_clean_text,
        "price_quantiles": q_price_quantiles,
        "embed_stats": q_embed_stats,
        "multimodal_features": q_multimodal_features,
        "multimodal_pipeline": q_multimodal_pipeline,
        "knn_all": q_knn_all,
        "cosine_topk": q_cosine_topk,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "minhash_pairs": q_minhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "embedding_near_dups": q_embedding_near_dups,
        "cosine_lsh_pairs": q_cosine_lsh_pairs,
        "ivf_topk": q_ivf_topk,
        "ivf_topk_batch": q_ivf_topk_batch,
    }


def oracle_sql():
    return {
        "cdc_flagship": _cdc_oracle_sql(),
        "cdc_turn_counts": _cdc_turn_counts_sql(),
        "cdc_mor": _cdc_oracle_sql(),
        "cdc_tail": _cdc_oracle_sql(),
        "cdc_tail_mor": _cdc_oracle_sql(),
        "conv_text_export": _sql_conv_text_export(),
        "cdc_merge": _cdc_merge_sql(),
        "tool_index": _sql_tool_index(),
        "cdc_delete_where": _sql_delete_where(),
        "cdc_update_where": _sql_update_where(),
        "cdc_restore": _sql_restore(),
        "cdc_branch_merge": _sql_delete_where(),  # merged == the branch
        "cdc_changes": _cdc_changes_sql(),
        "cdc_incremental_view": _cdc_incremental_view_sql(),
        "conv_role_quality": _conv_role_quality_sql(),
        "pricing_summary": SQL_PRICING,
        "filter_revenue": SQL_FILTER_REVENUE,
        "topk_orders": SQL_TOPK_ORDERS,
        "segment_revenue": SQL_SEGMENT_REVENUE,
        "region_customers": SQL_REGION_CUSTOMERS,
        "distinct_event_types": SQL_DISTINCT_EVENT_TYPES,
        "event_windows": SQL_EVENT_WINDOWS,
        "latest_event_per_user": SQL_LATEST_EVENT,
        "sessionize": SQL_SESSIONIZE,
        "asof_purchase": SQL_ASOF_PURCHASE,
        "semi_join_parts": SQL_SEMI_JOIN_PARTS,
        "anti_join_customers": SQL_ANTI_JOIN_CUSTOMERS,
        "order_priority": SQL_ORDER_PRIORITY,
        "user_value_stats": SQL_USER_VALUE_STATS,
        "top_orders_per_segment": SQL_TOP_ORDERS_PER_SEGMENT,
        "user_value_spread": SQL_USER_VALUE_SPREAD,
        "value_bands": SQL_VALUE_BANDS,
        "dedup_exact": SQL_DEDUP_EXACT,
        "token_stats": SQL_TOKEN_STATS,
        "bpe_tokens": SQL_BPE_TOKENS,
        "event_windows_sliding": SQL_EVENT_WINDOWS_SLIDING,
        "quality_score": SQL_QUALITY,
        "quality_filter": _sql_quality_filter(),
        "corpus_freq": SQL_CORPUS_FREQ,
        "corpus_freq_join": SQL_CORPUS_FREQ,
        "lang_source_stats": SQL_LANG_SOURCE_STATS,
        "hash_sample": _sql_hash_sample(),
        "stratified_split": SQL_STRATIFIED_SPLIT,
        "seq_pack": SQL_SEQ_PACK,
        "seq_pack_by_source": SQL_SEQ_PACK_BY_SOURCE,
        "shuffle_rank": SQL_SHUFFLE_RANK,
        "cap_per_source": SQL_CAP_PER_SOURCE,
        "mixture_sample": _sql_mixture_sample(),
        "clean_text": _sql_clean_text(),
        "price_quantiles": SQL_PRICE_QUANTILES,
        "rolling_user_value": SQL_ROLLING_USER_VALUE,
        "event_ntile": SQL_EVENT_NTILE,
        "event_gaps": SQL_EVENT_GAPS,
        "event_funnel": SQL_EVENT_FUNNEL,
        "retention_cohorts": SQL_RETENTION_COHORTS,
        "heavy_hitters": SQL_HEAVY_HITTERS,
        "props_stats": SQL_PROPS_STATS,
        "export_shards": SQL_EXPORT_SHARDS,
        "region_revenue": SQL_REGION_REVENUE,
        "bucketed_join": SQL_BUCKETED_JOIN,
        "priority_rollup": SQL_PRIORITY_ROLLUP,
        "priority_cube": SQL_PRIORITY_CUBE,
        "event_pivot": SQL_EVENT_PIVOT,
        "event_melt": SQL_EVENT_MELT,
        "table_profile": SQL_TABLE_PROFILE,
        "user_event_sequences": SQL_USER_EVENT_SEQUENCES,
        "doc_repetition": SQL_DOC_REPETITION,
        "decontaminate": SQL_DECONTAMINATE,
        "tfidf_top_term": SQL_TFIDF_TOP_TERM,
        "chunk_docs": SQL_CHUNK_DOCS,
        "ngram_topk": SQL_NGRAM_TOPK,
        "streaming_dedup": SQL_STREAMING_DEDUP,
        "resumable_sink": SQL_RESUMABLE_SINK,
        "embed_stats": SQL_EMBED_STATS,
        "multimodal_features": SQL_MULTIMODAL,
        "multimodal_pipeline": SQL_MULTIMODAL_PIPELINE,
        "video_frames": SQL_VIDEO_FRAMES,
        "knn_all": SQL_KNN_ALL,
        "cosine_topk": SQL_COSINE_TOPK,
        "event_rank": SQL_EVENT_RANK,
        "user_type_diversity": SQL_USER_TYPE_DIVERSITY,
        "value_quantiles_by_type": SQL_VALUE_QUANTILES_BY_TYPE,
        "priority_sets": SQL_PRIORITY_SETS,
        "part_coverage": SQL_PART_COVERAGE,
        "urgent_only_customers": SQL_URGENT_ONLY,
        "urgent_and_low_customers": SQL_URGENT_AND_LOW,
        "embedding_unnest": SQL_EMBEDDING_UNNEST,
        "value_ohlc_daily": SQL_VALUE_OHLC,
        "clustered_value_scan": SQL_CLUSTERED_SCAN,
        "value_hour_regression": SQL_VALUE_HOUR_REGRESSION,
        "zorder_scan": SQL_ZORDER_SCAN,
        "event_value_pivot": SQL_EVENT_VALUE_PIVOT,
        "streaming_window": SQL_STREAMING_WINDOW,
        "rolling_hour_value": SQL_ROLLING_HOUR,
        "streaming_sessions": SQL_STREAMING_SESSIONS,
        "value_mode_by_type": SQL_VALUE_MODE,
        "event_cume_dist": SQL_EVENT_CUME,
        "event_percent_rank": SQL_EVENT_PERCENT_RANK,
        "shipping_priority": SQL_SHIPPING_PRIORITY,
        "lang_id": _sql_lang_id(),
        "simhash": _sql_simhash(),
        "simhash_pairs": _sql_simhash_pairs(),
        "doc_fingerprint": _sql_fingerprint(),
        "minhash_pairs": SQL_MINHASH_PAIRS,
        "ngram_jaccard": SQL_MINHASH_PAIRS,  # same exact-Jaccard semantics
        "dedup_clusters": _sql_dedup_clusters(),
        "dedup_corpus": _sql_dedup_corpus(),
        "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
        "embed_dedup_clusters": _sql_embed_dedup_clusters(),
        "label_centroids": SQL_LABEL_CENTROIDS,
        "pagerank": _sql_pagerank(),
        "kmeans": _sql_kmeans(),
        "kmeans_purity": _sql_kmeans(purity=True),
        "cosine_lsh_pairs": _sql_cosine_lsh(),
        "ivf_topk": _sql_ivf_topk(),
        "ivf_topk_batch": _sql_ivf_topk_batch(),
    }

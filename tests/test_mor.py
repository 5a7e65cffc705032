"""Merge-on-read (MOR) write mode: delta-run ingest, LWW merge at read,
compaction, CDF and write-amplification properties.

The COW path rewrites every touched (part, salt) slot fully merged each
epoch; MOR appends only the epoch's per-key winners as a delta run
(pipelines/cdc.py::CDCConfig.write_mode). These tests pin the contract:
a MOR table is read-equivalent to the COW table built from the same WAL
at every surface (full scan, point read, change feed), compaction folds
it back to one run per slot without changing reads, and the write
amplification is strictly lower on multi-epoch ingest."""

import glob
import os

import pyarrow as pa
import pytest

from wprdc_etl_ray.gen import generate_change_log, replay_oracle_pandas, write_wal
from wprdc_etl_ray.pipelines.cdc import (
    CDCConfig,
    compact,
    read_conversation,
    read_transcripts_arrow,
    run_ingest,
    table_changes,
)
from wprdc_etl_ray.state.manifest import load_manifest

N = 8000


@pytest.fixture(scope="module")
def log():
    return generate_change_log(N, seed=7)


def check_equal(table_root, log):
    got = read_transcripts_arrow(table_root)
    oracle = replay_oracle_pandas(log)
    got = got.select(oracle.schema.names).cast(oracle.schema)
    assert got.num_rows == oracle.num_rows
    assert got.equals(oracle), "materialized table != sequential replay oracle"


def split_wal(tmp_path, log, k, segment_rows=500, evolve_at=None):
    """Write the WAL once, return k cumulative directories (dir i holds
    the first i/k of the segments plus everything before — the watermark
    does the skipping, as in production tailing)."""
    write_wal(str(tmp_path), log, segment_rows=segment_rows, evolve_at=evolve_at)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    dirs = []
    for i in range(1, k + 1):
        bound = round(i * len(segs) / k)
        d = str(tmp_path / f"we{i}")
        os.makedirs(d)
        for s in segs[:bound]:
            os.link(s, os.path.join(d, os.path.basename(s)))
        dirs.append(d)
    return dirs


def ingest_epochs(dirs, root, **cfg):
    for d in dirs:
        run_ingest(d, root, CDCConfig(num_partitions=8, **cfg))


def data_bytes(root):
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True)
    )


def runs_per_slot(manifest):
    out = []
    for e in manifest["partitions"].values():
        by_salt = {}
        for f in e["files"]:
            by_salt.setdefault(f["salt"], []).append(f)
        out.extend(len(v) for v in by_salt.values())
    return out


def test_mor_multi_epoch_matches_oracle(ray_session, tmp_path, log):
    dirs = split_wal(tmp_path, log, 4)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    m = load_manifest(root)
    assert max(runs_per_slot(m)) > 1, "expected multi-run slots under MOR"
    assert any(
        f.get("delta") for e in m["partitions"].values() for f in e["files"]
    ), "expected delta-flagged runs in the manifest"
    check_equal(root, log)


def test_mor_equals_cow_table(ray_session, tmp_path, log):
    dirs = split_wal(tmp_path, log, 3)
    rm, rc = str(tmp_path / "m"), str(tmp_path / "c")
    ingest_epochs(dirs, rm, write_mode="mor")
    ingest_epochs(dirs, rc, write_mode="cow")
    tm = read_transcripts_arrow(rm)
    tc = read_transcripts_arrow(rc)
    assert tm.cast(tc.schema).equals(tc)


def test_mor_write_amplification_lower(ray_session, tmp_path, log):
    """Cumulative bytes written across epochs: MOR appends only deltas,
    COW rewrites every touched slot — on 4 epochs of the same WAL the
    MOR table must write strictly less (deterministic, no timing)."""
    dirs = split_wal(tmp_path, log, 4)
    rm, rc = str(tmp_path / "m"), str(tmp_path / "c")
    ingest_epochs(dirs, rm, write_mode="mor")
    ingest_epochs(dirs, rc, write_mode="cow")
    bm, bc = data_bytes(rm), data_bytes(rc)
    assert bm < bc * 0.75, f"MOR wrote {bm} vs COW {bc}"


def test_mor_compact_folds_runs(ray_session, tmp_path, log):
    dirs = split_wal(tmp_path, log, 4)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    before = read_transcripts_arrow(root)
    res = compact(root)
    assert not res.skipped
    m = load_manifest(root)
    assert max(runs_per_slot(m)) == 1, "compaction must fold each slot to one run"
    after = read_transcripts_arrow(root)
    assert after.cast(before.schema).equals(before)
    check_equal(root, log)


def test_mor_schema_evolution_mid_stream(ray_session, tmp_path, log):
    dirs = split_wal(tmp_path, log, 4, evolve_at=0.5)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    check_equal(root, log)
    got = read_transcripts_arrow(root)
    assert "tool_call_id" in got.schema.names


def test_mor_inline_compaction_threshold(ray_session, tmp_path, log):
    """mor_compact_runs=2: a slot about to hold a 3rd run takes the COW
    path instead — run counts stay bounded and the table stays correct."""
    dirs = split_wal(tmp_path, log, 5)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor", mor_compact_runs=2)
    m = load_manifest(root)
    assert max(runs_per_slot(m)) <= 2
    check_equal(root, log)


def test_mor_point_read(ray_session, tmp_path, log):
    dirs = split_wal(tmp_path, log, 3)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    oracle = replay_oracle_pandas(log).to_pandas()
    conv = oracle["conv_id"].mode().iloc[0]  # a conversation with many turns
    got = read_conversation(root, conv).to_pandas()
    want = oracle[oracle["conv_id"] == conv].sort_values("turn_idx").reset_index(drop=True)
    got = got[want.columns.tolist()].reset_index(drop=True)
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_mor_table_changes_matches_cow(ray_session, tmp_path, log):
    """The change feed between two epochs must be identical whether the
    table stores COW rewrites or MOR delta runs (slot-level diffing)."""
    dirs = split_wal(tmp_path, log, 2)
    rm, rc = str(tmp_path / "m"), str(tmp_path / "c")
    ingest_epochs(dirs, rm, write_mode="mor")
    ingest_epochs(dirs, rc, write_mode="cow")

    def feed(root):
        df = table_changes(root, 1, 2).to_pandas()
        return df.sort_values(["conv_id", "turn_idx", "change_type"]).reset_index(
            drop=True
        )

    fm, fc = feed(rm), feed(rc)
    assert fm.equals(fc), "MOR change feed differs from COW change feed"
    assert len(fm) > 0


def test_tail_mor_matches_oracle(ray_session, tmp_path, log):
    """Tail session in MOR mode: every commit appends delta runs (no
    slot rewrite, no resident table in the actors) and the final state
    still equals the replay oracle."""
    from wprdc_etl_ray.pipelines.tail import TailSession

    write_wal(str(tmp_path / "full"), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "full" / "wal" / "seg-*.parquet")))
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    root = str(tmp_path / "t")
    sess = TailSession(
        wal, root, CDCConfig(num_partitions=8, write_mode="mor"), num_actors=2
    )
    total = 0
    for i, seg in enumerate(segs):
        os.link(seg, os.path.join(wal, os.path.basename(seg)))
        if i % 3 == 2:
            total += sess.poll()
            sess.commit()
    total += sess.poll()
    sess.commit()
    assert total == N
    # MOR actors hold nothing after a commit (state lives on disk)
    import ray as _ray

    stats = _ray.get([a.stats.remote() for a in sess.actors])
    assert sum(s["resident_rows"] for s in stats) == 0
    sess.shutdown()
    m = load_manifest(root)
    assert max(runs_per_slot(m)) > 1
    assert any(
        f.get("delta") for e in m["partitions"].values() for f in e["files"]
    )
    check_equal(root, log)


def test_tail_mor_inline_compaction(ray_session, tmp_path, log):
    """mor_compact_runs bounds run growth across many tail commits."""
    from wprdc_etl_ray.pipelines.tail import TailSession

    write_wal(str(tmp_path / "full"), log, segment_rows=500)
    segs = sorted(glob.glob(str(tmp_path / "full" / "wal" / "seg-*.parquet")))
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    root = str(tmp_path / "t")
    sess = TailSession(
        wal,
        root,
        CDCConfig(num_partitions=4, write_mode="mor", mor_compact_runs=3),
        num_actors=2,
    )
    for i, seg in enumerate(segs):
        os.link(seg, os.path.join(wal, os.path.basename(seg)))
        sess.poll()
        sess.commit()
    sess.shutdown()
    m = load_manifest(root)
    assert max(runs_per_slot(m)) <= 3
    assert m["epoch"] >= 6  # many commits happened
    check_equal(root, log)


def test_mor_replay_is_noop(ray_session, tmp_path, log):
    dirs = split_wal(tmp_path, log, 2)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    m1 = load_manifest(root)
    res = run_ingest(dirs[-1], root, CDCConfig(num_partitions=8, write_mode="mor"))
    assert res.skipped
    assert load_manifest(root) == m1


def test_mixed_cow_mor_epochs(ray_session, tmp_path, log):
    """COW and MOR epochs interleave freely on one table: a COW epoch
    rewrites its touched slots fully merged (collapsing their delta
    runs), untouched slots keep their runs, and the final state always
    equals the replay oracle."""
    dirs = split_wal(tmp_path, log, 4)
    root = str(tmp_path / "t")
    for d, mode in zip(dirs, ["cow", "mor", "cow", "mor"]):
        run_ingest(d, root, CDCConfig(num_partitions=8, write_mode=mode))
    check_equal(root, log)


def test_mor_read_with_column_pruning(ray_session, tmp_path, log):
    """read_transcripts(columns=...) on a MOR table returns the same
    pruned view as the full read (the slot merge reads only key/order
    + requested columns)."""
    from wprdc_etl_ray.pipelines.cdc import read_transcripts

    dirs = split_wal(tmp_path, log, 3)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    full = (
        read_transcripts(root)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pruned = (
        read_transcripts(root, columns=["conv_id", "turn_idx", "role"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(pruned.columns) == ["conv_id", "turn_idx", "role"]
    assert pruned.equals(full[["conv_id", "turn_idx", "role"]])


def test_vacuum_keeps_live_mor_runs(ray_session, tmp_path, log):
    """Aggressive vacuum must never delete delta runs the CURRENT
    manifest still references (they are old-epoch files, but live)."""
    from wprdc_etl_ray.pipelines.cdc import vacuum

    dirs = split_wal(tmp_path, log, 3)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    before = read_transcripts_arrow(root)
    res = vacuum(root, keep_epochs=1)
    after = read_transcripts_arrow(root)
    assert after.equals(before)
    check_equal(root, log)


def test_maintain_service_pass(ray_session, tmp_path, log):
    """maintain(): compacts a run-heavy MOR table, vacuums old epochs,
    and never changes what readers see."""
    from wprdc_etl_ray.pipelines.cdc import maintain

    dirs = split_wal(tmp_path, log, 5)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor", mor_compact_runs=0)
    before = read_transcripts_arrow(root)
    m = load_manifest(root)
    assert max(runs_per_slot(m)) > 2

    res = maintain(root, max_runs_per_slot=2, keep_epochs=1)
    assert res["compacted"] is True
    assert res["vacuum"] is not None
    m2 = load_manifest(root)
    assert max(runs_per_slot(m2)) == 1
    assert read_transcripts_arrow(root).equals(before)
    check_equal(root, log)

    # second pass: nothing to compact
    res2 = maintain(root, max_runs_per_slot=2, keep_epochs=1)
    assert res2["compacted"] is False


def test_refresh_mode_resets_mor_runs(ray_session, tmp_path, log):
    """mode='refresh' on a MOR table drops all runs and rebuilds from
    scratch — full-refresh semantics are storage-strategy-independent."""
    dirs = split_wal(tmp_path, log, 3)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="mor")
    assert max(runs_per_slot(load_manifest(root))) > 1
    run_ingest(
        dirs[-1], root, CDCConfig(num_partitions=8, mode="refresh", write_mode="mor")
    )
    m = load_manifest(root)
    assert max(runs_per_slot(m)) == 1  # refresh rebuilt every slot
    check_equal(root, log)


def test_vacuum_protects_restored_epoch(ray_session, tmp_path, log):
    """After RESTORE, the re-referenced old files are live again — an
    aggressive vacuum must keep them (current manifest wins)."""
    from wprdc_etl_ray.pipelines.cdc import restore_table, vacuum

    dirs = split_wal(tmp_path, log, 2)
    root = str(tmp_path / "t")
    ingest_epochs(dirs, root, write_mode="cow")
    e1 = None
    from wprdc_etl_ray.pipelines.cdc import read_transcripts

    e1 = read_transcripts(root, epoch=1).to_pandas()
    restore_table(root, epoch=1)
    vacuum(root, keep_epochs=1)
    after = read_transcripts(root).to_pandas()
    assert len(after) == len(e1)


def test_builder_write_mode(ray_session, tmp_path, log):
    from wprdc_etl_ray.errors import InvalidConfigError
    from wprdc_etl_ray.pipelines.cdc import CDCPipeline

    dirs = split_wal(tmp_path, log, 2)
    root = str(tmp_path / "t")
    for d in dirs:
        (
            CDCPipeline("transcripts")
            .source(d)
            .sink(root)
            .partitions(8)
            .write_mode("mor", mor_compact_runs=4)
            .run()
        )
    m = load_manifest(root)
    assert any(f.get("delta") for e in m["partitions"].values() for f in e["files"])
    check_equal(root, log)
    import pytest as _pytest

    with _pytest.raises(InvalidConfigError):
        CDCPipeline("t").write_mode("bogus")

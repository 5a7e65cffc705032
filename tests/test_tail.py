"""Tail-mode (stateful merger actor pool) tests: byte-equivalence with
the batch path, incremental polls, crash-restart replay (SURVEY.md §7
step 6: "actor path must produce byte-identical tables")."""

import glob
import os

import pyarrow as pa
import pytest

from wprdc_etl_ray.gen import generate_change_log, replay_oracle_pandas, write_wal
from wprdc_etl_ray.pipelines.cdc import (
    CDCConfig,
    read_transcripts_arrow,
    run_ingest,
)
from wprdc_etl_ray.pipelines.tail import TailSession
from wprdc_etl_ray.state.manifest import load_manifest

N = 6000


@pytest.fixture(scope="module")
def log():
    return generate_change_log(N, seed=11)


def equal_tables(root_a, root_b):
    a, b = read_transcripts_arrow(root_a), read_transcripts_arrow(root_b)
    return a.equals(b.select(a.schema.names).cast(a.schema))


def test_tail_matches_batch_and_oracle(ray_session, tmp_path, log):
    write_wal(str(tmp_path), log, segment_rows=1500)
    wal = str(tmp_path / "wal")
    batch_root, tail_root = str(tmp_path / "batch"), str(tmp_path / "tail")
    run_ingest(wal, batch_root, CDCConfig(num_partitions=8))

    sess = TailSession(wal, tail_root, CDCConfig(num_partitions=8), num_actors=2)
    applied = sess.poll()
    assert applied == N
    res = sess.commit()
    assert res.epoch == 1 and res.events_read == N
    sess.shutdown()

    assert equal_tables(batch_root, tail_root)
    oracle = replay_oracle_pandas(log)
    got = read_transcripts_arrow(tail_root).select(oracle.schema.names).cast(oracle.schema)
    assert got.equals(oracle)


def test_tail_incremental_polls(ray_session, tmp_path, log):
    write_wal(str(tmp_path / "full"), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "full" / "wal" / "seg-*.parquet")))
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    tail_root = str(tmp_path / "t")

    sess = TailSession(wal, tail_root, CDCConfig(num_partitions=8), num_actors=2)
    total = 0
    # segments arrive over time; poll+commit per delivery wave
    for i, seg in enumerate(segs):
        os.link(seg, os.path.join(wal, os.path.basename(seg)))
        if i % 2 == 1:
            total += sess.poll()
            sess.commit()
    total += sess.poll()
    res = sess.commit()
    sess.shutdown()
    assert total == N
    assert res.global_watermark == N - 1

    oracle = replay_oracle_pandas(log)
    got = read_transcripts_arrow(tail_root).select(oracle.schema.names).cast(oracle.schema)
    assert got.equals(oracle)
    # epochs advanced per commit wave
    m = load_manifest(tail_root)
    assert m["epoch"] >= 3
    assert m["metrics"]["mode"] == "tail"


def test_tail_crash_restart_replays_uncommitted(ray_session, tmp_path, log):
    """Events applied to actors but NOT committed are lost on crash; a
    fresh session reloads the committed snapshot + watermark and
    replays them to the identical final table (exactly-once)."""
    write_wal(str(tmp_path), log, segment_rows=1500)
    wal = str(tmp_path / "wal")
    root = str(tmp_path / "t")

    sess = TailSession(wal, root, CDCConfig(num_partitions=8), num_actors=2)
    sess.poll()
    # no commit — simulate crash
    sess.shutdown()
    assert load_manifest(root) is None  # nothing published

    sess2 = TailSession(wal, root, CDCConfig(num_partitions=8), num_actors=2)
    assert sess2.poll() == N  # everything replays (watermark still -1)
    sess2.commit()
    sess2.shutdown()
    oracle = replay_oracle_pandas(log)
    got = read_transcripts_arrow(root).select(oracle.schema.names).cast(oracle.schema)
    assert got.equals(oracle)


def test_tail_poll_noop_and_commit_noop(ray_session, tmp_path, log):
    write_wal(str(tmp_path), log, segment_rows=3000)
    wal = str(tmp_path / "wal")
    root = str(tmp_path / "t")
    sess = TailSession(wal, root, CDCConfig(num_partitions=8), num_actors=2)
    sess.poll()
    sess.commit()
    assert sess.poll() == 0  # watermark filters everything
    res = sess.commit()
    assert res.skipped
    sess.shutdown()


def test_salted_tail_fresh_table_matches_batch_and_oracle(ray_session, tmp_path, log):
    """Tail mode on a salted table: a hot conversation's turns fan out
    over S merge actors (gid = part·S + turn_idx%S) and the committed
    layout is byte-compatible with a salted batch ingest."""
    write_wal(str(tmp_path), log, segment_rows=1500)
    wal = str(tmp_path / "wal")
    batch_root, tail_root = str(tmp_path / "batch"), str(tmp_path / "tail")
    run_ingest(wal, batch_root, CDCConfig(num_partitions=8, salt=4))

    sess = TailSession(wal, tail_root, CDCConfig(num_partitions=8, salt=4), num_actors=3)
    assert sess.poll() == N
    sess.commit()
    sess.shutdown()
    m = load_manifest(tail_root)
    assert m["metrics"]["salt"] == 4
    assert any(f["salt"] > 0 for e in m["partitions"].values() for f in e["files"])
    assert equal_tables(batch_root, tail_root)
    oracle = replay_oracle_pandas(log)
    got = read_transcripts_arrow(tail_root).select(oracle.schema.names).cast(oracle.schema)
    assert got.equals(oracle)


def test_mixed_mode_salted_batch_then_tail_then_batch(ray_session, tmp_path, log):
    """A salted batch-created table can be tailed directly (the session
    reads salt from the manifest, same as the batch path) and handed
    back to batch mode — all three epochs converge to the oracle."""
    import glob as _glob

    write_wal(str(tmp_path / "full"), log, segment_rows=1000)
    segs = sorted(_glob.glob(str(tmp_path / "full" / "wal" / "seg-*.parquet")))
    third = len(segs) // 3
    wals = []
    for i in range(3):
        w = str(tmp_path / f"w{i}")
        os.makedirs(w)
        hi = len(segs) if i == 2 else (i + 1) * third
        for s in segs[:hi]:
            os.link(s, os.path.join(w, os.path.basename(s)))
        wals.append(w)
    root = str(tmp_path / "t")

    run_ingest(wals[0], root, CDCConfig(num_partitions=8, salt=4))  # salted batch
    # tail continues the salted table; configured salt=1 is overridden
    # by the manifest's table property
    sess = TailSession(wals[1], root, CDCConfig(num_partitions=8), num_actors=2)
    sess.poll()
    sess.commit()
    sess.shutdown()
    assert load_manifest(root)["metrics"]["salt"] == 4
    run_ingest(wals[2], root, CDCConfig(num_partitions=8))  # batch again

    oracle = replay_oracle_pandas(log)
    got = read_transcripts_arrow(root).select(oracle.schema.names).cast(oracle.schema)
    assert got.num_rows == oracle.num_rows
    assert got.equals(oracle)


def test_tail_schema_evolution_mid_stream(ray_session, tmp_path, log):
    """v2 segments (added columns, widened turn_idx) arrive in a LATER
    poll than the v1 segments: actors must unify resident snapshots with
    the evolved events and surface the unified schema."""
    import glob as _glob

    import pyarrow as pa

    write_wal(str(tmp_path / "full"), log, segment_rows=1000, evolve_at=0.5)
    segs = sorted(_glob.glob(str(tmp_path / "full" / "wal" / "seg-*.parquet")))
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    root = str(tmp_path / "t")
    sess = TailSession(wal, root, CDCConfig(num_partitions=8), num_actors=2)

    half = len(segs) // 2
    for s in segs[:half]:  # v1 era
        os.link(s, os.path.join(wal, os.path.basename(s)))
    sess.poll()
    sess.commit()
    for s in segs[half:]:  # v2 era
        os.link(s, os.path.join(wal, os.path.basename(s)))
    sess.poll()
    sess.commit()
    sess.shutdown()

    got = read_transcripts_arrow(root)
    assert "tool_call_id" in got.schema.names
    assert got.schema.field("turn_idx").type == pa.int64()
    oracle = replay_oracle_pandas(log)
    cmp = got.select(oracle.schema.names).cast(oracle.schema)
    assert cmp.equals(oracle)


def test_tail_commit_refuses_foreign_epoch(ray_session, tmp_path, log):
    """An external writer advancing the table mid-session must make the
    tail commit fail loudly (its resident snapshots are stale) instead
    of silently overwriting the other writer's partitions."""
    import glob as _glob

    from wprdc_etl_ray.errors import ConcurrentCommitError

    write_wal(str(tmp_path / "full"), log, segment_rows=1500)
    segs = sorted(_glob.glob(str(tmp_path / "full" / "wal" / "seg-*.parquet")))
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    root = str(tmp_path / "t")

    sess = TailSession(wal, root, CDCConfig(num_partitions=4), num_actors=2)
    for s in segs[:2]:
        os.link(s, os.path.join(wal, os.path.basename(s)))
    sess.poll()
    # external batch writer commits first
    run_ingest(str(tmp_path / "full" / "wal"), root, CDCConfig(num_partitions=4))
    with pytest.raises(ConcurrentCommitError):
        sess.commit()
    sess.shutdown()

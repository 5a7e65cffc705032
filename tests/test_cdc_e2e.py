"""Golden replay-equality tests for the full CDC pipeline
(SURVEY.md §5.2 item 2): engine output vs sequential replay oracle,
with duplicates, out-of-order delivery, schema evolution, hot-key skew,
incremental epochs, crash-resume and double-commit replay."""

import glob
import json
import os

import pyarrow as pa
import pytest

from wprdc_etl_ray.gen import generate_change_log, replay_oracle_pandas, write_wal
from wprdc_etl_ray.pipelines.cdc import (
    CDCConfig,
    CDCPipeline,
    read_transcripts_arrow,
    run_ingest,
)
from wprdc_etl_ray.state.manifest import load_manifest

N = 8000


@pytest.fixture(scope="module")
def log():
    return generate_change_log(N, seed=42)


def check_equal(table_root, log):
    got = read_transcripts_arrow(table_root)
    oracle = replay_oracle_pandas(log)
    got = got.select(oracle.schema.names).cast(oracle.schema)
    assert got.num_rows == oracle.num_rows
    assert got.equals(oracle), "materialized table != sequential replay oracle"


def test_batch_ingest_matches_oracle(ray_session, tmp_path, log):
    write_wal(str(tmp_path), log, segment_rows=2000)
    res = run_ingest(str(tmp_path / "wal"), str(tmp_path / "t"), CDCConfig(num_partitions=8))
    assert res.events_read == N
    check_equal(str(tmp_path / "t"), log)


def test_salted_ingest_matches_oracle(ray_session, tmp_path, log):
    write_wal(str(tmp_path), log, segment_rows=2000)
    run_ingest(
        str(tmp_path / "wal"),
        str(tmp_path / "t"),
        CDCConfig(num_partitions=8, salt=4),
    )
    check_equal(str(tmp_path / "t"), log)


def test_schema_evolution_mid_stream(ray_session, tmp_path, log):
    write_wal(str(tmp_path), log, segment_rows=2000, evolve_at=0.5)
    run_ingest(str(tmp_path / "wal"), str(tmp_path / "t"), CDCConfig(num_partitions=8))
    check_equal(str(tmp_path / "t"), log)
    got = read_transcripts_arrow(str(tmp_path / "t"))
    assert "tool_call_id" in got.schema.names  # evolved columns surfaced
    assert got.schema.field("turn_idx").type == pa.int64()  # widened


def test_incremental_epochs_match_full_replay(ray_session, tmp_path, log):
    """Apply the WAL in two epochs; final table must equal one-shot replay."""
    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    half = len(segs) // 2
    wal1, wal2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    os.makedirs(wal1), os.makedirs(wal2)
    for s in segs[:half]:
        os.link(s, os.path.join(wal1, os.path.basename(s)))
    for s in segs:  # second dir holds ALL segments: watermark must skip the first half
        os.link(s, os.path.join(wal2, os.path.basename(s)))
    root = str(tmp_path / "t")
    r1 = run_ingest(wal1, root, CDCConfig(num_partitions=8))
    assert r1.epoch == 1
    r2 = run_ingest(wal2, root, CDCConfig(num_partitions=8))
    assert r2.epoch == 2
    assert r2.events_read == N - r1.events_read  # first half skipped via watermark
    check_equal(root, log)


def test_double_commit_replay_is_noop(ray_session, tmp_path, log):
    write_wal(str(tmp_path), log, segment_rows=2000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))
    m1 = load_manifest(root)
    res = run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))
    assert res.skipped
    m2 = load_manifest(root)
    assert m1 == m2  # manifest untouched
    check_equal(root, log)


def test_crash_before_commit_then_resume(ray_session, tmp_path, log):
    """Epoch-2 data files written but manifest flip missed (simulated crash):
    the table still reads at epoch 1, and a retry converges to the truth."""
    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    wal1 = str(tmp_path / "w1")
    os.makedirs(wal1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(wal1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(wal1, root, CDCConfig(num_partitions=8))
    m1 = load_manifest(root)

    # simulate a crashed epoch 2: orphan data files exist, manifest does not move
    orphan_dir = os.path.join(root, "data", "epoch=000002")
    os.makedirs(orphan_dir, exist_ok=True)
    with open(os.path.join(orphan_dir, "part-00000.parquet"), "wb") as f:
        f.write(b"torn write")
    assert load_manifest(root) == m1  # readers unaffected by orphans

    # retry applies the full WAL; commit succeeds and equals the oracle
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))
    check_equal(root, log)


def test_deterministic_output_files(ray_session, tmp_path, log):
    """Same WAL into two fresh tables ⇒ byte-identical partition files."""
    write_wal(str(tmp_path), log, segment_rows=2000)
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    run_ingest(str(tmp_path / "wal"), ra, CDCConfig(num_partitions=8))
    run_ingest(str(tmp_path / "wal"), rb, CDCConfig(num_partitions=8))
    fa = sorted(glob.glob(os.path.join(ra, "data", "**", "*.parquet"), recursive=True))
    fb = sorted(glob.glob(os.path.join(rb, "data", "**", "*.parquet"), recursive=True))
    assert [os.path.relpath(p, ra) for p in fa] == [os.path.relpath(p, rb) for p in fb]
    for a, b in zip(fa, fb):
        with open(a, "rb") as f1, open(b, "rb") as f2:
            assert f1.read() == f2.read(), f"{a} differs"


def test_manifest_lineage_metrics(ray_session, tmp_path, log):
    write_wal(str(tmp_path), log, segment_rows=2000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))
    m = load_manifest(root)
    assert m["epoch"] == 1
    assert m["global_watermark"] == N - 1
    assert len(m["partitions"]) == 8
    tot = sum(e["events_applied"] for e in m["partitions"].values())
    assert tot == N
    for e in m["partitions"].values():
        assert e["rows"] == e["live_rows"] + e["tombstones"]
        assert 0 <= e["watermark"] <= N - 1
    # history file exists per epoch
    assert os.path.exists(os.path.join(root, "manifest", "epoch-000001.json"))


def test_fluent_builder_parity(ray_session, tmp_path, log):
    """Reference Pipeline fluent-API parity: stage setters chain; missing
    stage raises (wprdc-etl enforce_full_pipeline behavior)."""
    from wprdc_etl_ray.errors import InvalidConfigError

    with pytest.raises(InvalidConfigError):
        CDCPipeline("t").run()
    write_wal(str(tmp_path), log, segment_rows=4000)
    res = (
        CDCPipeline("transcripts")
        .source(str(tmp_path / "wal"))
        .partitions(8)
        .sink(str(tmp_path / "t"))
        .run()
    )
    assert res.epoch == 1
    check_equal(str(tmp_path / "t"), log)


def test_direct_and_sort_exchange_identical(ray_session, tmp_path, log):
    """The two exchange implementations must produce byte-identical
    partition files (the merge is input-order-independent)."""
    write_wal(str(tmp_path), log, segment_rows=2000)
    ra, rb = str(tmp_path / "direct"), str(tmp_path / "sorted")
    run_ingest(str(tmp_path / "wal"), ra, CDCConfig(num_partitions=8, salt=4, exchange="direct"))
    run_ingest(str(tmp_path / "wal"), rb, CDCConfig(num_partitions=8, salt=4, exchange="sort"))
    fa = sorted(glob.glob(os.path.join(ra, "data", "**", "*.parquet"), recursive=True))
    fb = sorted(glob.glob(os.path.join(rb, "data", "**", "*.parquet"), recursive=True))
    assert [os.path.relpath(p, ra) for p in fa] == [os.path.relpath(p, rb) for p in fb]
    for a, b in zip(fa, fb):
        with open(a, "rb") as f1, open(b, "rb") as f2:
            assert f1.read() == f2.read(), f"{a} differs between exchanges"


def test_compaction_preserves_reads_and_folds_runs(ray_session, tmp_path, log):
    """Incremental epochs accumulate runs; compact() folds them into one
    file per salt without changing read results; tombstone GC drops
    delete markers."""
    from wprdc_etl_ray.pipelines.cdc import compact

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    root = str(tmp_path / "t")
    wal_inc = str(tmp_path / "inc")
    os.makedirs(wal_inc)
    for i, s in enumerate(segs):  # one epoch per pair of segments
        os.link(s, os.path.join(wal_inc, os.path.basename(s)))
        if i % 2 == 1:
            run_ingest(wal_inc, root, CDCConfig(num_partitions=4, salt=2))
    run_ingest(wal_inc, root, CDCConfig(num_partitions=4, salt=2))
    before = load_manifest(root)
    before_table = read_transcripts_arrow(root)

    res = compact(root)
    after = load_manifest(root)
    assert res.epoch == before["epoch"] + 1
    # runs folded: exactly salt files per partition
    for e in after["partitions"].values():
        assert len(e["files"]) == e["salt"]
    assert read_transcripts_arrow(root).equals(before_table)
    assert after["global_watermark"] == before["global_watermark"]

    # tombstone GC drops markers but not live rows
    res2 = compact(root, drop_tombstones=True)
    m = load_manifest(root)
    assert sum(e["tombstones"] for e in m["partitions"].values()) == 0
    assert read_transcripts_arrow(root).equals(before_table)
    # and the watermark still guards replays
    r = run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))
    assert r.skipped


def test_concurrent_commit_loser_rejected_then_retry_converges(ray_session, tmp_path, log):
    """Optimistic concurrency: a commit based on a stale epoch is
    refused; the retry re-plans and converges (no lost updates)."""
    from wprdc_etl_ray.errors import ConcurrentCommitError
    from wprdc_etl_ray.state.manifest import commit_manifest
    from wprdc_etl_ray.schema import TRANSCRIPT_SCHEMA, snapshot_schema

    write_wal(str(tmp_path), log, segment_rows=4000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))
    stale = load_manifest(root)

    # a second writer commits epoch 2 first
    commit_manifest(
        root, stale, table="transcripts", num_partitions=4,
        schema=snapshot_schema(TRANSCRIPT_SCHEMA),
        new_watermark=stale["global_watermark"], updated_partitions={},
    )
    # the loser (still based on epoch 1) must be refused
    with pytest.raises(ConcurrentCommitError):
        commit_manifest(
            root, stale, table="transcripts", num_partitions=4,
            schema=snapshot_schema(TRANSCRIPT_SCHEMA),
            new_watermark=stale["global_watermark"], updated_partitions={},
        )
    # and a normal re-planned ingest still works
    r = run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))
    assert r.skipped  # nothing above the watermark
    check_equal(root, log)


@pytest.mark.parametrize(
    "seed,n,kwargs",
    [
        (101, 3000, dict(p_update=0.5, p_delete=0.15, p_dup=0.1, p_ooo=0.3)),
        (202, 3000, dict(p_update=0.05, p_delete=0.0, p_dup=0.0, p_ooo=0.0)),
        (303, 2500, dict(zipf_s=2.5, mean_turns=3)),  # extreme skew, short convs
        (404, 2500, dict(mean_turns=40, p_delete=0.2)),  # long convs, heavy deletes
    ],
)
def test_randomized_configs_match_oracle(ray_session, tmp_path, seed, n, kwargs):
    """Engine == sequential oracle across generator parameter corners
    (heavy mutation, no mutation, extreme skew, delete-heavy)."""
    rnd_log = generate_change_log(n, seed=seed, **kwargs)
    write_wal(str(tmp_path), rnd_log, segment_rows=700)
    root = str(tmp_path / "t")
    run_ingest(root_wal := str(tmp_path / "wal"), root, CDCConfig(num_partitions=8, salt=2))
    check_equal(root, rnd_log)


def test_exchange_combiner_path_matches_oracle(ray_session, tmp_path, log):
    """A tiny combiner threshold forces the exchange actors to pre-merge
    their buffers repeatedly mid-epoch; the result must be unchanged."""
    write_wal(str(tmp_path), log, segment_rows=1000)
    run_ingest(
        str(tmp_path / "wal"),
        str(tmp_path / "t"),
        CDCConfig(num_partitions=8, salt=2, batch_size=1000, exchange_compact_rows=500),
    )
    check_equal(str(tmp_path / "t"), log)


def test_num_partitions_locked_to_manifest(ray_session, tmp_path, log):
    """Re-ingesting an existing table with a different configured B must
    use the committed B (a re-hash would merge against wrong partitions)."""
    half = len(log) // 2
    write_wal(str(tmp_path / "a"), log[:half], segment_rows=2000)
    write_wal(str(tmp_path / "b"), log, segment_rows=2000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "a" / "wal"), root, CDCConfig(num_partitions=8))
    # second epoch configured with a DIFFERENT B — must be ignored
    res = run_ingest(str(tmp_path / "b" / "wal"), root, CDCConfig(num_partitions=16))
    assert not res.skipped
    assert load_manifest(root)["num_partitions"] == 8
    check_equal(root, log)


def test_attempt_dirs_separate_racing_jobs():
    """Distinct jobs targeting the same epoch write to distinct dirs (a
    racing loser can orphan files but never overwrite the winner's);
    identical replays map to identical paths (determinism)."""
    from wprdc_etl_ray.pipelines.cdc import attempt_epoch_dir

    a = attempt_epoch_dir(2, "ingest|upsert|99|B8|S1|seg-1,seg-2")
    b = attempt_epoch_dir(2, "compact|False|1|99")
    assert a != b
    assert a == attempt_epoch_dir(2, "ingest|upsert|99|B8|S1|seg-1,seg-2")
    assert a.startswith("epoch=000002-")


def test_point_read_conversation(ray_session, tmp_path, log):
    """read_conversation touches only the owning partition and returns
    the same rows as a full-scan filter, in turn order."""
    from wprdc_etl_ray.pipelines.cdc import read_conversation, read_transcripts_arrow

    write_wal(str(tmp_path), log, segment_rows=2000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8, salt=2))
    full = read_transcripts_arrow(root)
    conv = full.column("conv_id")[0].as_py()
    got = read_conversation(root, conv)
    import pyarrow.compute as pc

    want = full.filter(pc.equal(full.column("conv_id"), conv))
    want = want.sort_by([("turn_idx", "ascending")])
    assert got.select(want.schema.names).cast(want.schema).equals(want)
    assert read_conversation(root, "no-such-conv").num_rows == 0


def test_partial_tombstone_gc(ray_session, tmp_path, log):
    """drop_tombstones with min_tombstone_ratio rewrites only partitions
    holding garbage; reads are unchanged and targeted partitions lose
    their tombstones."""
    from wprdc_etl_ray.pipelines.cdc import compact

    write_wal(str(tmp_path), log, segment_rows=2000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))
    before = load_manifest(root)
    ratios = sorted(
        e["tombstones"] / e["rows"] for e in before["partitions"].values() if e["rows"]
    )
    thr = (ratios[len(ratios) // 2] + ratios[len(ratios) // 2 - 1]) / 2  # median split
    dirty = {
        p for p, e in before["partitions"].items()
        if e["rows"] and e["tombstones"] / e["rows"] >= thr
    }
    assert dirty and len(dirty) < 8, "need a mixed dirty/clean split"
    res = compact(root, drop_tombstones=True, min_tombstone_ratio=thr)
    assert res.partitions_updated == len(dirty)
    after = load_manifest(root)
    for p in dirty:
        assert after["partitions"][p]["tombstones"] == 0
    check_equal(root, log)


def _live_state(log, max_offset=None):
    """Replay to a watermark -> pandas keyed state (pub cols only)."""
    t = log
    if max_offset is not None:
        import pyarrow.compute as pc

        t = t.filter(pc.less_equal(t.column("offset"), max_offset))
    df = replay_oracle_pandas(t).to_pandas()
    return df.set_index(["conv_id", "turn_idx"]).sort_index()


def test_table_changes_matches_replay_diff(ray_session, tmp_path, log):
    from wprdc_etl_ray.pipelines.cdc import table_changes

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    wal1 = str(tmp_path / "w1")
    os.makedirs(wal1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(wal1, os.path.basename(s)))
    root = str(tmp_path / "t")
    r1 = run_ingest(wal1, root, CDCConfig(num_partitions=8))
    r2 = run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))
    assert (r1.epoch, r2.epoch) == (1, 2)

    got = table_changes(root, from_epoch=1, to_epoch=2).to_pandas()
    got = got.set_index(["conv_id", "turn_idx"]).sort_index()

    old = _live_state(log, r1.global_watermark)
    new = _live_state(log)
    cols = [c for c in new.columns]
    ins = new.index.difference(old.index)
    dele = old.index.difference(new.index)
    both = new.index.intersection(old.index)
    a, b = old.loc[both, cols], new.loc[both, cols]
    upd = both[((a != b) & ~(a.isna() & b.isna())).any(axis=1)]

    assert set(got.index[got.change_type == "insert"]) == set(ins)
    assert set(got.index[got.change_type == "delete"]) == set(dele)
    assert set(got.index[got.change_type == "update"]) == set(upd)
    # payload: new values for insert/update, old values for delete
    for idx_set, side in ((ins, new), (upd, new), (dele, old)):
        if len(idx_set):
            lhs = got.loc[idx_set, cols].sort_index()
            rhs = side.loc[idx_set, cols].sort_index()
            assert ((lhs == rhs) | (lhs.isna() & rhs.isna())).all().all()

    # from_epoch=0: everything is an insert and equals the final state
    full = table_changes(root, from_epoch=0).to_pandas()
    assert (full.change_type == "insert").all()
    assert len(full) == len(new)


def test_table_changes_prunes_untouched_partitions(ray_session, tmp_path):
    """Second epoch touches ONE conversation -> the feed contains only
    that conv's keys (carried-forward runs pruned by path equality)."""
    import pyarrow as pa

    from wprdc_etl_ray.pipelines.cdc import table_changes

    base = generate_change_log(4000, seed=7)
    write_wal(str(tmp_path / "a"), base, segment_rows=4000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "a" / "wal"), root, CDCConfig(num_partitions=8))

    conv = base.column("conv_id")[0].as_py()
    start = int(pa.compute.max(base.column("offset")).as_py()) + 1
    upd = pa.table(
        {
            "offset": pa.array([start, start + 1], pa.int64()),
            "op": pa.array(["update", "insert"], pa.string()),
            "conv_id": pa.array([conv, conv], pa.string()),
            "turn_idx": pa.array([0, 99], pa.int64()),
            "role": pa.array(["user", "assistant"], pa.string()),
            "text": pa.array(["edited text", "brand new turn"], pa.string()),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array(
                [1_700_000_000_000_000 + start, 1_700_000_000_000_000 + start + 1],
                pa.timestamp("us"),
            ),
            "tool_call_id": pa.array([None, None], pa.string()),
            "tool_args": pa.array([None, None], pa.string()),
        }
    )
    write_wal(str(tmp_path / "b"), upd, segment_rows=10)
    r2 = run_ingest(str(tmp_path / "b" / "wal"), root, CDCConfig(num_partitions=8))
    assert r2.epoch == 2

    got = table_changes(root, from_epoch=1, to_epoch=2).to_pandas()
    assert set(got.conv_id) == {conv}
    by_type = got.set_index("turn_idx").change_type.to_dict()
    assert by_type.get(99) == "insert"


def test_time_travel_read_equals_prefix_replay(ray_session, tmp_path, log):
    import pyarrow.compute as pc

    from wprdc_etl_ray.pipelines.cdc import read_transcripts

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    wal1 = str(tmp_path / "w1")
    os.makedirs(wal1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(wal1, os.path.basename(s)))
    root = str(tmp_path / "t")
    r1 = run_ingest(wal1, root, CDCConfig(num_partitions=8))
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))

    old = read_transcripts(root, epoch=1).to_pandas()
    want = replay_oracle_pandas(
        log.filter(pc.less_equal(log.column("offset"), r1.global_watermark))
    ).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = old.sort_values(key).reset_index(drop=True)
    b = want[old.columns.intersection(want.columns)].sort_values(key).reset_index(drop=True)
    cols = [c for c in b.columns]
    assert len(a) == len(b)
    eq = (a[cols] == b[cols]) | (a[cols].isna() & b[cols].isna())
    assert eq.all().all()


def test_incremental_view_equals_full_recompute(ray_session, tmp_path, log):
    from wprdc_etl_ray.pipelines.cdc import incremental_conv_stats, table_changes

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    wal1 = str(tmp_path / "w1")
    os.makedirs(wal1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(wal1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(wal1, root, CDCConfig(num_partitions=8))
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))

    got = (
        incremental_conv_stats(root, from_epoch=1, to_epoch=2)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    new = replay_oracle_pandas(log).to_pandas()
    want = (
        new.assign(chars=new["text"].fillna("").str.len())
        .groupby("conv_id")
        .agg(n_turns=("conv_id", "size"), total_chars=("chars", "sum"))
        .reset_index().sort_values("conv_id").reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["n_turns"].tolist() == want["n_turns"].tolist()
    assert got["total_chars"].tolist() == want["total_chars"].tolist()

    # pre/post image pairing: every update key appears exactly twice
    feed = table_changes(root, 1, 2, pre_images=True).to_pandas()
    upd = feed[feed.change_type.str.startswith("update")]
    per_key = upd.groupby(["conv_id", "turn_idx"]).change_type.agg(set)
    assert all(s == {"update_preimage", "update_postimage"} for s in per_key)


def test_vacuum_reclaims_unreferenced_keeps_retained(ray_session, tmp_path, log):
    from wprdc_etl_ray.pipelines.cdc import read_transcripts, vacuum

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    root = str(tmp_path / "t")
    thirds = [segs[: len(segs) // 3], segs[: 2 * len(segs) // 3], segs]
    for i, part in enumerate(thirds):
        w = str(tmp_path / f"w{i}")
        os.makedirs(w)
        for s in part:
            os.link(s, os.path.join(w, os.path.basename(s)))
        run_ingest(w, root, CDCConfig(num_partitions=8))

    # orphan from a crashed attempt at an OLD epoch: reclaimable
    old_orphan = os.path.join(root, "data", "epoch=000002-deadbeef")
    os.makedirs(old_orphan)
    with open(os.path.join(old_orphan, "part-x.parquet"), "wb") as f:
        f.write(b"junk")
    # future-epoch attempt (in-flight writer): must NOT be touched
    future = os.path.join(root, "data", "epoch=000004-cafecafe")
    os.makedirs(future)
    with open(os.path.join(future, "part-y.parquet"), "wb") as f:
        f.write(b"inflight")

    before = read_transcripts(root).to_pandas()
    res = vacuum(root, keep_epochs=2)
    assert res["deleted"] > 0
    assert os.path.exists(os.path.join(future, "part-y.parquet"))
    assert not os.path.exists(os.path.join(old_orphan, "part-x.parquet"))

    # current + previous epoch still read; epoch 1 files may be gone
    after = read_transcripts(root).to_pandas()
    assert len(after) == len(before)
    key = ["conv_id", "turn_idx"]
    a = before.sort_values(key).reset_index(drop=True)
    b = after.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # epoch-2 (retained) still readable end-to-end
    assert read_transcripts(root, epoch=2).count() > 0
    # replay remains a no-op after vacuum (watermark intact)
    assert run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8)).skipped


def test_persisted_view_chained_refreshes_equal_recompute(ray_session, tmp_path, log):
    """Refresh the persisted view after EACH of three epochs; the final
    view (built purely from chained deltas) must equal a full recompute;
    re-refresh with no new epoch is a no-op."""
    import pandas as pd

    from wprdc_etl_ray.pipelines.cdc import refresh_conv_stats_view

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    root = str(tmp_path / "t")
    thirds = [segs[: len(segs) // 3], segs[: 2 * len(segs) // 3], segs]
    for i, part in enumerate(thirds):
        w = str(tmp_path / f"w{i}")
        os.makedirs(w)
        for s in part:
            os.link(s, os.path.join(w, os.path.basename(s)))
        run_ingest(w, root, CDCConfig(num_partitions=8))
        res = refresh_conv_stats_view(root)
        assert res["refreshed"] and res["epoch"] == i + 1

    noop = refresh_conv_stats_view(root)
    assert not noop["refreshed"] and noop["epoch"] == 3

    import pyarrow.parquet as pq_

    view = pq_.read_table(
        glob.glob(os.path.join(root, "views", "conv_stats", "view-*.parquet"))[0]
    ).to_pandas()
    new = replay_oracle_pandas(log).to_pandas()
    want = (
        new.assign(chars=new["text"].fillna("").str.len())
        .groupby("conv_id")
        .agg(n_turns=("conv_id", "size"), total_chars=("chars", "sum"))
        .reset_index().sort_values("conv_id").reset_index(drop=True)
    )
    view = view.sort_values("conv_id").reset_index(drop=True)
    assert view["conv_id"].tolist() == want["conv_id"].tolist()
    assert view["n_turns"].tolist() == want["n_turns"].tolist()
    assert view["total_chars"].tolist() == want["total_chars"].tolist()


def test_clone_table_shallow_and_independent(ray_session, tmp_path, log):
    """Shallow clone: zero-copy birth (hardlinks), identical reads,
    then fully independent evolution — and vacuum on the source cannot
    break the clone (hardlinked bytes survive until the last link)."""
    from wprdc_etl_ray.pipelines.cdc import clone_table, vacuum

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    src = str(tmp_path / "src")
    run_ingest(w1, src, CDCConfig(num_partitions=8))

    dst = str(tmp_path / "dst")
    m = clone_table(src, dst)
    assert m["metrics"]["mode"] == "clone"
    a = read_transcripts_arrow(src)
    b = read_transcripts_arrow(dst)
    assert a.equals(b)
    # hardlinked, not copied
    f = next(
        os.path.join(src, e["files"][0]["path"])
        for e in m["partitions"].values()
    )
    assert os.stat(f).st_nlink >= 2

    # diverge: src gets the rest of the WAL; clone stays at birth state
    run_ingest(str(tmp_path / "wal"), src, CDCConfig(num_partitions=8))
    assert read_transcripts_arrow(dst).equals(b)
    check_equal(src, log)

    # vacuum source aggressively; clone must still read its bytes
    vacuum(src, keep_epochs=1)
    assert read_transcripts_arrow(dst).equals(b)

    # cloning onto an existing table refuses
    import pytest as _pytest

    from wprdc_etl_ray.errors import InvalidConfigError

    with _pytest.raises(InvalidConfigError):
        clone_table(src, dst)


def test_clone_at_past_epoch(ray_session, tmp_path, log):
    from wprdc_etl_ray.pipelines.cdc import clone_table

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    src = str(tmp_path / "src")
    run_ingest(w1, src, CDCConfig(num_partitions=8))
    epoch1 = read_transcripts_arrow(src)
    run_ingest(str(tmp_path / "wal"), src, CDCConfig(num_partitions=8))

    dst = str(tmp_path / "dst")
    clone_table(src, dst, epoch=1)
    assert read_transcripts_arrow(dst).equals(epoch1)


def test_repartition_table_layout_migration(ray_session, tmp_path, log):
    """Re-hash to a different (B, S): reads identical before/after, the
    manifest reflects the new layout, continued ingest + point reads
    keep working at the new B — and tombstones survive the move (a late
    older event still cannot resurrect a deleted key)."""
    from wprdc_etl_ray.pipelines.cdc import read_conversation, repartition_table

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=4))
    before = read_transcripts_arrow(root)

    res = repartition_table(root, new_partitions=16, new_salt=2)
    m = load_manifest(root)
    assert m["num_partitions"] == 16 and m["metrics"]["salt"] == 2
    assert res.partitions_updated <= 16
    after = read_transcripts_arrow(root)
    assert after.cast(before.schema).equals(before)

    # continued ingest at the new layout reaches the full-replay truth
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))
    check_equal(root, log)
    m2 = load_manifest(root)
    assert m2["num_partitions"] == 16  # table property wins over config

    # point read resolves through the new hash
    conv = read_transcripts_arrow(root).column("conv_id")[0].as_py()
    got = read_conversation(root, conv)
    assert got.num_rows > 0


def test_repartition_mor_table(ray_session, tmp_path, log):
    """Repartitioning a MOR table collapses its delta runs in the move."""
    from wprdc_etl_ray.pipelines.cdc import repartition_table

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=4, write_mode="mor"))
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4, write_mode="mor"))
    repartition_table(root, new_partitions=8)
    m = load_manifest(root)
    # every slot is one file after the rewrite
    for e in m["partitions"].values():
        by_salt = {}
        for f in e["files"]:
            by_salt.setdefault(f["salt"], []).append(f)
        assert all(len(v) == 1 for v in by_salt.values())
    check_equal(root, log)


def test_follow_changes_yields_epoch_feeds(ray_session, tmp_path, log):
    """The change-feed subscription yields one CDF per committed epoch,
    in order, exactly once — and a replication consumer (merge_into of
    the feed rows) reconstructs the source table."""
    import numpy as np

    from wprdc_etl_ray.pipelines.cdc import follow_changes, merge_into

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    root = str(tmp_path / "t")
    feed = follow_changes(root, from_epoch=0, poll_interval=0.05, max_polls=2)

    # replica table: bootstrap empty with the same layout
    import ray.data as rd

    from wprdc_etl_ray.schema import TRANSCRIPT_SCHEMA, snapshot_schema
    from wprdc_etl_ray.state.manifest import commit_manifest

    replica = str(tmp_path / "r")
    os.makedirs(replica)
    commit_manifest(
        replica, None, table="transcripts", num_partitions=8,
        schema=snapshot_schema(TRANSCRIPT_SCHEMA), new_watermark=-1,
        updated_partitions={}, metrics={"salt": 1},
    )

    thirds = [len(segs) // 3, 2 * len(segs) // 3, len(segs)]
    got_epochs = []
    for i, bound in enumerate(thirds, start=1):
        d = str(tmp_path / f"w{i}")
        os.makedirs(d)
        for s in segs[:bound]:
            os.link(s, os.path.join(d, os.path.basename(s)))
        run_ingest(d, root, CDCConfig(num_partitions=8))
        epoch, cdf = next(feed)
        got_epochs.append(epoch)
        df = cdf.to_pandas()
        assert len(df) > 0
        # replicate: deletes -> _action delete, everything else upsert
        df["_action"] = np.where(df.pop("change_type") == "delete", "delete", "upsert")
        merge_into(replica, rd.from_pandas(df), job_id=f"repl{epoch}")
    assert got_epochs == [1, 2, 3]
    # exhausted: no further epochs within max_polls
    assert next(feed, None) is None

    src_t = read_transcripts_arrow(root)
    dst_t = read_transcripts_arrow(replica).select(src_t.schema.names)
    assert dst_t.cast(src_t.schema).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    ).equals(src_t)


def test_secondary_index_incremental_refresh(ray_session, tmp_path, log):
    """Inverted index built at epoch 1, refreshed from the change feed
    at epoch 2 == an index built from scratch at epoch 2; lookups match
    the replay truth; a value updated away disappears."""
    from wprdc_etl_ray.pipelines.index import (
        build_index,
        index_lookup,
        lookup_rows,
        refresh_index,
    )

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    run_ingest(w1, ra, CDCConfig(num_partitions=8))
    build_index(ra, "tool")
    run_ingest(str(tmp_path / "wal"), ra, CDCConfig(num_partitions=8))
    r = refresh_index(ra, "tool")
    assert r["refreshed"] is True

    run_ingest(str(tmp_path / "wal"), rb, CDCConfig(num_partitions=8))
    build_index(rb, "tool")

    oracle = replay_oracle_pandas(log).to_pandas()
    tools = sorted(oracle["tool"].dropna().unique())
    assert len(tools) > 1
    for tool in tools:
        want = sorted(oracle[oracle["tool"] == tool]["conv_id"].unique())
        assert index_lookup(ra, "tool", tool) == want  # incremental
        assert index_lookup(rb, "tool", tool) == want  # from-scratch
    # unknown value: empty, no error
    assert index_lookup(ra, "tool", "no-such-tool") == []
    # row fetch equals the filtered replay
    rows = lookup_rows(ra, "tool", tools[0]).to_pandas()
    want_rows = oracle[oracle["tool"] == tools[0]]
    assert len(rows) == len(want_rows)
    # refresh with no new epoch is a no-op
    assert refresh_index(ra, "tool")["refreshed"] is False

    # scale shape: refresh writes only DELTA-touched buckets; any bucket
    # the feed didn't touch is hardlinked forward (same inode), proving
    # no whole-index rewrite happened on the incremental path
    from wprdc_etl_ray.pipelines.cdc import table_changes
    from wprdc_etl_ray.pipelines.index import N_BUCKETS, _bucket_of, _index_dir

    feed = table_changes(ra, from_epoch=1, to_epoch=2, pre_images=True).to_pandas()
    touched = set(
        int(b)
        for b in _bucket_of(feed["tool"].dropna().astype(str).to_numpy(object), N_BUCKETS)
    )
    files = sorted(glob.glob(os.path.join(_index_dir(ra, "tool"), "bucket-*.parquet")))
    assert files
    for p in files:
        b = int(os.path.basename(p).split("-")[1])
        if b not in touched:
            assert os.stat(p).st_nlink > 1, f"untouched bucket {b} was rewritten"


def test_cdf_consumers_invariant_across_repartition(ray_session, tmp_path, log):
    """A repartition epoch surfaces key MOVES as cancelling
    delete+insert pairs — the incremental view and the secondary index
    folded across it must equal from-scratch recomputes."""
    from wprdc_etl_ray.pipelines.cdc import incremental_conv_stats, repartition_table
    from wprdc_etl_ray.pipelines.index import build_index, index_lookup, refresh_index

    write_wal(str(tmp_path), log, segment_rows=1000)
    root = str(tmp_path / "t")
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))
    build_index(root, "tool")
    repartition_table(root, new_partitions=16)  # epoch 2, pure move

    # index refreshed THROUGH the repartition == built from scratch
    refresh_index(root, "tool")
    oracle = replay_oracle_pandas(log).to_pandas()
    for tool in sorted(oracle["tool"].dropna().unique())[:4]:
        want = sorted(oracle[oracle["tool"] == tool]["conv_id"].unique())
        assert index_lookup(root, "tool", tool) == want

    # incremental view across the repartition epoch == full aggregate
    view = (
        incremental_conv_stats(root, from_epoch=1, to_epoch=2)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    live = oracle
    want = (
        live.assign(chars=live["text"].fillna("").str.len())
        .groupby("conv_id")
        .agg(n_turns=("turn_idx", "size"), total_chars=("chars", "sum"))
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert view["n_turns"].tolist() == want["n_turns"].tolist()
    assert view["total_chars"].tolist() == want["total_chars"].tolist()


def test_read_conversations_batched(ray_session, tmp_path, log):
    """Batched point reads == per-conversation point reads, over a MOR
    table (multi-run slots merge inside the task)."""
    from wprdc_etl_ray.pipelines.cdc import read_conversation, read_conversations

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=8, write_mode="mor"))
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8, write_mode="mor"))

    oracle = replay_oracle_pandas(log).to_pandas()
    convs = sorted(oracle["conv_id"].unique())[:30]
    got = (
        read_conversations(root, convs)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle[oracle["conv_id"].isin(convs)]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["text"].fillna("").tolist() == want["text"].fillna("").tolist()
    # equals the single-point path too
    one = read_conversation(root, convs[0]).to_pandas()
    sub = got[got.conv_id == convs[0]].reset_index(drop=True)
    assert one["text"].fillna("").tolist() == sub["text"].fillna("").tolist()
    # unknown ids: empty, no error
    assert read_conversations(root, ["nope-1", "nope-2"]).count() == 0


def test_epoch_tags(ray_session, tmp_path, log):
    """Named versions: tag an epoch, read by tag; unknown tags and
    never-committed epochs raise."""
    from wprdc_etl_ray.pipelines.cdc import read_transcripts
    from wprdc_etl_ray.state.manifest import resolve_tag, tag_epoch

    write_wal(str(tmp_path), log, segment_rows=2000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=4))
    tag_epoch(root, "v1")
    e1 = read_transcripts(root).to_pandas()
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))
    assert resolve_tag(root, "v1") == 1
    tagged = read_transcripts(root, tag="v1").to_pandas()
    assert len(tagged) == len(e1)
    cur = read_transcripts(root).to_pandas()
    assert len(cur) > len(e1)
    with pytest.raises(KeyError):
        resolve_tag(root, "nope")
    with pytest.raises(ValueError):
        tag_epoch(root, "bad", epoch=99)


def test_restore_table_rewinds_and_replays(ray_session, tmp_path, log):
    """RESTORE rewinds state AND watermark; a subsequent ingest replays
    the WAL forward and converges to the full-replay truth."""
    from wprdc_etl_ray.pipelines.cdc import read_transcripts, restore_table
    from wprdc_etl_ray.state.manifest import tag_epoch

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=4))
    tag_epoch(root, "good")
    e1 = read_transcripts(root).to_pandas()
    wm1 = load_manifest(root)["global_watermark"]

    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))  # "bad" epoch 2

    res = restore_table(root, tag="good")
    assert res.epoch == 3
    assert res.global_watermark == wm1
    restored = read_transcripts(root).to_pandas()
    assert len(restored) == len(e1)

    # replay forward: the undone events re-apply, converging to truth
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=4))
    check_equal(root, log)

    # restoring to a vacuumed-away epoch refuses with a clear error
    from wprdc_etl_ray.errors import InvalidConfigError
    from wprdc_etl_ray.pipelines.cdc import compact, vacuum

    compact(root)
    vacuum(root, keep_epochs=1)
    with pytest.raises(InvalidConfigError):
        restore_table(root, epoch=1)


def test_table_diff_branch_review(ray_session, tmp_path, log):
    """Diff a diverged clone against its source: only changed slots are
    read (hardlinked rel-paths prune across roots) and the feed reports
    exactly the branch's mutations."""
    import pyarrow.compute as pc_

    from wprdc_etl_ray.errors import InvalidConfigError
    from wprdc_etl_ray.pipelines.cdc import (
        clone_table,
        delete_where,
        repartition_table,
        table_diff,
    )

    write_wal(str(tmp_path), log, segment_rows=2000)
    src = str(tmp_path / "src")
    run_ingest(str(tmp_path / "wal"), src, CDCConfig(num_partitions=8))
    br = str(tmp_path / "branch")
    clone_table(src, br)
    delete_where(br, lambda b: pc_.is_valid(b.column("tool")))

    feed = table_diff(src, br).to_pandas()
    before = read_transcripts_arrow(src).to_pandas()
    want_deleted = before[before["tool"].notna()]
    assert (feed["change_type"] == "delete").all()
    assert len(feed) == len(want_deleted)
    assert sorted(feed["conv_id"].tolist()) == sorted(want_deleted["conv_id"].tolist())

    # identical tables: empty diff
    same = table_diff(src, src).to_pandas()
    assert len(same) == 0

    # mismatched layouts refuse
    repartition_table(br, new_partitions=16)
    with pytest.raises(InvalidConfigError):
        table_diff(src, br)


def test_merge_branch_round_trip(ray_session, tmp_path, log):
    """clone → mutate the branch (deletes + updates) → merge_branch
    back: the target converges to the branch's state."""
    import pyarrow.compute as pc_

    from wprdc_etl_ray.pipelines.cdc import (
        clone_table,
        delete_where,
        merge_branch,
        update_where,
    )

    write_wal(str(tmp_path), log, segment_rows=2000)
    src = str(tmp_path / "src")
    run_ingest(str(tmp_path / "wal"), src, CDCConfig(num_partitions=8))
    br = str(tmp_path / "branch")
    clone_table(src, br)
    delete_where(br, lambda b: pc_.is_valid(b.column("tool")))
    update_where(
        br,
        lambda b: pc_.equal(b.column("turn_idx"), 0),
        lambda hit: pa.table({"text": pa.array(["BRANCHED"] * hit.num_rows)}),
        set_cols=["text"],
    )
    want = read_transcripts_arrow(br)

    res = merge_branch(src, br)
    assert not res.skipped
    got = read_transcripts_arrow(src)
    assert got.select(want.schema.names).cast(want.schema).equals(want)


def test_full_lifecycle_kitchen_sink(ray_session, tmp_path, log):
    """Every table service against ONE MOR table, in sequence: MOR
    multi-epoch ingest → tag → secondary index → clone branch →
    branch delete_where → table_diff review → merge_branch back →
    incremental index refresh through it all → maintain (compact +
    vacuum) → restore to the tag → replay forward converges to the
    merged truth. If any two services disagree about manifest/layout
    semantics, this breaks."""
    import pyarrow.compute as pc_

    from wprdc_etl_ray.pipelines.cdc import (
        clone_table,
        delete_where,
        maintain,
        merge_branch,
        read_transcripts,
        restore_table,
        table_diff,
    )
    from wprdc_etl_ray.pipelines.index import build_index, index_lookup, refresh_index
    from wprdc_etl_ray.state.manifest import tag_epoch

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=8, write_mode="mor"))
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8, write_mode="mor"))
    tag_epoch(root, "ingested")
    build_index(root, "tool")

    # branch: drop all tool turns, review, merge back
    br = str(tmp_path / "branch")
    clone_table(root, br)
    delete_where(br, lambda b: pc_.is_valid(b.column("tool")))
    feed = table_diff(root, br).to_pandas()
    assert (feed["change_type"] == "delete").all() and len(feed) > 0
    merge_branch(root, br)
    merged_state = read_transcripts_arrow(root)
    assert merged_state.num_rows > 0

    # index refresh folds the merge epoch; tool turns are gone
    refresh_index(root, "tool")
    oracle = replay_oracle_pandas(log).to_pandas()
    some_tool = oracle["tool"].dropna().iloc[0]
    assert index_lookup(root, "tool", some_tool) == []

    # maintenance: the merge epoch already collapsed touched slots, so
    # compaction may be a no-op — vacuum still reclaims; reads unchanged
    res = maintain(root, max_runs_per_slot=1, keep_epochs=2)
    assert res["vacuum"] is not None and res["vacuum"]["deleted"] >= 0
    assert read_transcripts_arrow(root).equals(merged_state)

    # restore to the tag... refused (vacuum took the old files), so
    # re-ingest from the WAL instead: watermark already covers it → noop
    from wprdc_etl_ray.errors import InvalidConfigError

    try:
        restore_table(root, tag="ingested")
        restored = True
    except InvalidConfigError:
        restored = False
    if restored:
        # replay forward: converge back to the PRE-branch truth
        run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8, write_mode="mor"))
        check_equal(root, log)
    else:
        # retention ate the tag; the merged state remains authoritative
        assert read_transcripts_arrow(root).equals(merged_state)


def test_index_nondefault_bucket_count_survives_refresh(ray_session, tmp_path, log):
    """An index built with n_buckets != the module default must refresh
    and look up with the RECORDED count (meta.json), not the constant."""
    from wprdc_etl_ray.pipelines.index import build_index, index_lookup, refresh_index

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=8))
    r = build_index(root, "tool", n_buckets=4)
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))
    r = refresh_index(root, "tool")
    assert r["refreshed"] is True

    oracle = replay_oracle_pandas(log).to_pandas()
    for tool in sorted(oracle["tool"].dropna().unique()):
        want = sorted(oracle[oracle["tool"] == tool]["conv_id"].unique())
        assert index_lookup(root, "tool", tool) == want


def test_cdf_feeds_streaming_window(ray_session, tmp_path, log):
    """CDC → streaming integration capstone: the change-data-feed of a
    two-epoch ingest streams through the distributed windower
    (feed_dataset per epoch), and the finalized+drained windows equal a
    batch GROUP BY over the same feed rows — exactly-once across epoch
    boundaries."""
    import pandas as pd
    import pyarrow as pa

    from wprdc_etl_ray.pipelines.cdc import follow_changes
    from wprdc_etl_ray.pipelines.window import StreamingWindowSession

    write_wal(str(tmp_path), log, segment_rows=1000)
    segs = sorted(glob.glob(str(tmp_path / "wal" / "seg-*.parquet")))
    w1 = str(tmp_path / "w1")
    os.makedirs(w1)
    for s in segs[: len(segs) // 2]:
        os.link(s, os.path.join(w1, os.path.basename(s)))
    root = str(tmp_path / "t")
    run_ingest(w1, root, CDCConfig(num_partitions=8))
    run_ingest(str(tmp_path / "wal"), root, CDCConfig(num_partitions=8))

    DAY = 86_400_000_000
    sess = StreamingWindowSession(
        "role", "ts", "one", width_us=DAY, allowed_lateness_us=DAY, num_shards=3
    )
    feeds = []
    outs = []
    for epoch, ds in follow_changes(root, from_epoch=0, max_polls=1):
        def narrow(b: pd.DataFrame) -> pd.DataFrame:
            ins = b[b["change_type"] == "insert"][["role", "ts"]].dropna()
            ins = ins.copy()
            ins["one"] = 1
            return ins

        fed = ds.map_batches(narrow, batch_format="pandas")
        feeds.append(fed.to_pandas())
        outs.append(sess.feed_dataset(fed))
    outs.append(sess.drain())
    got = (
        pa.concat_tables(outs)
        .to_pandas()
        .sort_values(["key", "wstart"], ignore_index=True)
    )
    assert not got.duplicated(["key", "wstart"]).any()

    allfeed = pd.concat(feeds, ignore_index=True)
    allfeed["w"] = (
        allfeed["ts"].astype("datetime64[us]").astype("int64") // DAY
    ) * DAY
    want = (
        allfeed.groupby(["role", "w"], as_index=False)
        .agg(n=("one", "size"), s=("one", "sum"))
        .sort_values(["role", "w"], ignore_index=True)
    )
    assert got["key"].tolist() == want["role"].tolist()
    assert got["wstart"].tolist() == want["w"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    sess.shutdown()

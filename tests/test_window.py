"""Streaming tumbling-window aggregation (pipelines/window.py):
watermark finalization, exactly-once emission, late-event accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa

from wprdc_etl_ray.pipelines.window import StreamingWindowSession

W = 100  # window width (us) for tests


def _mk(keys, ts, vals):
    return pa.table(
        {
            "k": pa.array([str(x) for x in keys], pa.string()),
            "ts": pa.array(np.asarray(ts, np.int64), pa.timestamp("us")),
            "v": pa.array(np.asarray(vals, np.int64), pa.int64()),
        }
    )


def test_streamed_equals_batch_when_lateness_covers_disorder(ray_session):
    rng = np.random.default_rng(41)
    n = 5000
    ts = np.cumsum(rng.integers(0, 5, n))  # increasing base time
    ts = ts + rng.integers(-30, 31, n)  # bounded disorder < 50
    keys = rng.choice(["a", "b", "c"], n)
    vals = rng.integers(0, 100, n)

    sess = StreamingWindowSession("k", "ts", "v", width_us=W, allowed_lateness_us=60, num_shards=4)
    outs = []
    for i in range(0, n, 500):  # 10 waves
        outs.append(sess.feed(_mk(keys[i : i + 500], ts[i : i + 500], vals[i : i + 500])))
    outs.append(sess.drain())
    assert sess.stats()["late_dropped"] == 0
    got = (
        pa.concat_tables(outs)
        .to_pandas()
        .sort_values(["key", "wstart"], ignore_index=True)
    )
    # exactly-once: no (key, wstart) appears twice across waves
    assert not got.duplicated(["key", "wstart"]).any()

    df = pd.DataFrame({"key": keys.astype(str), "w": (ts // W) * W, "v": vals})
    want = (
        df.groupby(["key", "w"], as_index=False)
        .agg(n=("v", "size"), s=("v", "sum"))
        .sort_values(["key", "w"], ignore_index=True)
    )
    assert got["key"].tolist() == want["key"].tolist()
    assert got["wstart"].tolist() == want["w"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["s"].tolist() == want["s"].tolist()
    sess.shutdown()


def test_late_events_are_counted_not_applied(ray_session):
    sess = StreamingWindowSession("k", "ts", "v", width_us=W, allowed_lateness_us=0, num_shards=2)
    out1 = sess.feed(_mk(["a", "a"], [50, 250], [1, 1]))
    # watermark=250 -> window 0 (end 100) and 100 (end 200) sealed;
    # window [0,100) emitted with n=1
    got1 = out1.to_pandas()
    assert got1[got1.wstart == 0]["n"].tolist() == [1]
    # a straggler for the sealed window 0 must be dropped and counted
    out2 = sess.feed(_mk(["a"], [60], [7]))
    assert sess.stats()["late_dropped"] == 1
    # ...and never re-emits the sealed window
    all_rows = pd.concat([got1, out2.to_pandas(), sess.drain().to_pandas()])
    assert not all_rows.duplicated(["key", "wstart"]).any()
    assert int(all_rows[all_rows.wstart == 0]["n"].sum()) == 1  # 7 never applied
    sess.shutdown()


def test_wave_boundaries_do_not_change_results(ray_session):
    """Same stream in 3 waves vs 7 waves -> identical final multiset."""
    rng = np.random.default_rng(43)
    n = 2100
    ts = np.cumsum(rng.integers(0, 4, n)) + rng.integers(-10, 11, n)
    keys = rng.choice(["x", "y"], n)
    vals = rng.integers(0, 9, n)

    def run(chunks):
        sess = StreamingWindowSession("k", "ts", "v", width_us=W, allowed_lateness_us=20, num_shards=3)
        outs = []
        for lo in range(0, n, chunks):
            outs.append(sess.feed(_mk(keys[lo : lo + chunks], ts[lo : lo + chunks], vals[lo : lo + chunks])))
        outs.append(sess.drain())
        sess.shutdown()
        return (
            pa.concat_tables(outs)
            .to_pandas()
            .sort_values(["key", "wstart"], ignore_index=True)
        )

    a, b = run(700), run(300)
    assert a.equals(b)


def _batch_sessions(keys, ts, gap):
    df = pd.DataFrame({"key": np.asarray(keys).astype(str), "ts": np.asarray(ts, np.int64)})
    s = df.sort_values(["key", "ts"], kind="mergesort").reset_index(drop=True)
    brk = (s["key"] != s["key"].shift()) | (s["ts"].diff() > gap)
    sid = brk.cumsum()
    return (
        s.groupby(sid, sort=False)
        .agg(key=("key", "first"), session_start=("ts", "min"),
             session_end=("ts", "max"), n=("ts", "size"))
        .reset_index(drop=True)
        .sort_values(["key", "session_start"], ignore_index=True)
        .astype({"session_start": "int64", "session_end": "int64", "n": "int64"})
    )


def test_streaming_sessions_equal_batch_sessionize(ray_session):
    from wprdc_etl_ray.pipelines.window import StreamingSessionizer

    rng = np.random.default_rng(51)
    n = 4000
    base = np.cumsum(rng.integers(0, 40, n))  # frequent small gaps + natural breaks
    ts = base + rng.integers(-15, 16, n)  # disorder < 31
    keys = rng.choice(["a", "b", "c", "d"], n)
    GAP = 120

    sess = StreamingSessionizer("k", "ts", gap_us=GAP, allowed_lateness_us=40, num_shards=4)
    outs = []
    for lo in range(0, n, 400):
        outs.append(sess.feed(_mk(keys[lo : lo + 400], ts[lo : lo + 400], np.zeros(min(400, n - lo)))))
    outs.append(sess.drain())
    assert sess.stats()["late_dropped"] == 0
    got = (
        pa.concat_tables(outs)
        .to_pandas()
        .sort_values(["key", "session_start"], ignore_index=True)
    )
    assert not got.duplicated(["key", "session_start"]).any()  # exactly-once
    want = _batch_sessions(keys, ts, GAP)
    assert got["key"].tolist() == want["key"].tolist()
    assert got["session_start"].tolist() == want["session_start"].tolist()
    assert got["session_end"].tolist() == want["session_end"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    sess.shutdown()


def test_streaming_sessions_bridge_merges_open_sessions(ray_session):
    """An out-of-order event BETWEEN two open sessions (within gap of
    both) must fuse them into one."""
    from wprdc_etl_ray.pipelines.window import StreamingSessionizer

    sess = StreamingSessionizer("k", "ts", gap_us=150, allowed_lateness_us=10_000, num_shards=2)
    sess.feed(_mk(["u", "u"], [1000, 1250], [0, 0]))  # two sessions, 250 apart
    assert sess.stats()["open_sessions"] == 2
    sess.feed(_mk(["u"], [1120], [0]))  # within 150 of both -> bridge
    assert sess.stats()["open_sessions"] == 1
    final = sess.drain().to_pandas()
    assert final["session_start"].tolist() == [1000]
    assert final["session_end"].tolist() == [1250]
    assert final["n"].tolist() == [3]
    sess.shutdown()


def test_streaming_sessions_eager_late_policy(ray_session):
    from wprdc_etl_ray.pipelines.window import StreamingSessionizer

    sess = StreamingSessionizer("k", "ts", gap_us=50, allowed_lateness_us=0, num_shards=2)
    out1 = sess.feed(_mk(["u", "u"], [100, 1000], [0, 0]))
    # watermark 1000: session [100,100] sealed (end+gap=150 < 1000)
    assert out1.to_pandas()["session_start"].tolist() == [100]
    sess.feed(_mk(["u"], [120], [0]))  # straggler for the sealed session
    assert sess.stats()["late_dropped"] == 1
    final = sess.drain().to_pandas()
    assert final["session_start"].tolist() == [1000]  # never re-emitted/merged
    sess.shutdown()


def test_feed_dataset_equals_feed(ray_session):
    """The distributed wave path (partials built + routed inside
    map_batches tasks) must produce exactly the driver-side feed()'s
    results — windows and sessions both."""
    import ray.data as rd

    from wprdc_etl_ray.pipelines.window import (
        StreamingSessionizer,
        StreamingWindowSession,
    )

    rng = np.random.default_rng(61)
    n = 3000
    ts = np.cumsum(rng.integers(0, 6, n)) + rng.integers(-20, 21, n)
    keys = rng.choice(["a", "b", "c"], n)
    vals = rng.integers(0, 50, n)

    def windows_via(method):
        sess = StreamingWindowSession("k", "ts", "v", width_us=W, allowed_lateness_us=45, num_shards=3)
        outs = []
        for lo in range(0, n, 1000):
            t = _mk(keys[lo : lo + 1000], ts[lo : lo + 1000], vals[lo : lo + 1000])
            if method == "ds":
                outs.append(sess.feed_dataset(rd.from_arrow(t).repartition(4)))
            else:
                outs.append(sess.feed(t))
        outs.append(sess.drain())
        sess.shutdown()
        return (
            pa.concat_tables(outs)
            .to_pandas()
            .sort_values(["key", "wstart"], ignore_index=True)
        )

    assert windows_via("ds").equals(windows_via("batch"))

    def sessions_via(method):
        sess = StreamingSessionizer("k", "ts", gap_us=150, allowed_lateness_us=45, num_shards=3)
        outs = []
        for lo in range(0, n, 1000):
            t = _mk(keys[lo : lo + 1000], ts[lo : lo + 1000], vals[lo : lo + 1000])
            if method == "ds":
                outs.append(sess.feed_dataset(rd.from_arrow(t).repartition(4)))
            else:
                outs.append(sess.feed(t))
        outs.append(sess.drain())
        sess.shutdown()
        return (
            pa.concat_tables(outs)
            .to_pandas()
            .sort_values(["key", "session_start"], ignore_index=True)
        )

    assert sessions_via("ds").equals(sessions_via("batch"))


def test_window_checkpoint_restore_continues_exactly(ray_session, tmp_path):
    """feed half → checkpoint → kill → restore → feed rest == the
    uninterrupted run (open windows, watermark clock, late counters all
    survive)."""
    from wprdc_etl_ray.pipelines.window import StreamingWindowSession

    rng = np.random.default_rng(71)
    n = 2000
    ts = np.cumsum(rng.integers(0, 8, n)) + rng.integers(-20, 21, n)
    keys = rng.choice(["a", "b"], n)
    vals = rng.integers(0, 30, n)

    def uninterrupted():
        s = StreamingWindowSession("k", "ts", "v", width_us=W, allowed_lateness_us=45, num_shards=3)
        outs = [s.feed(_mk(keys[i : i + 500], ts[i : i + 500], vals[i : i + 500])) for i in range(0, n, 500)]
        outs.append(s.drain())
        s.shutdown()
        return pa.concat_tables(outs).to_pandas().sort_values(["key", "wstart"], ignore_index=True)

    s1 = StreamingWindowSession("k", "ts", "v", width_us=W, allowed_lateness_us=45, num_shards=3)
    outs = [s1.feed(_mk(keys[i : i + 500], ts[i : i + 500], vals[i : i + 500])) for i in range(0, 1000, 500)]
    ck = str(tmp_path / "ckpt")
    info = s1.checkpoint(ck)
    assert info["shards"] == 3
    s1.shutdown()  # simulated crash after checkpoint

    s2 = StreamingWindowSession.restore(ck, "k", "ts", "v")
    outs += [s2.feed(_mk(keys[i : i + 500], ts[i : i + 500], vals[i : i + 500])) for i in range(1000, n, 500)]
    outs.append(s2.drain())
    s2.shutdown()
    got = pa.concat_tables(outs).to_pandas().sort_values(["key", "wstart"], ignore_index=True)
    assert got.equals(uninterrupted())


def test_sessionizer_checkpoint_restore_continues_exactly(ray_session, tmp_path):
    from wprdc_etl_ray.pipelines.window import StreamingSessionizer

    rng = np.random.default_rng(73)
    n = 2000
    ts = np.cumsum(rng.integers(0, 30, n)) + rng.integers(-15, 16, n)
    keys = rng.choice(["a", "b", "c"], n)

    def uninterrupted():
        s = StreamingSessionizer("k", "ts", gap_us=120, allowed_lateness_us=40, num_shards=3)
        outs = [s.feed(_mk(keys[i : i + 400], ts[i : i + 400], np.zeros(min(400, n - i)))) for i in range(0, n, 400)]
        outs.append(s.drain())
        s.shutdown()
        return pa.concat_tables(outs).to_pandas().sort_values(["key", "session_start"], ignore_index=True)

    s1 = StreamingSessionizer("k", "ts", gap_us=120, allowed_lateness_us=40, num_shards=3)
    outs = [s1.feed(_mk(keys[i : i + 400], ts[i : i + 400], np.zeros(400))) for i in range(0, 800, 400)]
    ck = str(tmp_path / "ckpt")
    s1.checkpoint(ck)
    s1.shutdown()

    s2 = StreamingSessionizer.restore(ck, "k", "ts")
    outs += [s2.feed(_mk(keys[i : i + 400], ts[i : i + 400], np.zeros(min(400, n - i)))) for i in range(800, n, 400)]
    outs.append(s2.drain())
    s2.shutdown()
    got = pa.concat_tables(outs).to_pandas().sort_values(["key", "session_start"], ignore_index=True)
    assert got.equals(uninterrupted())


def test_bench_window_smoke(ray_session, monkeypatch):
    """bench.py --window path: tiny in-session run; the in-run
    exactly-once assertion (emitted == distinct (key,window)) is the
    real check."""
    monkeypatch.setenv("GRAFT_BENCH_EVENTS", "50000")
    monkeypatch.setenv("GRAFT_WINDOW_WAVES", "3")
    monkeypatch.setenv("GRAFT_WINDOW_SHARDS", "4")
    import importlib

    import bench

    importlib.reload(bench)  # re-read env-derived module constants
    out = bench.run_window()
    assert out["events"] == 50000
    assert out["windows_emitted"] > 0
    assert out["value"] > 0

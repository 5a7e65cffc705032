"""Benchmark harness (BASELINE.md).

Headline: change-events/sec end-to-end for the flagship CDC pipeline
(WAL tail → validate → hash-partition → LWW upsert merge → per-partition
Parquet write → two-phase manifest commit) on a deterministic synthetic
WAL sized to the scale factor, plus per-query timings for the main
operator pipelines over $GRAFT_SF_DIR tables.

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "events": N, "events_per_sec": N}

--scaling: runs the same job in two fresh taskset-pinned processes at
N and 4N cores (default 4 vs 16 — see run_scaling docstring and
BASELINE.md for why, incl. the hardware-ceiling controls) and reports
both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.chdir(REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TMP = "/tmp/graft_bench"



def _host_memcopy_gbps() -> float:
    """Single-thread DRAM-copy control (GB/s). This VM's co-tenant noise
    shows up here first (usual ~5; degraded hours read 0.04-0.2), so the
    committed BENCH JSON carries its own interpretability signal —
    compare wall-times across rounds ONLY at similar control readings
    (BASELINE.md harness notes)."""
    import numpy as _np
    import time as _time

    a = _np.ones(2 ** 26, dtype=_np.uint8)
    best = 0.0
    for _ in range(3):
        t0 = _time.perf_counter()
        a.copy()
        dt = _time.perf_counter() - t0
        best = max(best, a.nbytes / dt / 1e9)
    return round(best, 3)

def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def prepare_wal(sf: float) -> tuple[str, int]:
    """Deterministic WAL for the headline run, cached across bench runs.
    GRAFT_BENCH_EVENTS overrides the sf-derived size (used by --scaling
    to make the job long enough that compute dominates fixed overhead)."""
    from wprdc_etl_ray.gen import generate_change_log, write_wal

    n_events = int(os.environ.get("GRAFT_BENCH_EVENTS", 0)) or max(
        20_000, int(6_000_000 * sf)
    )
    out = os.path.join(BENCH_TMP, f"wal-{n_events}")
    marker = os.path.join(out, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        log = generate_change_log(n_events, seed=42)
        write_wal(out, log, segment_rows=max(25_000, n_events // 32), evolve_at=0.6)
        with open(marker, "w") as f:
            f.write(str(n_events))
    return os.path.join(out, "wal"), n_events


def run_bench() -> dict:
    import ray

    # pre-init control: the end-of-run reading (host_memcopy_gbps)
    # competes with the live raylet, so it reads low even in healthy
    # hours (r4 harness note); the pair brackets the window honestly
    control_pre = _host_memcopy_gbps()

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from wprdc_etl_ray.pipelines.cdc import CDCConfig, run_ingest
    from wprdc_etl_ray.pipelines import queries as Q

    sf = _sf_of(SF_DIR)
    wal, n_events = prepare_wal(sf)

    # warm the page cache (untimed pass over the WAL + tables)
    import pyarrow.parquet as pq
    import glob as _glob

    for p in _glob.glob(os.path.join(wal, "*.parquet")):
        pq.read_table(p)
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))

    # warm the Ray worker pool (untimed): throughput should measure the
    # pipeline, not one-time worker process spin-up
    import ray.data as rd

    rd.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    # warm the generic direct-exchange actor pool (untimed) — it is a
    # per-session resource, spawned once, same as the worker pool above
    from wprdc_etl_ray.functions.relational import _exchange_pool

    _exchange_pool(16)

    # headline: full CDC ingest into a fresh table (includes commit).
    # min of 2 runs — the sandbox VM shows a few % CPU steal, and the
    # min is the steadiest estimator of pipeline cost under that noise.
    # The layout (B, salt) is FIXED so the 8- and 32-CPU scaling runs
    # execute the identical job.
    cfg = CDCConfig(num_partitions=64, salt=8)
    cdc_sec = float("inf")
    for _ in range(3 if "--cdc-only" in sys.argv else 2):
        table_root = os.path.join(BENCH_TMP, f"table-{NUM_CPUS}")
        shutil.rmtree(table_root, ignore_errors=True)
        t0 = time.perf_counter()
        res = run_ingest(wal, table_root, cfg)
        cdc_sec = min(cdc_sec, time.perf_counter() - t0)
        assert res.events_read == n_events, (res.events_read, n_events)

    timings: dict[str, float] = {"cdc_ingest": round(cdc_sec, 3)}

    if "--cdc-only" not in sys.argv:
        # MOR variant (round-3 session 4): the same WAL applied in two
        # epochs with write_mode='mor' — epoch 2 appends delta runs
        # instead of rewriting slots. One run (headline stays
        # cdc_ingest); write-amplification evidence is the
        # deterministic bytes probe in BASELINE.md, this entry tracks
        # the wall-time of the delta path.
        half_dir = os.path.join(BENCH_TMP, f"wal-half-{n_events}-{NUM_CPUS}")
        if not os.path.isdir(half_dir):
            os.makedirs(half_dir)
            segs = sorted(_glob.glob(os.path.join(wal, "seg-*.parquet")))
            for s in segs[: len(segs) // 2]:
                os.link(s, os.path.join(half_dir, os.path.basename(s)))
        mor_cfg = CDCConfig(num_partitions=64, salt=8, write_mode="mor")
        mor_root = os.path.join(BENCH_TMP, f"table-mor-{NUM_CPUS}")
        shutil.rmtree(mor_root, ignore_errors=True)
        t0 = time.perf_counter()
        run_ingest(half_dir, mor_root, mor_cfg)
        run_ingest(wal, mor_root, mor_cfg)
        timings["mor_ingest"] = round(time.perf_counter() - t0, 3)

    if "--cdc-only" in sys.argv:
        result = {
            "metric": "cdc_ingest",
            "value": round(cdc_sec, 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "num_cpus": NUM_CPUS,
            "events": n_events,
            "events_per_sec": round(n_events / cdc_sec, 1),
            "host_memcopy_gbps": _host_memcopy_gbps(),
            "host_memcopy_gbps_pre": control_pre,
        }
        ray.shutdown()
        return result

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn(SF_DIR)
        # force execution
        import ray.data as rd

        if isinstance(out, rd.Dataset):
            out.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    timed("pricing_summary", Q.q_pricing_summary)
    timed("segment_revenue", Q.q_segment_revenue)
    timed("latest_event_per_user", Q.q_latest_event_per_user)
    timed("event_windows", Q.q_event_windows)
    timed("dedup_exact", Q.q_dedup_exact)
    timed("token_stats", Q.q_token_stats)
    timed("knn_all", Q.q_knn_all)
    timed("minhash_pairs", Q.q_minhash_pairs)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "cdc_ingest_plus_operator_suite",
        "host_memcopy_gbps_pre": control_pre,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "host_memcopy_gbps": _host_memcopy_gbps(),
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "events": n_events,
        "events_per_sec": round(n_events / cdc_sec, 1),
    }
    ray.shutdown()
    return result


def run_tail() -> dict:
    """Tail-mode throughput: the same WAL delivered in segment WAVES to
    a live TailSession (stateful merger actors), poll+commit per wave —
    the north rule's "tail -> upsert -> committed Parquet" measured in
    its incremental form (the headline measures the batch replay form;
    both share the merge/commit machinery)."""
    import glob as _glob

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from wprdc_etl_ray.pipelines.cdc import CDCConfig
    from wprdc_etl_ray.pipelines.tail import TailSession

    sf = _sf_of(SF_DIR)
    wal, n_events = prepare_wal(sf)
    segs = sorted(_glob.glob(os.path.join(wal, "seg-*.parquet")))
    waves = int(os.environ.get("GRAFT_TAIL_WAVES", "4"))
    per = (len(segs) + waves - 1) // waves

    live_wal = os.path.join(BENCH_TMP, f"tail-wal-{NUM_CPUS}")
    root = os.path.join(BENCH_TMP, f"tail-table-{NUM_CPUS}")
    shutil.rmtree(live_wal, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(live_wal)

    # warm untimed, mirroring run_bench: page cache, Ray worker pool,
    # and the session's merger actors (spawn is one-time session setup —
    # a live tailer runs for hours; waves measure steady-state throughput)
    import pyarrow.parquet as pq

    for p in segs:
        pq.read_table(p)
    import ray.data as rd

    rd.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    write_mode = os.environ.get("GRAFT_TAIL_WRITE_MODE", "cow")
    sess = TailSession(
        live_wal,
        root,
        CDCConfig(num_partitions=64, write_mode=write_mode),
        num_actors=16,
    )
    sess.ready()
    t0 = time.perf_counter()
    applied = 0
    for w in range(waves):
        for s_ in segs[w * per : (w + 1) * per]:
            os.link(s_, os.path.join(live_wal, os.path.basename(s_)))
        applied += sess.poll()
        sess.commit()
    wall = time.perf_counter() - t0
    sess.shutdown()
    assert applied == n_events, (applied, n_events)
    result = {
        "metric": "cdc_tail_mode",
        "value": round(wall, 3),
        "unit": "sec",
        "events": n_events,
        "waves": waves,
        "write_mode": write_mode,
        "num_cpus": NUM_CPUS,
        "events_per_sec": round(n_events / wall, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same headline job at N and 4N CPUs in fresh processes — the
    sandbox proxy for the north rule's N vs 4N node criterion.

    Each level runs under ``taskset`` CPU affinity so the WHOLE process
    tree (Ray workers, plasma store, Arrow IO threads) is bounded by N
    cores — ``ray.init(num_cpus=N)`` alone only limits task slots, and
    unpinned helper threads silently inflate small-N throughput.

    Default pair 4 vs 16: a pure-ALU control (64 independent Ray tasks
    doing arithmetic) scales 8->32 at only ~2.7x on this VM — the 32
    vCPUs are host-oversubscribed above ~16 — so 8 vs 32 measures the
    host's ceiling, not the engine. 4 vs 16 stays within true physical
    parallelism. Both pairs are recorded in BASELINE.md.
    Override with GRAFT_SCALING_LEVELS="8,32".
    """
    levels = [
        int(x)
        for x in os.environ.get("GRAFT_SCALING_LEVELS", "4,16").split(",")
    ]
    lo, hi = levels[0], levels[1]
    outs = {}
    scaling_events = os.environ.get("GRAFT_SCALING_EVENTS", "24000000")
    for ncpu in (lo, hi):
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_EVENTS=scaling_events
        )
        proc = subprocess.run(
            ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
             os.path.join(REPO, "bench.py"), "--cdc-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        outs[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
        time.sleep(10)  # let the previous raylet fully tear down
    t_lo = outs[lo]["queries"]["cdc_ingest"]
    t_hi = outs[hi]["queries"]["cdc_ingest"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "cdc_ingest_scaling",
        "unit": "sec",
        "levels": [lo, hi],
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        "events": outs[lo]["events"],
        f"events_per_sec_{lo}": round(outs[lo]["events"] / t_lo, 1),
        f"events_per_sec_{hi}": round(outs[hi]["events"] / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "host_memcopy_gbps": _host_memcopy_gbps(),
    }


def run_window() -> dict:
    """Streaming tumbling-window throughput: a deterministic synthetic
    key/ts/value stream delivered in time-ordered WAVES to a live
    StreamingWindowSession via ``feed_dataset`` (partials computed in
    map_batches tasks, routed straight to the shard actors) + one final
    drain. Exactly-once checked: emitted (key, wstart) rows must equal
    the stream's distinct (key, window) count."""
    import numpy as np
    import pyarrow as pa

    import ray

    owns_ray = not ray.is_initialized()  # pytest feeds a live session
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from wprdc_etl_ray.pipelines.window import StreamingWindowSession

    n = int(os.environ.get("GRAFT_BENCH_EVENTS", 0)) or 6_000_000
    waves = int(os.environ.get("GRAFT_WINDOW_WAVES", "6"))
    n_keys = 10_000
    width_us = 60_000_000  # 1-minute windows
    lateness_us = 1_000_000

    rng = np.random.default_rng(9)
    pool = np.array([f"u{i:05d}" for i in range(n_keys)])
    keys = pool[rng.integers(0, n_keys, n)]
    # ~50 µs between events, disorder ≪ lateness
    ts = np.arange(n, dtype=np.int64) * 50 + rng.integers(0, 20_000, n)
    vals = rng.integers(0, 1000, n).astype(np.int64)
    import pandas as pd

    exact_windows = (
        pd.DataFrame({"k": keys, "w": ts // width_us}).drop_duplicates().shape[0]
    )

    # per-wave Datasets built (and object-store-put) OUTSIDE the timer:
    # stream generation is not the stage under test
    blocks_per_wave = max(4, NUM_CPUS)
    per = (n + waves - 1) // waves
    wave_ds = []
    for w in range(waves):
        lo, hi = w * per, min(n, (w + 1) * per)
        if hi <= lo:
            continue  # more waves than events: skip empty waves
        tables = []
        step = (hi - lo + blocks_per_wave - 1) // blocks_per_wave
        for b in range(lo, hi, step):
            e = min(hi, b + step)
            tables.append(
                pa.table(
                    {
                        "k": pa.array(keys[b:e]),
                        "ts": pa.array(ts[b:e]).cast(pa.timestamp("us")),
                        "v": pa.array(vals[b:e]),
                    }
                )
            )
        wave_ds.append(ray.data.from_arrow(tables))

    sess = StreamingWindowSession(
        "k", "ts", "v", width_us=width_us,
        allowed_lateness_us=lateness_us,
        num_shards=int(os.environ.get("GRAFT_WINDOW_SHARDS", "8")),
    )
    # warm the Ray worker pool untimed (actor spawn already happened in
    # the session constructor); feeding real rows twice would double the
    # window partials, so the warm-up is a no-op map, not a warm wave
    ray.data.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    t0 = time.time()
    emitted = 0
    for ds in wave_ds:
        out = sess.feed_dataset(ds)
        emitted += out.num_rows
    emitted += sess.drain().num_rows
    wall = time.time() - t0
    if emitted != exact_windows:
        raise AssertionError(
            f"exactly-once violated: emitted {emitted} != {exact_windows}"
        )
    if owns_ray:
        ray.shutdown()
    return {
        "metric": "streaming_window_feed_dataset",
        "value": round(wall, 3),
        "unit": "sec",
        "events": n,
        "waves": waves,
        "windows_emitted": emitted,
        "events_per_sec": round(n / wall, 1),
        "num_cpus": NUM_CPUS,
        "host_memcopy_gbps": _host_memcopy_gbps(),
    }


def run_window_scaling() -> dict:
    """run_scaling for the STREAMING WINDOW subsystem (the r4 verdict's
    only major path with no two-level evidence): the same feed_dataset
    waves at N and 4N taskset-pinned cores in fresh processes; shard
    count stays fixed so cores are the only variable."""
    levels = [
        int(x)
        for x in os.environ.get("GRAFT_SCALING_LEVELS", "4,16").split(",")
    ]
    lo, hi = levels[0], levels[1]
    outs = {}
    # defaults chosen so parallel work dominates the per-wave fixed
    # costs (finalize round, actor RPC): 96 M events over 3 waves with
    # 16 shard actors FIXED at both levels (the tail-probe methodology:
    # at the low level the actors timeshare, like a smaller cluster).
    # 6 M-event runs measure orchestration latency, not scaling — both
    # data points are recorded in BASELINE.md.
    scaling_events = os.environ.get("GRAFT_WINDOW_SCALING_EVENTS", "96000000")
    for ncpu in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_EVENTS=scaling_events,
            GRAFT_WINDOW_WAVES=os.environ.get("GRAFT_WINDOW_WAVES", "3"),
            GRAFT_WINDOW_SHARDS=os.environ.get("GRAFT_WINDOW_SHARDS", "16"),
        )
        proc = subprocess.run(
            ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
             os.path.join(REPO, "bench.py"), "--window"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        outs[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
        time.sleep(10)
    t_lo = outs[lo]["value"]
    t_hi = outs[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "streaming_window_scaling",
        "unit": "sec",
        "levels": [lo, hi],
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        "events": outs[lo]["events"],
        f"events_per_sec_{lo}": round(outs[lo]["events"] / t_lo, 1),
        f"events_per_sec_{hi}": round(outs[hi]["events"] / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "host_memcopy_gbps": _host_memcopy_gbps(),
    }


def run_tail_scaling() -> dict:
    """The run_scaling measurement for TAIL mode (the north-rule
    tailer's stateful merger actors are the stage under test): the same
    WAL waves at N and 4N taskset-pinned cores in fresh processes.
    Actor count stays fixed (16) at both levels so the only variable is
    cores — at the low level the actors timeshare, which is exactly
    what a smaller cluster does. Override the pair with
    GRAFT_SCALING_LEVELS, the size with GRAFT_TAIL_SCALING_EVENTS."""
    levels = [
        int(x)
        for x in os.environ.get("GRAFT_SCALING_LEVELS", "4,16").split(",")
    ]
    lo, hi = levels[0], levels[1]
    outs = {}
    scaling_events = os.environ.get("GRAFT_TAIL_SCALING_EVENTS", "6000000")
    for ncpu in (lo, hi):
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_EVENTS=scaling_events
        )
        proc = subprocess.run(
            ["taskset", "-c", f"0-{ncpu - 1}", sys.executable,
             os.path.join(REPO, "bench.py"), "--tail"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        outs[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
        time.sleep(10)
    t_lo = outs[lo]["value"]
    t_hi = outs[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "cdc_tail_scaling",
        "unit": "sec",
        "levels": [lo, hi],
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        "events": outs[lo]["events"],
        f"events_per_sec_{lo}": round(outs[lo]["events"] / t_lo, 1),
        f"events_per_sec_{hi}": round(outs[hi]["events"] / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "host_memcopy_gbps": _host_memcopy_gbps(),
    }


if __name__ == "__main__":
    if "--tail-scaling" in sys.argv:
        print(json.dumps(run_tail_scaling()))
    elif "--window-scaling" in sys.argv:
        print(json.dumps(run_window_scaling()))
    elif "--window" in sys.argv:
        print(json.dumps(run_window()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--tail" in sys.argv:
        print(json.dumps(run_tail()))
    else:
        print(json.dumps(run_bench()))

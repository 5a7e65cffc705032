"""Tail-mode COW vs MOR wall-time probe in the regime that matters:
a LARGE resident table taking SMALL micro-batch commits.

At sandbox scale a fresh table's slots are tiny, so COW's per-commit
rewrite costs the same as MOR's delta append and the modes measure par
(bench.py --tail). The 10^10-event regime is different: the resident
partition dwarfs each wave, so COW rewrites O(table) per commit while
MOR appends O(delta). This probe builds that regime small — a 5.5M-row
table, then 12 waves of 50k events, poll+commit each — and measures
both modes end-to-end (same WAL, same layout, tables verified equal
by the MOR test suite's machinery).

Measured (healthy host, 32 CPUs): cow 7.69 s vs mor 3.73 s = 2.06×,
and the gap scales with table/delta ratio (BASELINE.md).

Usage: python scripts/tail_mor_probe.py [base_events] [wave_events] [waves]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    base_events = int(sys.argv[1]) if len(sys.argv) > 1 else 5_500_000
    wave_events = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    waves = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    total = base_events + wave_events * waves

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from wprdc_etl_ray.gen import generate_change_log, write_wal
    from wprdc_etl_ray.pipelines.cdc import CDCConfig, run_ingest
    from wprdc_etl_ray.pipelines.tail import TailSession

    base = "/tmp/graft_tailmor_probe"
    marker = os.path.join(base, f".done-{total}-{wave_events}")
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        log = generate_change_log(total, seed=42)
        write_wal(base, log, segment_rows=wave_events)
        open(marker, "w").write("ok")
    segs = sorted(glob.glob(os.path.join(base, "wal", "seg-*.parquet")))
    n_base = base_events // wave_events
    base_segs, tail_segs = segs[:n_base], segs[n_base : n_base + waves]

    out: dict = {
        "base_events": base_events,
        "wave_events": wave_events,
        "waves": waves,
    }
    for mode in ("cow", "mor"):
        root, live = f"{base}/t_{mode}", f"{base}/live_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(live, ignore_errors=True)
        os.makedirs(live)
        bw = f"{base}/bw_{mode}"
        shutil.rmtree(bw, ignore_errors=True)
        os.makedirs(bw)
        for s in base_segs:
            os.link(s, os.path.join(bw, os.path.basename(s)))
        run_ingest(bw, root, CDCConfig(num_partitions=64))
        sess = TailSession(
            live, root, CDCConfig(num_partitions=64, write_mode=mode), num_actors=16
        )
        sess.ready()
        t0 = time.perf_counter()
        applied = 0
        for s in tail_segs:
            os.link(s, os.path.join(live, os.path.basename(s)))
            applied += sess.poll()
            sess.commit()
        dt = time.perf_counter() - t0
        sess.shutdown()
        out[mode] = {"sec": round(dt, 3), "events": applied}
    out["speedup"] = round(out["cow"]["sec"] / out["mor"]["sec"], 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

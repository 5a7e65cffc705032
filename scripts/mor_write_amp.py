"""Write-amplification evidence: COW vs MOR over K incremental epochs.

Bytes written are DETERMINISTIC (independent of host load), so this
probe is valid even in degraded-DRAM hours where wall-clock is not.
It ingests the same WAL in K cumulative epochs under both write modes,
reports cumulative data bytes written per mode plus the per-epoch
breakdown, and asserts the two tables read identically.

Usage: python scripts/mor_write_amp.py [n_events] [k_epochs]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def data_bytes(root: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True)
    )


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from wprdc_etl_ray.gen import generate_change_log, write_wal
    from wprdc_etl_ray.pipelines.cdc import (
        CDCConfig,
        read_transcripts_arrow,
        run_ingest,
    )

    base = "/tmp/graft_mor_amp"
    shutil.rmtree(base, ignore_errors=True)
    log = generate_change_log(n_events, seed=42)
    write_wal(base, log, segment_rows=max(1000, n_events // (4 * k)))
    segs = sorted(glob.glob(os.path.join(base, "wal", "seg-*.parquet")))
    epoch_dirs = []
    for i in range(1, k + 1):
        d = os.path.join(base, f"we{i}")
        os.makedirs(d)
        for s in segs[: round(i * len(segs) / k)]:
            os.link(s, os.path.join(d, os.path.basename(s)))
        epoch_dirs.append(d)

    out: dict = {"n_events": n_events, "k_epochs": k, "modes": {}}
    for mode in ("cow", "mor"):
        root = os.path.join(base, f"t_{mode}")
        per_epoch = []
        prev = 0
        for d in epoch_dirs:
            run_ingest(
                d, root, CDCConfig(num_partitions=32, write_mode=mode)
            )
            cur = data_bytes(root)
            per_epoch.append(cur - prev)
            prev = cur
        out["modes"][mode] = {"total_bytes": prev, "per_epoch_bytes": per_epoch}

    a = read_transcripts_arrow(os.path.join(base, "t_cow"))
    b = read_transcripts_arrow(os.path.join(base, "t_mor"))
    out["tables_equal"] = a.equals(b.cast(a.schema))
    out["amplification_ratio"] = round(
        out["modes"]["cow"]["total_bytes"] / out["modes"]["mor"]["total_bytes"], 3
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

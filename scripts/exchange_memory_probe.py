"""Receiver-memory evidence for the generic direct exchange at 24M rows
(BASELINE.md "generic exchange memory bounds").

Runs `bucketed_group_map` over a 24M-row keyed input twice:

- REDUCIBLE: a per-key sum kernel passed as `pre_reduce` — receivers
  compact buffers to one row per key whenever a bucket exceeds
  `compact_rows`, so actor heap stays O(distinct keys per actor)
  regardless of input size (verified via the actors' lifetime
  compaction counters + correct global sums).
- NON-REDUCIBLE: the same kernel withheld from `pre_reduce`, with a
  deliberately small `spill_rows` budget — receivers must spill to
  node-local parquet instead of buffering their whole share (verified
  via the spill counters + correct global sums).

Prints one JSON line. Usage: python scripts/exchange_memory_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

N_ROWS = int(os.environ.get("GRAFT_PROBE_ROWS", 24_000_000))
N_KEYS = 2_000_000
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def make_input() -> "ray.data.Dataset":
    import ray.data

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        # NB: int64 * uint64 silently promotes to float64 in numpy —
        # cast to uint64 FIRST or the keys collapse to a handful
        key = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
            N_KEYS
        )
        return pa.table(
            {"k": pa.array(key.astype(np.int64)), "v": pa.array(ids.astype(np.int64))}
        )

    return ray.data.range(N_ROWS).map_batches(attach, batch_format="pyarrow")


def per_key_sum(b: pd.DataFrame) -> pd.DataFrame:
    return b.groupby("k", sort=False)["v"].sum().reset_index()


def pool_stats() -> dict:
    from wprdc_etl_ray.functions.relational import _POOL

    stats = ray.get([a.lifetime_stats.remote() for a in _POOL])
    return {
        "spills": sum(s["spills"] for s in stats),
        "compactions": sum(s["compactions"] for s in stats),
    }


def run_case(name: str, **kwargs) -> dict:
    from wprdc_etl_ray.functions.relational import bucketed_group_map

    before = pool_stats() if name != "first" else {"spills": 0, "compactions": 0}
    t0 = time.perf_counter()
    out = bucketed_group_map(
        make_input(), ["k"], per_key_sum, num_buckets=64, exchange="direct", **kwargs
    )
    # consume + checksum: total must equal sum(0..N-1)
    tot = 0
    rows = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        tot += int(pa.compute.sum(b.column("v")).as_py())
        rows += b.num_rows
    wall = time.perf_counter() - t0
    after = pool_stats()
    assert tot == N_ROWS * (N_ROWS - 1) // 2, (tot, name)
    return {
        "wall_sec": round(wall, 2),
        "out_keys": rows,
        "spills": after["spills"] - before["spills"],
        "compactions": after["compactions"] - before["compactions"],
    }


def main() -> None:
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from wprdc_etl_ray.functions.relational import _exchange_pool

    _exchange_pool(16)  # warm the pool so both cases pay no spawn

    # thresholds scale with input so the probe exercises both bounds
    # at any GRAFT_PROBE_ROWS (defaults match the 24M headline run)
    reducible = run_case(
        "first",
        pre_reduce=per_key_sum,
        compact_rows=max(20_000, N_ROWS // 120),
        spill_rows=max(4_000_000, N_ROWS // 6),
    )
    # small budget: each of 16 actors owns ~N/16 = 1.5M rows; a 400k-row
    # budget forces ~(1.5M/400k)·16 spill events minimum
    non_reducible = run_case("second", spill_rows=max(40_000, N_ROWS // 60))

    result = {
        "metric": "exchange_memory_probe",
        "rows": N_ROWS,
        "distinct_keys": N_KEYS,
        "num_cpus": NUM_CPUS,
        "reducible": reducible,
        "non_reducible": non_reducible,
        "bounds": {
            "reducible": "actor heap O(keys/actor): compaction counters > 0, zero spills needed",
            "non_reducible": "actor heap <= spill_rows rows: spill counters > 0, finalize streams one bucket at a time",
        },
    }
    assert reducible["compactions"] > 0, "reducible case never compacted"
    assert non_reducible["spills"] > 0, "non-reducible case never spilled"
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()

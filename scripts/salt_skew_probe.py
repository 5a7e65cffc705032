"""Zipf-skew probe for salted_group_map (round-4 verdict item 8).

One hot key holding ~35% of all rows serializes bucketed_group_map's
hot bucket into a single task; salted_group_map splits the hot key
across `salt` sub-buckets and recombines partials. This probe runs an
associative per-key sum/count/min/max kernel over a skewed input at
both operators, asserts byte-equality, and reports the wall-time gap
plus the per-bucket row spread (the skew the salt removes).

Usage: python scripts/salt_skew_probe.py [ROWS] [SALT]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


K = 64


def kernel(g: pd.DataFrame) -> pd.DataFrame:
    """Associative same-schema kernel whose cost scales with the rows it
    sees: per-key top-K by (v DESC, id ASC) — top-K of concatenated
    top-Ks IS the global top-K (unique total order via id), and the
    per-bucket sort is the serial work a hot key concentrates."""
    s = g.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
    return s.groupby("k", sort=False).head(K)[["k", "id", "v"]]


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    salt = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from wprdc_etl_ray.functions.relational import (
        bucketed_group_map,
        salted_group_map,
    )

    rng = np.random.default_rng(7)
    # zipf-ish: key 0 takes HOT_SHARE of rows, tail spread over 40k keys
    hot = rng.random(rows) < float(os.environ.get("HOT_SHARE", "0.35"))
    keys = np.where(hot, 0, rng.integers(1, 40_000, rows)).astype("int64")
    v = rng.integers(0, 1000, rows).astype("int64")
    df = pd.DataFrame({"k": keys, "id": np.arange(rows, dtype="int64"), "v": v})
    ds = rd.from_pandas(df).repartition(64).materialize()
    print(f"rows={rows} hot-key share={hot.mean():.2f} salt={salt}")

    def run(tag, fn):
        best = None
        for _ in range(2):  # min-of-2 absorbs warm-pool spawn
            t0 = time.time()
            out = fn().to_pandas()
            w = time.time() - t0
            best = w if best is None else min(best, w)
        return best, out.sort_values(["k", "id"], ignore_index=True)

    w_plain, r_plain = run(
        "plain",
        lambda: bucketed_group_map(ds, ["k"], kernel, num_buckets=16,
                                   pre_reduce=kernel, exchange="direct"),
    )
    w_salt, r_salt = run(
        "salted",
        lambda: salted_group_map(ds, ["k"], kernel, num_buckets=16,
                                 salt=salt, exchange="direct"),
    )
    pd.testing.assert_frame_equal(r_plain, r_salt)
    print(f"plain  wall {w_plain:6.2f}s   (hot bucket holds ~{hot.mean():.0%} of rows)")
    print(f"salted wall {w_salt:6.2f}s   speedup {w_plain / w_salt:4.2f}x; outputs byte-equal")
    ray.shutdown()


if __name__ == "__main__":
    main()

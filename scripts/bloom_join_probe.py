"""Deterministic bloom-join evidence (host-noise-free: ROW COUNTS, not
wall time — the mor_write_amp.py pattern).

Measures how many big-side rows survive the bloom prefilter before the
join's all-to-all exchange, vs the true match count, over the sf
tables: lineitem (big) x a selective part subset (small). At 100 TB
the surviving fraction IS the fraction of the big side that pays
serialization + network for the shuffle.

Usage: python scripts/bloom_join_probe.py [sf_dir]
Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.compute as pc

import ray


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from wprdc_etl_ray.functions.relational import (
        bloom_semi_filter,
        build_key_bloom,
        filter_batches,
        hash_join,
        read_table,
    )

    big = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    small = filter_batches(
        read_table(sf_dir, "part", columns=["p_partkey", "p_size"]),
        lambda t: pc.less_equal(t.column("p_size"), 3),  # ~6% of parts
    )

    total = big.count()
    bf = build_key_bloom(small, ["p_partkey"])
    kept = bloom_semi_filter(big, bf, ["l_partkey"]).count()
    true_matches = hash_join(
        big, small, on="l_partkey", right_on="p_partkey"
    ).count()

    out = {
        "metric": "bloom_join_prefilter",
        "sf_dir": sf_dir,
        "big_rows": int(total),
        "kept_rows": int(kept),
        "true_match_rows": int(true_matches),
        "exchange_reduction": round(total / max(kept, 1), 2),
        "fp_overhead_rows": int(kept - true_matches),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Driver-style correctness check: run every queries() entry and compare
against its oracle_sql() via DuckDB (row count + schema + order-
insensitive values), the way CORRECTNESS_r{N}.json is produced.

Usage: python scripts/check_queries.py [sf_dir] [query ...]

Note: a few oracles are bound to sf0.01 BY CONSTRUCTION (the scale the
driver compares at): cdc_* embed the sf0.01 WAL path, ivf_* /
cosine_lsh_pairs / dedup_clusters inline centroids/planes derived from
the sf0.01 tables. Running those at another sf mismatches by design;
every other query is sf-agnostic (aggregates verified at sf0.1 too).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if len(mine) != len(oracle):
        problems.append(f"rows {len(mine)} != {len(oracle)}")
    a, b = canon(mine), canon(oracle)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} != {list(b.columns)}")
        return problems
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}] {a[c].dtype} != {b[c].dtype}")
    if problems:
        return problems
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        detail = []
        for c in bad_cols[:3]:
            i = int(neq[c].idxmax())
            detail.append(f"{c}@{i}: {a[c][i]!r} vs {b[c][i]!r}")
        problems.append(f"values differ in {bad_cols} ({'; '.join(detail)})")
    return problems


def main():
    # live stack dump for hang diagnosis: kill -USR1 <pid> prints all
    # thread tracebacks to stderr without killing the run
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    # DRIVER PARITY: the correctness driver runs at num_cpus=32, and
    # partition-count-dependent bugs (r03's corpus_freq_join: empty join
    # partitions appear only at 16 partitions) are invisible at 8. Gate
    # at 32 by default; CHECK_CPUS=8 reproduces the old low-CPU config.
    if not ray.is_initialized():
        cpus = int(os.environ.get("CHECK_CPUS", "32"))
        ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from wprdc_etl_ray.pipelines.queries import oracle_sql, queries

    qs, sqls = queries(), oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            ok = len(mine) >= 0
            print(f"rows  {name}: {len(mine)} rows ({dt:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            oracle = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {e}")
            n_fail += 1
            continue
        problems = compare(name, mine, oracle)
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    con.close()
    import ray

    ray.shutdown()  # explicit: a lingering session kept burning CPU once
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

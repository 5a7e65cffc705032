"""Generator determinism + oracle agreement (SURVEY.md §5.2 item 1)."""

import duckdb
import pyarrow.parquet as pq
import pytest

from wprdc_etl_ray.gen import (
    ORACLE_SQL,
    generate_change_log,
    replay_oracle_pandas,
    write_wal,
)
from wprdc_etl_ray.schema import CHANGE_SCHEMA_V1, CHANGE_SCHEMA_V2


def test_deterministic():
    a = generate_change_log(5000, seed=42)
    b = generate_change_log(5000, seed=42)
    assert a.equals(b)
    c = generate_change_log(5000, seed=43)
    assert not a.equals(c)


def test_offsets_monotone_unique():
    log = generate_change_log(5000, seed=1)
    offs = log.column("offset").to_pylist()
    assert offs == list(range(len(offs)))


def test_event_mix():
    log = generate_change_log(10000, seed=2)
    ops = set(log.column("op").to_pylist())
    assert ops == {"insert", "update", "delete"}
    # deletes carry key + ts only
    import pyarrow.compute as pc

    dels = log.filter(pc.equal(log.column("op"), "delete"))
    assert dels.num_rows > 0
    assert dels.column("text").null_count == dels.num_rows
    assert dels.column("conv_id").null_count == 0
    assert dels.column("ts").null_count == 0


def test_pandas_replay_matches_duckdb_window_oracle():
    log = generate_change_log(8000, seed=3)
    oracle = replay_oracle_pandas(log)
    con = duckdb.connect()
    con.register("changes", log)
    dk = con.execute(ORACLE_SQL.format(changes="changes")).arrow().cast(oracle.schema)
    assert dk.equals(oracle)


def test_wal_segments_schema_evolution(tmp_path):
    log = generate_change_log(4000, seed=4)
    paths = write_wal(str(tmp_path), log, segment_rows=1000, evolve_at=0.5)
    assert len(paths) == 4
    assert pq.read_schema(paths[0]).equals(CHANGE_SCHEMA_V1)
    assert pq.read_schema(paths[-1]).equals(CHANGE_SCHEMA_V2)
    # round trip covers every offset exactly once
    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == log.num_rows

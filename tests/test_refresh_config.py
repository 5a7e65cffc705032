"""Full-refresh path (reference method='insert' drop-and-recreate,
SURVEY.md §3.2) + settings-file config loader (C6)."""

import json

import pytest

from wprdc_etl_ray.config import get_config
from wprdc_etl_ray.errors import InvalidConfigError
from wprdc_etl_ray.gen import generate_change_log, replay_oracle_pandas, write_wal
from wprdc_etl_ray.pipelines.cdc import (
    CDCConfig,
    CDCPipeline,
    read_transcripts_arrow,
    run_ingest,
)
from wprdc_etl_ray.state.manifest import load_manifest


def test_refresh_replaces_table(ray_session, tmp_path):
    log_a = generate_change_log(3000, seed=21)
    log_b = generate_change_log(2000, seed=22)
    write_wal(str(tmp_path / "a"), log_a, segment_rows=1000)
    write_wal(str(tmp_path / "b"), log_b, segment_rows=1000)
    root = str(tmp_path / "t")

    run_ingest(str(tmp_path / "a" / "wal"), root, CDCConfig(num_partitions=8))
    m1 = load_manifest(root)
    assert m1["epoch"] == 1

    # full refresh from a DIFFERENT (shorter) WAL: offsets rewind — the
    # upsert path would refuse (watermark regression); refresh replaces.
    run_ingest(
        str(tmp_path / "b" / "wal"),
        root,
        CDCConfig(num_partitions=8, mode="refresh"),
    )
    m2 = load_manifest(root)
    assert m2["epoch"] == 2
    assert m2["global_watermark"] == 1999  # rewound to the new log
    oracle_b = replay_oracle_pandas(log_b)
    got = read_transcripts_arrow(root).select(oracle_b.schema.names).cast(oracle_b.schema)
    assert got.equals(oracle_b)  # table is ONLY the refreshed data


def test_builder_method_parity(ray_session, tmp_path):
    log = generate_change_log(2000, seed=23)
    write_wal(str(tmp_path), log, segment_rows=1000)
    p = (
        CDCPipeline("t")
        .source(str(tmp_path / "wal"))
        .partitions(4)
        .method("insert")
        .sink(str(tmp_path / "t"))
    )
    assert p.config.mode == "refresh"
    p.run()
    with pytest.raises(InvalidConfigError):
        CDCPipeline("t").method("bogus")


def test_settings_file_config(tmp_path):
    settings = {
        "transcripts": {
            "table_root": "/data/t",
            "wal_dir": "/data/w",
            "num_partitions": 256,
            "salt": 8,
            "strict": False,
        }
    }
    f = tmp_path / "settings.json"
    f.write_text(json.dumps(settings))
    cfg, extra = get_config(str(f), "transcripts")
    assert cfg.num_partitions == 256 and cfg.salt == 8 and cfg.strict is False
    assert cfg.table_name == "transcripts"
    assert extra == {"table_root": "/data/t", "wal_dir": "/data/w"}
    with pytest.raises(InvalidConfigError):
        get_config(str(f), "nope")
    with pytest.raises(InvalidConfigError):
        get_config(str(tmp_path / "missing.json"), "x")

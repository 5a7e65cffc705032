"""CLI end-to-end: init/gen/ingest/show/check/compact(--to-salt)/query
driven through main() in-process (reference manage.py parity, C7)."""

import json
import os

import pytest

from wprdc_etl_ray.cli import main
from wprdc_etl_ray.state.manifest import load_manifest


def run(capsys, *argv):
    main(list(argv))
    return capsys.readouterr().out


def test_cli_full_lifecycle(ray_session, tmp_path, capsys):
    wal_out = str(tmp_path / "w")
    root = str(tmp_path / "t")
    out = run(capsys, "gen", wal_out, "--events", "3000", "--segment-rows", "800")
    wal = json.loads(out.strip().splitlines()[-1])["wal"]

    out = run(capsys, "ingest", wal, root, "--partitions", "4", "--salt", "2")
    res = json.loads(out.strip().splitlines()[-1])
    assert res["events"] == 3000 and not res["skipped"]

    out = run(capsys, "show", root)
    m = json.loads(out)
    assert m["epoch"] == 1 and m["metrics"]["salt"] == 2

    with pytest.raises(SystemExit) as e:
        run(capsys, "check", root, wal)
    assert e.value.code == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["equal"]

    # re-salt migration via compact
    out = run(capsys, "compact", root, "--to-salt", "1")
    assert json.loads(out.strip().splitlines()[-1])["partitions"] == 4
    assert load_manifest(root)["metrics"]["salt"] == 1
    with pytest.raises(SystemExit) as e:
        run(capsys, "check", root, wal)
    assert e.value.code == 0


def test_cli_query_runner(ray_session, capsys):
    with pytest.raises(SystemExit) as e:
        run(capsys, "query", "list")
    assert e.value.code == 0
    names = json.loads(capsys.readouterr().out)["queries"]
    assert "value_bands" in names and "cdc_flagship" in names

    out = run(capsys, "query", "value_bands", "--sf-dir", "/root/testdata/sf0.001")
    assert json.loads(out.strip().splitlines()[-1])["rows"] == 3


def test_cli_point_read(ray_session, tmp_path, capsys):
    wal_out = str(tmp_path / "w")
    root = str(tmp_path / "t")
    out = run(capsys, "gen", wal_out, "--events", "2000", "--segment-rows", "800")
    wal = json.loads(out.strip().splitlines()[-1])["wal"]
    run(capsys, "ingest", wal, root, "--partitions", "4")
    out = run(capsys, "read", root, "--limit", "1")
    conv = json.loads(out.strip().splitlines()[0])["conv_id"]
    out = run(capsys, "read", root, "--conv", conv, "--limit", "5")
    rows = [json.loads(l) for l in out.strip().splitlines()]
    assert rows and all(r["conv_id"] == conv for r in rows)


def test_cli_changes_feed(ray_session, tmp_path, capsys):
    wal_out = str(tmp_path / "w")
    root = str(tmp_path / "t")
    out = run(capsys, "gen", wal_out, "--events", "2000", "--segment-rows", "400")
    wal = json.loads(out.strip().splitlines()[-1])["wal"]
    # two epochs: first 2 segments, then the rest
    import glob as _glob

    segs = sorted(_glob.glob(os.path.join(wal, "seg-*.parquet")))
    half = str(tmp_path / "w1")
    os.makedirs(half)
    for s in segs[:2]:
        os.link(s, os.path.join(half, os.path.basename(s)))
    run(capsys, "ingest", half, root, "--partitions", "4")
    run(capsys, "ingest", wal, root, "--partitions", "4")

    out = run(capsys, "changes", root, "--from", "1", "--limit", "5")
    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert all(r["change_type"] in ("insert", "update", "delete") for r in rows)
    assert all("conv_id" in r and "turn_idx" in r for r in rows)


def test_cli_table_services(ray_session, tmp_path, capsys):
    """The session-4 commands end to end: MOR ingest → tag → clone →
    index build/lookup → repartition → maintain → restore."""
    wal_out = str(tmp_path / "w")
    root = str(tmp_path / "t")
    out = run(capsys, "gen", wal_out, "--events", "3000", "--segment-rows", "800")
    wal = json.loads(out.strip().splitlines()[-1])["wal"]

    out = run(capsys, "ingest", wal, root, "--partitions", "4", "--write-mode", "mor")
    assert json.loads(out.strip().splitlines()[-1])["events"] == 3000

    out = run(capsys, "tag", root, "v1")
    assert json.loads(out.strip().splitlines()[-1])["v1"] == 1

    clone = str(tmp_path / "c")
    out = run(capsys, "clone", root, clone)
    assert json.loads(out.strip().splitlines()[-1])["epoch"] == 1

    out = run(capsys, "index", "build", root, "tool")
    assert json.loads(out.strip().splitlines()[-1])["pairs"] > 0
    out = run(capsys, "index", "refresh", root, "tool")
    assert json.loads(out.strip().splitlines()[-1])["refreshed"] is False

    out = run(capsys, "repartition", root, "--partitions", "8")
    assert json.loads(out.strip().splitlines()[-1])["epoch"] == 2
    assert load_manifest(root)["num_partitions"] == 8

    out = run(capsys, "maintain", root, "--keep-epochs", "1")
    assert "vacuum" in json.loads(out.strip().splitlines()[-1])

    # restore to the tag — epoch-1 files were vacuumed or kept; if kept,
    # the restore succeeds and the table reads at the old layout
    out = run(capsys, "show", root)
    assert json.loads(out)["epoch"] >= 2

    with pytest.raises(SystemExit) as e:
        run(capsys, "check", root, wal)
    assert e.value.code == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["equal"]


def test_cli_cluster_layout(ray_session, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    src = str(tmp_path / "in.parquet")
    pq.write_table(
        pa.table(
            {
                "id": np.arange(3000),
                "v": rng.integers(0, 1000, 3000),
                "w": rng.integers(0, 1000, 3000),
            }
        ),
        src,
    )
    out_dir = str(tmp_path / "clustered")
    out = run(capsys, "cluster", "write", out_dir, "--input", src, "--columns", "v", "--files", "4")
    assert json.loads(out.strip().splitlines()[-1])["rows"] == 3000
    out = run(capsys, "cluster", "plan", out_dir, "--lo", "100", "--hi", "150")
    plan = json.loads(out.strip().splitlines()[-1])["files"]
    assert 0 < len(plan) < 4

    z_dir = str(tmp_path / "z")
    out = run(capsys, "cluster", "write", z_dir, "--input", src, "--columns", "v,w", "--files", "16")
    assert json.loads(out.strip().splitlines()[-1])["files"] == 16
    out = run(capsys, "cluster", "plan", z_dir, "--lo", "100", "--hi", "200", "--b-lo", "800")
    zplan = json.loads(out.strip().splitlines()[-1])["files"]
    assert 0 < len(zplan) < 16

"""Source-connector parity tests (SURVEY.md §5.1: the reference's
connector/extractor test coverage — checksum, headers, delimiter,
mid-file header skip, coercion — re-expressed over Arrow batches)."""

import hashlib

import pyarrow as pa
import pytest

from wprdc_etl_ray.errors import ConnectorError, SchemaValidationError
from wprdc_etl_ray.sources.connectors import (
    file_checksum,
    http_connector,
    normalize_header,
    read_csv_source,
    remote_file_connector,
)

SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("amount", pa.float64()),
    ]
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("Id, Name ,Amount\n1,alpha,1.5\n2,beta,2.5\n")
    return str(p)


def test_file_checksum(csv_file):
    with open(csv_file, "rb") as f:
        expect = hashlib.md5(f.read()).hexdigest()
    assert file_checksum(csv_file) == expect


def test_normalize_header():
    assert normalize_header(" Order Key ") == "order_key"
    assert normalize_header("Weird-Name (x)") == "weird_name_x"


def test_csv_headers_normalized_and_coerced(ray_session, csv_file):
    out = read_csv_source(csv_file, schema=SCHEMA).take_all()
    assert out[0] == {"id": 1, "name": "alpha", "amount": 1.5}
    assert out[1]["id"] == 2


def test_csv_mid_file_repeated_header_skipped(ray_session, tmp_path):
    # two concatenated exports: the second header line must be dropped
    p = tmp_path / "cat.csv"
    p.write_text("id,name,amount\n1,alpha,1.5\nid,name,amount\n2,beta,2.5\n")
    out = read_csv_source(str(p), schema=SCHEMA).take_all()
    assert [r["id"] for r in out] == [1, 2]


def test_csv_custom_headers_and_delimiter(ray_session, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("1|alpha|1.5\n2|beta|2.5\n")
    out = read_csv_source(
        str(p), schema=SCHEMA, headers=["id", "name", "amount"], delimiter="|"
    ).take_all()
    assert [r["name"] for r in out] == ["alpha", "beta"]


def test_csv_required_null_strict_raises(ray_session, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,amount\n1,alpha,1.5\n,beta,2.5\n")
    with pytest.raises(Exception) as ei:
        read_csv_source(str(p), schema=SCHEMA, required=("id",)).take_all()
    assert "required" in str(ei.value) or "SchemaValidation" in str(ei.value)


def test_offline_connectors_raise():
    with pytest.raises(ConnectorError):
        remote_file_connector("https://example.org/x.csv")
    with pytest.raises(ConnectorError):
        http_connector("https://example.org/api")


def test_csv_encoding_latin1(ray_session, tmp_path):
    p = tmp_path / "l1.csv"
    p.write_bytes("id,name,amount\n1,café,1.5\n2,süß,2.5\n".encode("latin-1"))
    out = read_csv_source(str(p), schema=SCHEMA, encoding="latin-1").take_all()
    assert [r["name"] for r in out] == ["café", "süß"]


def test_resumable_write_skips_completed_partitions(ray_session, tmp_path):
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wprdc_etl_ray.sources.sinks import (
        completed_partitions,
        read_resumable,
        resumable_write,
    )

    out = str(tmp_path / "out")
    df = pd.DataFrame({"k": np.arange(100) % 4, "v": np.arange(100)})
    r1 = resumable_write(rd.from_pandas(df, override_num_blocks=3), out, "k")
    assert sorted(r1["written"]) == ["0", "1", "2", "3"] and not r1["skipped"]

    # simulate a crashed attempt: marker removed AND a stray partial
    # file left behind — the rerun must clear it, not append to it
    os.remove(os.path.join(out, "_SUCCESS-2"))
    r2 = resumable_write(rd.from_pandas(df, override_num_blocks=3), out, "k")
    assert r2["written"] == ["2"] and r2["skipped"] == ["0", "1", "3"]
    assert completed_partitions(out) == {"0", "1", "2", "3"}

    got = read_resumable(out).to_pandas()
    # hive partition values come back as strings
    got["k"] = got["k"].astype(str)
    assert set(got["v"][got["k"] == "2"]) == set(df["v"][df["k"] == 2])
    counts = got.groupby("k").size()
    # unmarked dirs are CLEARED before rewrite: exactly one copy per row
    assert all(counts.loc[str(k)] == 25 for k in range(4))


def test_remote_file_connector_file_url(ray_session, tmp_path):
    """S2/S3 connectors over file:// URLs (urllib serves them with no
    network; the same call handles http(s) where one exists)."""
    from wprdc_etl_ray.errors import ConnectorError
    from wprdc_etl_ray.sources.connectors import (
        fetch_url,
        http_connector,
        remote_file_connector,
    )

    src = tmp_path / "people.csv"
    src.write_text("Name,Favorite Color\nalice,red\nbob,blue\n")
    ds = remote_file_connector(f"file://{src}", format="csv")
    df = ds.to_pandas()
    assert list(df.columns) == ["name", "favorite_color"]  # normalized
    assert list(df["name"]) == ["alice", "bob"]

    j = tmp_path / "rows.json"
    j.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    jd = http_connector(f"file://{j}", format="json").to_pandas()
    assert sorted(jd["a"]) == [1, 2]

    import pytest as _pytest

    with _pytest.raises(ConnectorError):
        fetch_url("file:///nonexistent/definitely-missing.csv")
    with _pytest.raises(ConnectorError):
        fetch_url("gopher://host/x")
    with _pytest.raises(ConnectorError):
        remote_file_connector(f"file://{src}", format="xml")


def test_orc_and_ipc_roundtrip(ray_session, tmp_path):
    """ORC + Arrow-IPC sources/sinks: write via each format's writer,
    read back distributed (one task per file), column projection."""
    import pyarrow as pa
    import pyarrow.feather as feather
    import pyarrow.orc as paorc

    import ray.data as rd
    from wprdc_etl_ray.sources.connectors import (
        read_ipc_source,
        read_orc_source,
        write_orc_sink,
    )

    t1 = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    t2 = pa.table({"a": [4, 5], "b": ["u", "v"]})
    orc_dir = tmp_path / "orc"
    ipc_dir = tmp_path / "ipc"
    orc_dir.mkdir(); ipc_dir.mkdir()
    paorc.write_table(t1, str(orc_dir / "one.orc"))
    paorc.write_table(t2, str(orc_dir / "two.orc"))
    feather.write_feather(t1, str(ipc_dir / "one.arrow"))
    feather.write_feather(t2, str(ipc_dir / "two.arrow"))

    got = read_orc_source(str(orc_dir)).to_pandas().sort_values("a", ignore_index=True)
    assert got["a"].tolist() == [1, 2, 3, 4, 5]
    assert got["b"].tolist() == ["x", "y", "z", "u", "v"]

    proj = read_ipc_source(str(ipc_dir), columns=["a"]).to_pandas()
    assert sorted(proj["a"].tolist()) == [1, 2, 3, 4, 5]
    assert list(proj.columns) == ["a"]

    # sink: roundtrip through ORC and read back with the source
    n = write_orc_sink(rd.from_arrow(t1).union(rd.from_arrow(t2)), str(tmp_path / "out"))
    assert n >= 1
    back = read_orc_source(str(tmp_path / "out")).to_pandas()
    assert sorted(back["a"].tolist()) == [1, 2, 3, 4, 5]

    # remote (file://) path dispatch
    from wprdc_etl_ray.sources.connectors import remote_file_connector

    rds = remote_file_connector(f"file://{orc_dir}/one.orc", format="orc")
    assert rds.to_pandas()["a"].tolist() == [1, 2, 3]


def test_gzip_csv_and_json_sources(ray_session, tmp_path):
    """Arrow auto-detects gzip by extension — compressed exports read
    through the same extractor semantics (header normalization etc.)."""
    import gzip

    from wprdc_etl_ray.sources.connectors import read_csv_source, read_json_source

    with gzip.open(tmp_path / "d.csv.gz", "wt") as f:
        f.write("A Col,B-Col\n1,x\n2,y\n")
    with gzip.open(tmp_path / "d.jsonl.gz", "wt") as f:
        f.write('{"a": 1}\n{"a": 2}\n')
    csv = read_csv_source(str(tmp_path / "d.csv.gz")).to_pandas()
    assert list(csv.columns) == ["a_col", "b_col"]
    assert csv["a_col"].astype(int).tolist() == [1, 2]
    js = read_json_source(str(tmp_path / "d.jsonl.gz")).to_pandas()
    assert js["a"].tolist() == [1, 2]


def test_orc_sink_no_filename_collision_on_identical_looking_blocks(
    ray_session, tmp_path
):
    """ADVICE r4: two distinct blocks with equal row counts and equal
    first cell (common after repartitioning low-cardinality data) must
    both land on disk — the old (num_rows, first_cell) hash name let
    os.replace silently drop one block."""
    import glob

    import pandas as pd

    import ray.data as rd
    from wprdc_etl_ray.sources.connectors import read_orc_source, write_orc_sink

    # 4 blocks x 100 rows, every cell identical across blocks
    df = pd.DataFrame({"k": [1] * 400, "v": ["same"] * 400})
    out = str(tmp_path / "orcsink")
    n_files = write_orc_sink(rd.from_pandas(df).repartition(4), out)
    assert n_files == 4
    assert len(glob.glob(out + "/part-*.orc")) == 4
    back = read_orc_source(out).to_pandas()
    assert len(back) == 400  # no silently-dropped rows

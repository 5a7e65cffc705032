"""Declared Arrow schemas + validate/coerce/evolve (SURVEY.md §1.2, §2.3 X2/X3).

The reference validates every row with a declared marshmallow schema
(wprdc-etl pipeline/schema.py::BaseSchema applied per-line in
pipeline/pipeline.py::Pipeline.load_line): string→typed coercion, required
/nullable enforcement, ``load_from`` renames. This engine expresses the
same contract as a single source of truth ``pyarrow.Schema`` applied
vectorized per Arrow batch:

- validation/coercion = ``pa.Table.cast`` to the target schema,
- required-column enforcement = null checks via ``pyarrow.compute``,
- renames = a projection map applied before the cast,
- schema *evolution* (column add / type widen across WAL segments) =
  ``pa.unify_schemas`` at plan time + per-batch normalization, replacing
  the reference's edit-the-schema-class workflow.

All functions here are pure (no Ray) so they are cheap to ship into
``map_batches`` tasks.
"""

from __future__ import annotations

import pyarrow as pa

from .errors import SchemaEvolutionError, SchemaValidationError

# --- canonical schemas (BASELINE.json::input_hint / FIXTURES.md §A) ---------

#: Materialized target table: multi-turn conversation transcripts.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
)

#: CDC / WAL change-event schema, v1.
CHANGE_SCHEMA_V1 = pa.schema(
    [
        pa.field("offset", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
)

#: v2 = v1 + added tool metadata columns + widened turn_idx (FIXTURES.md §A3).
CHANGE_SCHEMA_V2 = pa.schema(
    [
        pa.field("offset", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int64(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us"), nullable=False),
        pa.field("tool_call_id", pa.string()),
        pa.field("tool_args", pa.string()),
    ]
)

VALID_OPS = ("insert", "update", "delete")

# key columns of the transcripts table (the reference's ``key_fields``,
# wprdc-etl pipeline/loaders.py::CKANDatastoreLoader(key_fields=...)).
KEY_COLUMNS = ("conv_id", "turn_idx")

# Internal snapshot columns kept in committed partition files beyond the
# public schema: lineage offset + tombstone flag (LSM semantics, §7.4).
SNAPSHOT_EXTRA_FIELDS = (
    pa.field("_offset", pa.int64(), nullable=False),
    pa.field("_deleted", pa.bool_(), nullable=False),
)


def snapshot_schema(public: pa.Schema) -> pa.Schema:
    """Schema of committed partition Parquet files: public cols + lineage."""
    fields = list(public) + list(SNAPSHOT_EXTRA_FIELDS)
    return pa.schema(fields)


# --- schema (de)serialization ------------------------------------------------

_TYPE_PARSERS: dict[str, pa.DataType] = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "float32": pa.float32(),
    "double": pa.float64(),
    "float64": pa.float64(),
    "date32[day]": pa.date32(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
    "list<item: float>": pa.list_(pa.float32()),
    "list<item: double>": pa.list_(pa.float64()),
}


def schema_to_fields(schema: pa.Schema) -> list[dict]:
    """Serialize an Arrow schema to a JSON-able field list.

    Reference parity: ``BaseSchema.serialize_to_ckan_fields`` (wprdc-etl
    pipeline/schema.py) converts the declared marshmallow schema into
    CKAN datastore DDL dicts ``[{'id': …, 'type': …}, …]``; here the
    target "DDL" is the manifest's schema record.
    """
    return [
        {"id": f.name, "type": str(f.type), "nullable": f.nullable} for f in schema
    ]


def dataset_schema(ds) -> pa.Schema:
    """Arrow schema of a ray.data.Dataset regardless of block format
    (Arrow blocks expose ``base_schema`` as a pa.Schema; pandas blocks
    expose name/type lists)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base

    def conv(t):
        if isinstance(t, pa.DataType):
            return t
        if t in (object, str):  # pandas object columns are strings here
            return pa.string()
        import numpy as np

        return pa.from_numpy_dtype(np.dtype(t))

    return pa.schema([pa.field(n, conv(t)) for n, t in zip(s.names, s.types)])


def fields_to_schema(fields: list[dict]) -> pa.Schema:
    """Inverse of :func:`schema_to_fields`."""
    out = []
    for f in fields:
        t = _TYPE_PARSERS.get(f["type"])
        if t is None:
            raise SchemaEvolutionError(f"unknown serialized type {f['type']!r}")
        out.append(pa.field(f["id"], t, nullable=f.get("nullable", True)))
    return pa.schema(out)


# --- evolution ---------------------------------------------------------------

_WIDENINGS: dict[str, set[str]] = {
    # target type name -> source type names it may widen from
    "int64": {"int8", "int16", "int32", "int64"},
    "int32": {"int8", "int16", "int32"},
    "float64": {"float32", "float64", "int8", "int16", "int32"},
    "timestamp[us]": {"timestamp[s]", "timestamp[ms]", "timestamp[us]"},
    "large_string": {"string", "large_string"},
    "string": {"string"},
}


def _can_widen(src: pa.DataType, dst: pa.DataType) -> bool:
    if src.equals(dst):
        return True
    if pa.types.is_null(src):
        # an ALL-null column (pandas None column, empty frame) carries
        # no values to narrow — it casts losslessly to any type
        return True
    allowed = _WIDENINGS.get(str(dst))
    return allowed is not None and str(src) in allowed


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify per-segment schemas under the engine's evolution policy.

    Allowed: column add (missing → null backfill), type widen
    (int32→int64, float32→float64, ts[s/ms]→ts[us], string→large_string).
    Forbidden: column removal relative to the union is fine (nulls), but
    type *narrowing* or incompatible changes raise SchemaEvolutionError.
    This mirrors the reference's declared-schema step (marshmallow
    BaseSchema) where a job edits its schema class to evolve; here
    evolution is inferred and checked (SURVEY.md §2.3 X3).
    """
    if not schemas:
        raise SchemaEvolutionError("no schemas to unify")
    # build union field map in first-seen order
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
            else:
                cur = types[f.name]
                if _can_widen(cur, f.type):
                    types[f.name] = f.type
                elif _can_widen(f.type, cur):
                    pass  # already the wider one
                else:
                    raise SchemaEvolutionError(
                        f"incompatible evolution for column {f.name!r}: "
                        f"{cur} vs {f.type}"
                    )
    return pa.schema([pa.field(n, types[n]) for n in order])


def normalize_batch(batch: pa.Table, target: pa.Schema) -> pa.Table:
    """Normalize one Arrow batch to ``target``: add missing cols as nulls,
    reorder, and cast (widening only). Vectorized; used inside
    ``map_batches(batch_format="pyarrow")``."""
    n = batch.num_rows
    cols = []
    names = set(batch.schema.names)
    for f in target:
        if f.name in names:
            col = batch.column(f.name)
            if not col.type.equals(f.type):
                if not _can_widen(col.type, f.type):
                    raise SchemaEvolutionError(
                        f"cannot narrow column {f.name!r}: {col.type} -> {f.type}"
                    )
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.table(cols, schema=target)


def validate_batch(
    batch: pa.Table,
    target: pa.Schema,
    required: tuple[str, ...] = (),
    rename: dict[str, str] | None = None,
    strict: bool = True,
) -> pa.Table:
    """Validate + coerce one batch against the declared schema.

    Reference parity (wprdc-etl pipeline/schema.py::BaseSchema +
    Pipeline.load_line): ``rename`` is the ``load_from`` raw→canonical
    name map; the cast is the string→typed coercion; ``required`` columns
    must be non-null. strict=True raises SchemaValidationError on any
    null in a required column (the reference fails the run); strict=False
    drops the offending rows (permissive mode).
    """
    import pyarrow.compute as pc

    if rename:
        batch = batch.rename_columns([rename.get(c, c) for c in batch.schema.names])
    batch = normalize_batch(batch, target)
    if required:
        mask = None
        for name in required:
            ok = pc.is_valid(batch.column(name))
            mask = ok if mask is None else pc.and_(mask, ok)
        bad = batch.num_rows - pc.sum(mask).as_py() if batch.num_rows else 0
        if bad:
            if strict:
                raise SchemaValidationError(
                    f"{bad} row(s) with nulls in required columns {required}"
                )
            batch = batch.filter(mask)
    return batch

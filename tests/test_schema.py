"""Schema validate/coerce/evolve unit tests (SURVEY.md §5.2 item 1).

Mirrors the reference's schema-coercion tests (wprdc-etl test suite for
pipeline/schema.py::BaseSchema), re-expressed over Arrow batches.
"""

import pyarrow as pa
import pytest

from wprdc_etl_ray.errors import SchemaEvolutionError, SchemaValidationError
from wprdc_etl_ray.schema import (
    CHANGE_SCHEMA_V1,
    CHANGE_SCHEMA_V2,
    fields_to_schema,
    normalize_batch,
    schema_to_fields,
    unify_schemas,
    validate_batch,
)


def test_unify_add_and_widen():
    u = unify_schemas([CHANGE_SCHEMA_V1, CHANGE_SCHEMA_V2])
    assert u.field("turn_idx").type == pa.int64()  # widened
    assert "tool_call_id" in u.names  # added
    assert "tool_args" in u.names


def test_unify_rejects_narrowing_conflict():
    a = pa.schema([pa.field("x", pa.string())])
    b = pa.schema([pa.field("x", pa.int64())])
    with pytest.raises(SchemaEvolutionError):
        unify_schemas([a, b])


def test_normalize_backfills_nulls_and_casts():
    batch = pa.table({"a": pa.array([1, 2], pa.int32())})
    target = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    out = normalize_batch(batch, target)
    assert out.schema.equals(target)
    assert out.column("b").null_count == 2
    assert out.column("a").type == pa.int64()


def test_normalize_rejects_narrowing():
    batch = pa.table({"a": pa.array([1], pa.int64())})
    target = pa.schema([pa.field("a", pa.int32())])
    with pytest.raises(SchemaEvolutionError):
        normalize_batch(batch, target)


def test_validate_required_strict_raises():
    target = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.string())])
    batch = pa.table({"k": pa.array([1, None], pa.int64()), "v": ["a", "b"]})
    with pytest.raises(SchemaValidationError):
        validate_batch(batch, target, required=("k",), strict=True)


def test_validate_required_permissive_drops():
    target = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.string())])
    batch = pa.table({"k": pa.array([1, None], pa.int64()), "v": ["a", "b"]})
    out = validate_batch(batch, target, required=("k",), strict=False)
    assert out.num_rows == 1
    assert out.column("v").to_pylist() == ["a"]


def test_validate_rename():
    # reference parity: marshmallow load_from raw-header -> canonical name
    target = pa.schema([pa.field("conv_id", pa.string())])
    batch = pa.table({"Conversation ID": ["c1"]})
    out = validate_batch(batch, target, rename={"Conversation ID": "conv_id"})
    assert out.column("conv_id").to_pylist() == ["c1"]


def test_schema_fields_roundtrip():
    # reference parity: serialize_to_ckan_fields analog
    fields = schema_to_fields(CHANGE_SCHEMA_V2)
    assert fields[0] == {"id": "offset", "type": "int64", "nullable": False}
    back = fields_to_schema(fields)
    for f in CHANGE_SCHEMA_V2:
        assert back.field(f.name).type == f.type

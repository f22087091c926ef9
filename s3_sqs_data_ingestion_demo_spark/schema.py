"""Avro-contract → Spark ``StructType`` conversion.

The reference declares its target-table schema in an Avro ``.avsc`` file
and converts it to a Spark schema with a small mapping table (reference:
spark-job/read.py:110-146).  This module reimplements that mapping from
the public Avro specification and *extends* it to a strict superset:
nested records, arrays, maps, enums, fixed/bytes, decimals, and both
timestamp logical-type granularities.

Reference nullability semantics preserved exactly
(reference: spark-job/read.py:131-144):

- plain string type       → ``nullable=False``
- dict (logical) type     → ``nullable=True``
- union list              → nullable iff ``"null"`` is a member; the
  first non-null branch is used as the type.

Deviations (documented, deliberate):
- unknown primitive names raise ``ValueError`` instead of silently
  degrading to string (reference: spark-job/read.py:129 falls back to
  StringType) unless ``strict=False``.
- ``bytes``/``fixed`` map to ``BinaryType`` (reference had no mapping).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}

_LOGICAL: dict[str, T.DataType] = {
    "timestamp-micros": T.TimestampType(),
    "timestamp-millis": T.TimestampType(),
    "date": T.DateType(),
    "time-micros": T.LongType(),
    "time-millis": T.IntegerType(),
    "uuid": T.StringType(),
}


def _convert_type(avro_type: Any, strict: bool = True) -> T.DataType:
    if isinstance(avro_type, str):
        if avro_type in _PRIMITIVES:
            return _PRIMITIVES[avro_type]
        if strict:
            raise ValueError(f"unsupported avro type: {avro_type!r}")
        return T.StringType()

    if isinstance(avro_type, list):  # union — first non-null branch
        non_null = [t for t in avro_type if t != "null"]
        if not non_null:
            return T.NullType()
        return _convert_type(non_null[0], strict)

    if isinstance(avro_type, dict):
        logical = avro_type.get("logicalType")
        if logical == "decimal":
            return T.DecimalType(
                int(avro_type.get("precision", 38)), int(avro_type.get("scale", 18))
            )
        if logical in _LOGICAL:
            return _LOGICAL[logical]

        kind = avro_type.get("type")
        if kind == "array":
            return T.ArrayType(_convert_type(avro_type["items"], strict), True)
        if kind == "map":
            return T.MapType(T.StringType(), _convert_type(avro_type["values"], strict), True)
        if kind == "record":
            return T.StructType(
                [_convert_field(f, strict) for f in avro_type.get("fields", [])]
            )
        if kind == "enum":
            return T.StringType()
        if kind == "fixed":
            return T.BinaryType()
        return _convert_type(kind, strict)

    raise ValueError(f"unparseable avro type: {avro_type!r}")


def _is_nullable(avro_type: Any) -> bool:
    # Reference semantics: spark-job/read.py:131-144.
    if isinstance(avro_type, str):
        return False
    if isinstance(avro_type, list):
        return "null" in avro_type
    return True  # dict / logical types → nullable


def _convert_field(field: dict[str, Any], strict: bool = True) -> T.StructField:
    ftype = field["type"]
    return T.StructField(field["name"], _convert_type(ftype, strict), _is_nullable(ftype))


def avro_to_spark_schema(avro_schema: dict[str, Any] | str, strict: bool = True) -> T.StructType:
    """Convert an Avro record schema (dict or JSON text) to a StructType."""
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    if avro_schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    return T.StructType([_convert_field(f, strict) for f in avro_schema["fields"]])


def load_avro_schema(path: str, strict: bool = True) -> T.StructType:
    """Load an ``.avsc`` file (local path) and convert it."""
    with open(path, encoding="utf-8") as fh:
        return avro_to_spark_schema(fh.read(), strict)

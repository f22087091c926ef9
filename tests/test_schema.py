"""Avro→StructType converter unit tests.

Covers every branch of the reference's mapping (reference:
spark-job/read.py:113-144) plus this engine's superset extensions
(fixture plan: FIXTURES.md §4).
"""

import pytest
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.schema import avro_to_spark_schema


def field(schema, name):
    return next(f for f in schema.fields if f.name == name)


def test_plain_primitives_non_nullable():
    s = avro_to_spark_schema(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": "string"},
                {"name": "b", "type": "int"},
                {"name": "c", "type": "long"},
                {"name": "d", "type": "float"},
                {"name": "e", "type": "double"},
                {"name": "f", "type": "boolean"},
            ],
        }
    )
    expected = [
        T.StringType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(), T.BooleanType(),
    ]
    assert [f.dataType for f in s.fields] == expected
    assert all(f.nullable is False for f in s.fields)


def test_union_nullability_order_independent():
    s = avro_to_spark_schema(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": ["null", "string"]},
                {"name": "b", "type": ["int", "null"]},
                {"name": "c", "type": ["long"]},
            ],
        }
    )
    assert field(s, "a").nullable and field(s, "a").dataType == T.StringType()
    assert field(s, "b").nullable and field(s, "b").dataType == T.IntegerType()
    assert not field(s, "c").nullable


def test_logical_types_nullable():
    s = avro_to_spark_schema(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "tsm", "type": {"type": "long", "logicalType": "timestamp-millis"}},
                {"name": "d", "type": {"type": "int", "logicalType": "date"}},
                {
                    "name": "dec",
                    "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2},
                },
            ],
        }
    )
    assert field(s, "ts").dataType == T.TimestampType() and field(s, "ts").nullable
    assert field(s, "tsm").dataType == T.TimestampType()
    assert field(s, "d").dataType == T.DateType()
    assert field(s, "dec").dataType == T.DecimalType(10, 2)


def test_superset_complex_types():
    s = avro_to_spark_schema(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "emb", "type": {"type": "array", "items": "float"}},
                {"name": "m", "type": {"type": "map", "values": "double"}},
                {
                    "name": "nested",
                    "type": {
                        "type": "record",
                        "name": "inner",
                        "fields": [{"name": "x", "type": "int"}],
                    },
                },
                {"name": "en", "type": {"type": "enum", "name": "e", "symbols": ["A"]}},
                {"name": "fx", "type": {"type": "fixed", "name": "f", "size": 4}},
                {"name": "bin", "type": "bytes"},
            ],
        }
    )
    assert field(s, "emb").dataType == T.ArrayType(T.FloatType(), True)
    assert field(s, "m").dataType == T.MapType(T.StringType(), T.DoubleType(), True)
    assert field(s, "nested").dataType == T.StructType(
        [T.StructField("x", T.IntegerType(), False)]
    )
    assert field(s, "en").dataType == T.StringType()
    assert field(s, "fx").dataType == T.BinaryType()
    assert field(s, "bin").dataType == T.BinaryType()


def test_unknown_type_strict_raises_lenient_degrades():
    doc = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "interval"}],
    }
    with pytest.raises(ValueError):
        avro_to_spark_schema(doc)
    # reference behavior (spark-job/read.py:129): degrade to string
    s = avro_to_spark_schema(doc, strict=False)
    assert s.fields[0].dataType == T.StringType()


def test_reference_contract_silver_orders():
    """The reference's own 9-field contract converts to the exact
    StructType its converter produced (FIXTURES.md §2)."""
    avsc = {
        "type": "record",
        "name": "silver_orders",
        "fields": [
            {"name": "invoiceid", "type": "int"},
            {"name": "itemid", "type": "int"},
            {"name": "category", "type": "string"},
            {"name": "price", "type": "float"},
            {"name": "quantity", "type": "int"},
            {"name": "orderdate", "type": "string"},
            {"name": "destinationstate", "type": "string"},
            {"name": "shippingtype", "type": "string"},
            {"name": "referral", "type": "string"},
        ],
    }
    s = avro_to_spark_schema(avsc)
    assert s.fieldNames() == [
        "invoiceid", "itemid", "category", "price", "quantity",
        "orderdate", "destinationstate", "shippingtype", "referral",
    ]
    assert field(s, "price").dataType == T.FloatType()
    assert all(not f.nullable for f in s.fields)

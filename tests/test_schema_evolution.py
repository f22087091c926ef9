"""Additive schema evolution on ManagedTable."""

import os

import pytest
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from tests.test_table import SCHEMA, df_of


def test_add_column_old_files_read_as_null(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    t.add_columns([T.StructField("tag", T.StringType(), True)])

    # old data surfaces the new column as null
    reloaded = ManagedTable.load(spark, t.path)
    rows = reloaded.read().collect()
    assert rows[0].tag is None

    # new writes carry it; merge across old+new files works
    new_schema = reloaded.meta.schema
    reloaded.merge(
        spark.createDataFrame([(1, "a", 5.0, 2, "hot"), (2, "b", 2.0, 1, "cold")], new_schema)
    )
    got = {r.id: r.tag for r in reloaded.read().collect()}
    assert got == {1: "hot", 2: "cold"}


def test_add_column_guards(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA, key_cols=["id"]
    )
    with pytest.raises(ValueError, match="already exists"):
        t.add_columns([T.StructField("id", T.IntegerType(), True)])
    with pytest.raises(ValueError, match="nullable"):
        t.add_columns([T.StructField("x", T.IntegerType(), False)])
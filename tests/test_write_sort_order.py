"""Declared write sort order (table property ``write.sort-columns``):
every write sorts rows within its output tasks on the declared
columns, so per-file parquet min/max stats are tight from the FIRST
commit — not only after a ``compact(cluster_by=...)`` maintenance pass.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), True),
    T.StructField("grp", T.StringType(), True),
    T.StructField("v", T.DoubleType(), True),
])


def _shuffled(spark, n=200):
    # deterministic shuffle: hash-order the ids so input order is
    # adversarial for min/max tightness
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.concat(F.lit("g"), (F.col("id") % 2).cast("string")).alias("grp"),
            (F.col("id") * 1.5).alias("v"),
        )
        .orderBy(F.xxhash64("id"))
        .repartition(4)
    )


def _files_sorted_on(spark, t, col):
    """Every parquet file of the newest entry holds rows sorted on
    ``col`` (ascending)."""
    entry = t._read_manifest()[-1]
    root = os.path.join(t.path, entry["root"])
    files = glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        vals = [r[col] for r in spark.read.parquet(f).select(col).collect()]
        if vals != sorted(vals):
            return False
    return True


def test_write_sort_columns_sorts_every_file(spark, tmp_path):
    t = ManagedTable.create(
        spark, f"{tmp_path}/t", SCHEMA,
        properties={"write.sort-columns": "id"},
    )
    t.append(_shuffled(spark))
    assert _files_sorted_on(spark, t, "id")
    # and the manifest read serves everything
    assert t.read().count() == 200


def test_unsorted_control_shows_the_property_matters(spark, tmp_path):
    t = ManagedTable.create(spark, f"{tmp_path}/t", SCHEMA)
    t.append(_shuffled(spark))
    assert not _files_sorted_on(spark, t, "id")


def test_write_sort_composes_with_hidden_partitioning(spark, tmp_path):
    t = ManagedTable.create(
        spark, f"{tmp_path}/t", SCHEMA,
        partition_cols=["grp"],
        properties={"write.sort-columns": "id"},
    )
    t.append(_shuffled(spark))
    assert _files_sorted_on(spark, t, "id")
    assert t.read().count() == 200


def test_write_sort_unknown_column_fails_loudly(spark, tmp_path):
    t = ManagedTable.create(
        spark, f"{tmp_path}/t", SCHEMA,
        properties={"write.sort-columns": "nope"},
    )
    with pytest.raises(Exception, match="nope|UNRESOLVED"):
        t.append(_shuffled(spark))


def test_degenerate_sort_property_is_a_no_op_not_a_wedge(spark, tmp_path):
    """A truthy-but-empty value (' , ') names zero columns; the write
    must treat it as unsorted instead of calling an argless
    sortWithinPartitions that fails every subsequent write."""
    t = ManagedTable.create(spark, f"{tmp_path}/t", SCHEMA, key_cols=["id"])
    # set_properties validation may refuse it outright — bypass to the
    # raw property to model a hand-edited/legacy _meta.json
    t.meta.properties["write.sort-columns"] = " , "
    t._persist_meta()
    t.append(_shuffled(spark, 50))
    assert ManagedTable.load(spark, f"{tmp_path}/t").read().count() == 50

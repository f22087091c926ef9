"""isin_column (table.py) must be semantically IDENTICAL to the
built-in ``Column.isin`` for every value shape — it is the one-py4j-
call fast path under ``read_where_in``, the rollup MIN/MAX rescan and
the join-MV affected-key reads, so a silent mis-match there is a
silently wrong rollup extreme or a missing MV row.

The round-8 defect: the SQL-text rendering escaped only single
quotes, but Spark's default parser (escapedStringLiterals=false)
treats backslash inside a string literal as an escape — ``a\\nb``
(backslash + n) parsed as ``a<newline>b`` and returned ZERO rows
where the built-in returned one."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable, isin_column

TRICKY = [
    "plain",
    "back\\slash",
    "a\\nb",  # backslash + 'n' — NOT a newline
    "tab\there",  # real control char
    "new\nline",
    "quote'single",
    'quote"double',
    "unié",
    "trail\\",
]


def _check(spark, df, col, vals):
    fast = sorted(repr(r[0]) for r in df.filter(isin_column(col, vals)).collect())
    slow = sorted(
        repr(r[0]) for r in df.filter(F.col(col).isin(list(vals))).collect()
    )
    assert fast == slow, (vals, fast, slow)
    return fast


def test_matches_builtin_on_tricky_strings(spark):
    df = spark.createDataFrame([(s, i) for i, s in enumerate(TRICKY)], "k string, v int")
    for v in TRICKY:
        got = _check(spark, df.select("k"), "k", [v])
        assert got == [repr(v)]
    # mixed sets, including values absent from the frame
    _check(spark, df.select("k"), "k", TRICKY)
    _check(spark, df.select("k"), "k", ["back\\slash", "absent\\x", "plain"])


def test_matches_builtin_under_escaped_string_literals_conf(spark):
    """The fast path must be correct on BOTH settings of
    spark.sql.parser.escapedStringLiterals."""
    df = spark.createDataFrame([(s, i) for i, s in enumerate(TRICKY)], "k string, v int")
    key = "spark.sql.parser.escapedStringLiterals"
    old = spark.conf.get(key, "false")
    try:
        for setting in ("true", "false"):
            spark.conf.set(key, setting)
            _check(spark, df.select("k"), "k", TRICKY)
    finally:
        spark.conf.set(key, old)


def test_numbers_and_fallback_shapes(spark):
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf")), (4, -2.25)],
        "i int, x double",
    )
    _check(spark, df.select("i"), "i", [1, 3])
    _check(spark, df.select("x"), "x", [1.5, -2.25])
    # non-finite floats: repr() is unparseable SQL — must fall back
    _check(spark, df.select("x"), "x", [float("inf"), 1.5])
    _check(spark, df.select("x"), "x", [float("nan")])
    # bools and None fall back to the built-in
    bdf = spark.createDataFrame([(True,), (False,)], "b boolean")
    _check(spark, bdf, "b", [True])
    # empty set matches nothing
    assert df.filter(isin_column("i", [])).count() == 0


def test_read_where_in_tricky_values_roundtrip(spark, tmp_path):
    """End-to-end through the manifest-pruned multi-point read."""
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), schema, key_cols=["k"]
    )
    t.append(
        spark.createDataFrame([Row(k=s, v=i) for i, s in enumerate(TRICKY)], schema)
    )
    got = sorted(r.k for r in t.read_where_in("k", ["a\\nb", "plain"]).collect())
    assert got == ["a\\nb", "plain"]
    with pytest.raises(ValueError, match="non-null"):
        t.read_where_in("k", ["plain", None])


def test_rollup_rescan_with_backslash_group_values(spark, tmp_path):
    """A retraction touching a backslash-bearing group value must
    rescan THAT group, not silently miss it (leaving a stale MIN)."""
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        create_rollup,
        refresh_rollup,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("grp", T.StringType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    src = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "src"),
        schema,
        key_cols=["id"],
        table_type="MOR",
    )
    gname = "g\\nroup"  # backslash + n, NOT a newline
    src.append(
        spark.createDataFrame(
            [Row(id=1, grp=gname, v=5), Row(id=2, grp=gname, v=9)], schema
        )
    )
    roll = create_rollup(
        src,
        os.path.join(str(tmp_path), "roll"),
        ["grp"],
        ["v"],
        consume_from=1,
        min_cols=["v"],
    )
    refresh_rollup(src, roll, ["grp"], ["v"], min_cols=["v"])
    # retract the group's minimum: the rescan must find the group
    src.delete_keys(spark.createDataFrame([Row(id=1)]))
    refresh_rollup(src, roll, ["grp"], ["v"], min_cols=["v"])
    rows = {r.grp: (r.n_rows, r.min_v) for r in roll.read().collect()}
    assert rows == {gname: (1, 9)}

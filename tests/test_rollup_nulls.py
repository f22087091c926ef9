"""NULL group values through the incremental rollup — SQL GROUP BY
keeps null groups (so does the DuckDB oracle), so the rollup's folds,
rescans, distinct companions and emptied-group sweeps must treat NULL
as a real group key.  Every join here is on the group columns, where
plain equality silently drops null keys; join_nullsafe (table.py)
pairs them.  Each scenario lands bit-exact against a full re-aggregate
of the source."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    create_rollup,
    reaggregate_rollup,
    refresh_rollup,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("grp", T.StringType(), True),  # nullable group
        T.StructField("v", T.IntegerType(), True),
        T.StructField("d", T.StringType(), True),  # distinct-count col
    ]
)


def _mk(spark, tmp):
    return ManagedTable.create(
        spark,
        os.path.join(str(tmp), "src"),
        SCHEMA,
        key_cols=["id"],
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v, d=d) for i, g, v, d in rows], SCHEMA
    )


def _state(dst, *cols):
    return {
        r.grp: tuple(r[c] for c in cols) for r in dst.read().collect()
    }


def _oracle(src, sum_col="v", extremes=False, distinct=None):
    aggs = [F.count("*").alias("n"), F.sum(sum_col).alias("s")]
    if extremes:
        aggs += [F.min("v").alias("mn"), F.max("v").alias("mx")]
    if distinct:
        aggs.append(F.countDistinct(distinct).alias("nd"))
    out = {}
    for r in src.read().groupBy("grp").agg(*aggs).collect():
        vals = [r.n, float(r.s)]
        if extremes:
            vals += [r.mn, r.mx]
        if distinct:
            vals.append(r.nd)
        out[r.grp] = tuple(vals)
    return out


def test_additive_fold_keeps_null_group_cumulative(spark, tmp_path):
    """Two refreshes touching the SAME null group must accumulate —
    the round-8 plain-equality joins treated the existing null-group
    row as absent and overwrote it with just the delta."""
    src = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, None, 10, "x"), (2, "a", 5, "y")]))
    roll = create_rollup(
        src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"], consume_from=1
    )
    refresh_rollup(src, roll, ["grp"], ["v"])
    src.append(_rows(spark, [(3, None, 7, "z")]))
    refresh_rollup(src, roll, ["grp"], ["v"])
    assert _state(roll, "n_rows", "sum_v") == _oracle(src)
    assert _state(roll, "n_rows", "sum_v")[None] == (2, 17.0)


def test_minmax_rescan_handles_null_group_retraction(spark, tmp_path):
    """A retraction inside the null group must rescan it (not crash
    sorted() on None, not vanish through IN/equi-semi-join, not
    recompute as n_rows=0 and wrongly delete the group)."""
    src = _mk(spark, tmp_path)
    src.append(
        _rows(
            spark,
            [(1, None, 3, "x"), (2, None, 9, "y"), (3, "a", 5, "x")],
        )
    )
    roll = create_rollup(
        src,
        os.path.join(str(tmp_path), "r"),
        ["grp"],
        ["v"],
        consume_from=1,
        min_cols=["v"],
        max_cols=["v"],
    )
    refresh_rollup(src, roll, ["grp"], ["v"], min_cols=["v"], max_cols=["v"])
    # retract the null group's minimum
    src.delete_keys(spark.createDataFrame([Row(id=1)]))
    refresh_rollup(src, roll, ["grp"], ["v"], min_cols=["v"], max_cols=["v"])
    assert _state(roll, "n_rows", "sum_v", "min_v", "max_v") == _oracle(
        src, extremes=True
    )
    assert _state(roll, "n_rows", "sum_v", "min_v", "max_v")[None] == (
        1,
        9.0,
        9,
        9,
    )


def test_minmax_rescan_mixed_null_and_string_groups(spark, tmp_path):
    """The collected rescan value set mixing None with strings must
    not TypeError on sorted() and must cover BOTH groups."""
    src = _mk(spark, tmp_path)
    src.append(
        _rows(
            spark,
            [
                (1, None, 3, "x"),
                (2, None, 9, "x"),
                (3, "a", 5, "x"),
                (4, "a", 1, "x"),
            ],
        )
    )
    roll = create_rollup(
        src,
        os.path.join(str(tmp_path), "r"),
        ["grp"],
        ["v"],
        consume_from=1,
        min_cols=["v"],
    )
    refresh_rollup(src, roll, ["grp"], ["v"], min_cols=["v"])
    # one delete in each group, both minima retracted
    src.delete_keys(spark.createDataFrame([Row(id=1), Row(id=4)]))
    refresh_rollup(src, roll, ["grp"], ["v"], min_cols=["v"])
    assert _state(roll, "n_rows", "sum_v", "min_v") == _oracle(
        src, extremes=False
    ) | {
        g: (n, s, mn)
        for g, (n, s, mn, _mx) in _oracle(src, extremes=True).items()
    }


def test_emptied_null_group_is_swept(spark, tmp_path):
    """Deleting every row of the null group must remove its rollup row
    — requires the MOR tombstone application to match a null key."""
    src = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, None, 3, "x"), (2, "a", 5, "x")]))
    roll = create_rollup(
        src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"], consume_from=1
    )
    refresh_rollup(src, roll, ["grp"], ["v"])
    src.delete_keys(spark.createDataFrame([Row(id=1)]))
    refresh_rollup(src, roll, ["grp"], ["v"])
    assert _state(roll, "n_rows", "sum_v") == {"a": (1, 5.0)}


def test_distinct_companion_with_null_group(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.append(
        _rows(
            spark,
            [
                (1, None, 1, "x"),
                (2, None, 1, "y"),
                (3, None, 1, "x"),
                (4, "a", 1, "x"),
            ],
        )
    )
    roll = create_rollup(
        src,
        os.path.join(str(tmp_path), "r"),
        ["grp"],
        ["v"],
        consume_from=1,
        distinct_cols=["d"],
    )
    refresh_rollup(src, roll, ["grp"], ["v"], distinct_cols=["d"])
    got = _state(roll, "n_rows", "sum_v", "n_distinct_d")
    assert got[None] == (3, 3.0, 2)
    # retract one of the null group's 'x' holders: count stays 2
    src.delete_keys(spark.createDataFrame([Row(id=1)]))
    refresh_rollup(src, roll, ["grp"], ["v"], distinct_cols=["d"])
    got = _state(roll, "n_rows", "sum_v", "n_distinct_d")
    assert got[None] == (2, 2.0, 2)
    # retract the last 'x' holder: distinct drops to 1
    src.delete_keys(spark.createDataFrame([Row(id=3)]))
    refresh_rollup(src, roll, ["grp"], ["v"], distinct_cols=["d"])
    got = _state(roll, "n_rows", "sum_v", "n_distinct_d")
    assert got[None] == (1, 1.0, 1)
    assert got == _oracle(src, distinct="d") and True
    # oracle cross-check of the full final state
    assert {g: (n, s, nd) for g, (n, s, nd) in got.items()} == _oracle(
        src, distinct="d"
    )


def test_reaggregate_preserves_null_groups(spark, tmp_path):
    """Rollup routing at a coarser granularity keeps the null group
    and its exact distinct count."""
    src = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "src2"),
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),
                T.StructField("a", T.StringType(), True),
                T.StructField("b", T.StringType(), True),
                T.StructField("v", T.IntegerType(), True),
                T.StructField("d", T.StringType(), True),
            ]
        ),
        key_cols=["id"],
        table_type="MOR",
    )
    src.append(
        spark.createDataFrame(
            [
                Row(id=1, a=None, b="p", v=1, d="x"),
                Row(id=2, a=None, b="q", v=2, d="y"),
                Row(id=3, a="g", b="p", v=3, d="x"),
            ],
            src.meta.schema,
        )
    )
    roll = create_rollup(
        src,
        os.path.join(str(tmp_path), "r2"),
        ["a", "b"],
        ["v"],
        consume_from=1,
        distinct_cols=["d"],
    )
    refresh_rollup(src, roll, ["a", "b"], ["v"], distinct_cols=["d"])
    out = {
        r.a: (r.n_rows, r.sum_v, r.n_distinct_d)
        for r in reaggregate_rollup(
            roll, ["a"], sum_cols=["v"], distinct_cols=["d"]
        ).collect()
    }
    assert out == {None: (2, 3.0, 2), "g": (1, 3.0, 1)}

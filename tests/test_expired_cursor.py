"""A change-feed cursor that predates the source's oldest retained
snapshot must FAIL LOUDLY (ExpiredCursorError), never silently shrink
the window: the expired slice of changes is unrecoverable, and a
quiet shrink permanently under-counts the rollup / loses MV rows with
no signal.  Two real paths hit it: a consumer whose cursor lagged
past an expire_snapshots cadence, and a consume_from=1 bootstrap on a
source whose early history was ever expired."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.join_mv import (
    create_join_mv,
    refresh_join_mv,
)
from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    ExpiredCursorError,
    create_rollup,
    refresh_rollup,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.IntegerType(), True),
    ]
)


def _mk_src(spark, tmp, name="src"):
    return ManagedTable.create(
        spark,
        os.path.join(str(tmp), name),
        SCHEMA,
        key_cols=["id"],
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v) for i, g, v in rows], SCHEMA
    )


def test_lagging_rollup_cursor_crossing_expiry_raises(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 1)]))
    roll = create_rollup(
        src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"], consume_from=1
    )
    refresh_rollup(src, roll, ["grp"], ["v"])
    cursor_before = int(roll.meta.properties["rollup.src-version"])
    # the consumer stops; the source keeps committing and expires
    for i in range(2, 8):
        src.append(_rows(spark, [(i, "a", i)]))
    src.expire_snapshots(keep_last=2)
    with pytest.raises(ExpiredCursorError, match="rebuild the rollup"):
        refresh_rollup(src, roll, ["grp"], ["v"])
    # nothing advanced, nothing folded: the error left state intact
    assert int(roll.meta.properties["rollup.src-version"]) == cursor_before
    assert {r.grp: r.n_rows for r in roll.read().collect()} == {"a": 1}


def test_bootstrap_on_previously_expired_source_raises(spark, tmp_path):
    """consume_from=1 promises 'fold the whole existing content';
    if version 1 was expired that promise is unkeepable — loud error,
    not a silently partial rollup."""
    src = _mk_src(spark, tmp_path)
    for i in range(1, 6):
        src.append(_rows(spark, [(i, "a", i)]))
    src.expire_snapshots(keep_last=2)
    roll = create_rollup(
        src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"], consume_from=1
    )
    with pytest.raises(ExpiredCursorError, match="expired past the consume"):
        refresh_rollup(src, roll, ["grp"], ["v"])


def test_join_mv_lagging_cursor_crossing_expiry_raises(spark, tmp_path):
    left = _mk_src(spark, tmp_path, "left")
    right = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "right"),
        T.StructType(
            [
                T.StructField("rid", T.IntegerType(), False),
                T.StructField("grp2", T.StringType(), True),
                T.StructField("w", T.IntegerType(), True),
            ]
        ),
        key_cols=["rid"],
        table_type="MOR",
    )
    left.append(_rows(spark, [(1, "a", 1)]))
    right.append(
        spark.createDataFrame([Row(rid=1, grp2="a", w=9)], right.meta.schema)
    )
    mv = create_join_mv(
        left,
        right,
        os.path.join(str(tmp_path), "mv"),
        on=("grp", "grp2"),
        consume_from=(1, 1),
    )
    refresh_join_mv(left, right, mv, on=("grp", "grp2"))
    for i in range(2, 8):
        left.append(_rows(spark, [(i, "a", i)]))
    left.expire_snapshots(keep_last=2)
    with pytest.raises(ExpiredCursorError):
        refresh_join_mv(left, right, mv, on=("grp", "grp2"))

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


def test_rebuild_rollup_recovers_expired_cursor(spark, tmp_path):
    """The remedy ExpiredCursorError prescribes: rebuild_rollup
    recomputes from the pinned current state (every aggregate family
    incl. companions), re-anchors the cursor, and subsequent
    incremental refreshes work again."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        ExpiredCursorError,
        create_rollup,
        rebuild_rollup,
        refresh_rollup,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.IntegerType()),
            T.StructField("d", T.StringType()),
        ]
    )
    src = ManagedTable.create(
        spark, f"{tmp_path}/src", schema, key_cols=["id"], table_type="MOR"
    )
    kw = {
        "min_cols": ["v"], "max_cols": ["v"], "distinct_cols": ["d"],
        "sumsq_cols": ["v"], "hist_cols": {"v": (0.0, 100.0, 5)},
    }
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], ["v"], **kw)

    def rows(n0, n):
        return spark.createDataFrame(
            [Row(id=i, grp="ab"[i % 2], v=(i * 7) % 90, d="xyz"[i % 3])
             for i in range(n0, n0 + n)],
            schema,
        )

    src.append(rows(0, 6))
    refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    # the cursor lags while the source churns and expires history
    for i in range(5):
        src.append(rows(10 + 10 * i, 3))
    src.expire_snapshots(keep_last=2)
    with pytest.raises(ExpiredCursorError):
        refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    rebuild_rollup(src, dst, ["grp"], ["v"], **kw)
    # rebuilt state == full re-aggregate, and incremental consumption resumes
    src.merge(
        spark.createDataFrame([Row(id=0, grp="b", v=99, d="q")], schema)
    )
    refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    want = {
        r.grp: (r.n, float(r.s), r.mn, r.mx, r.nd)
        for r in src.read().groupBy("grp").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.countDistinct("d").alias("nd"),
        ).collect()
    }
    got = {
        r.grp: (r.n_rows, r.sum_v, r.min_v, r.max_v, r.n_distinct_d)
        for r in dst.read().collect()
    }
    assert got == want


def test_rebuild_topk_recovers_expired_cursor(spark, tmp_path):
    from pyspark.sql import Row, Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        ExpiredCursorError,
    )
    from s3_sqs_data_ingestion_demo_spark.operators.topk_mv import (
        create_topk_mv,
        rebuild_topk_mv,
        refresh_topk_mv,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    src = ManagedTable.create(
        spark, f"{tmp_path}/src", schema, key_cols=["id"], table_type="MOR"
    )
    kw = dict(group_cols=["grp"], order_col="v", k=2, id_cols=["id"])
    dst = create_topk_mv(src, f"{tmp_path}/mv", **kw)
    src.append(
        spark.createDataFrame(
            [Row(id=i, grp="ab"[i % 2], v=i * 3) for i in range(6)], schema
        )
    )
    refresh_topk_mv(src, dst, **kw)
    for i in range(5):
        src.append(
            spark.createDataFrame(
                [Row(id=10 + 10 * i + j, grp="ab"[j % 2], v=50 + i + j)
                 for j in range(2)],
                schema,
            )
        )
    src.expire_snapshots(keep_last=2)
    with pytest.raises(ExpiredCursorError):
        refresh_topk_mv(src, dst, **kw)
    rebuild_topk_mv(src, dst, **kw)
    src.append(
        spark.createDataFrame([Row(id=999, grp="a", v=1000)], schema)
    )
    refresh_topk_mv(src, dst, **kw)
    w = Window.partitionBy("grp").orderBy(
        F.col("v").desc_nulls_last(), F.col("id").asc_nulls_last()
    )
    want = sorted(
        (r.grp, r.id, r.v)
        for r in src.read().withColumn("_rn", F.row_number().over(w))
        .filter("_rn <= 2").collect()
    )
    assert sorted((r.grp, r.id, r.v) for r in dst.read().collect()) == want

"""Multi-level incremental view maintenance: a rollup maintained ON a
join MV (aggregate-over-join).  No special-case code — the rollup
machinery consumes ANY ManagedTable's change feed, and the MV's
refreshes commit keyed merges + deletes, which the rollup absorbs
through its CDF retraction path.  The chain
  sources → refresh_join_mv → refresh_rollup(mv, …)
must land on the same state as re-running join+GROUP BY from
scratch."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.join_mv import (
    create_join_mv,
    refresh_join_mv,
)
from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    create_rollup,
    refresh_rollup,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

LEFT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("cust", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)
DIM = T.StructType(
    [
        T.StructField("c_id", T.LongType()),
        T.StructField("seg", T.StringType()),
    ]
)


def test_rollup_over_join_mv_tracks_both_sources(spark, tmp_path):
    d = str(tmp_path)
    src = ManagedTable.create(spark, f"{d}/src", LEFT, key_cols=["id"],
                              table_type="MOR")
    dim = ManagedTable.create(spark, f"{d}/dim", DIM, key_cols=["c_id"],
                              table_type="MOR")
    dim.append(spark.createDataFrame(
        [Row(c_id=1, seg="A"), Row(c_id=2, seg="B")], DIM))
    mv = create_join_mv(src, dim, f"{d}/mv", on=("cust", "c_id"),
                        consume_from=(1, 1))
    roll = create_rollup(mv, f"{d}/roll", ["seg"], ["v"], consume_from=1)
    on = ("cust", "c_id")

    def sync():
        refresh_join_mv(src, dim, mv, on=on)
        refresh_rollup(mv, roll, ["seg"], ["v"])

    def oracle():
        j = src.read().join(dim.read(), F.col("cust") == F.col("c_id"))
        return {
            r.seg: (r.n, float(r.s))
            for r in j.groupBy("seg")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
            .collect()
        }

    def got():
        return {r.seg: (r.n_rows, r.sum_v) for r in roll.read().collect()}

    src.append(spark.createDataFrame(
        [Row(id=1, cust=1, v=10), Row(id=2, cust=2, v=5),
         Row(id=3, cust=1, v=7)], LEFT))
    sync()
    assert got() == oracle() == {"A": (2, 17.0), "B": (1, 5.0)}

    # left update moves a row across segments (via its join key) AND a
    # dim update re-segments every matching MV row — both arrive at
    # the rollup as MV-level retraction+insert pairs
    src.merge(spark.createDataFrame([Row(id=1, cust=2, v=11)], LEFT))
    dim.merge(spark.createDataFrame([Row(c_id=1, seg="A2")], DIM))
    sync()
    assert got() == oracle() == {"A2": (1, 7.0), "B": (2, 16.0)}

    # left delete empties a segment's last row → group removed
    src.delete_keys(spark.createDataFrame([Row(id=3)]))
    sync()
    assert got() == oracle() == {"B": (2, 16.0)}

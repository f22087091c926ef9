"""Bucketed co-located joins: zero exchanges, correct results."""

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    # in-memory catalog + persistent /tmp warehouse can leave orphaned
    # table dirs from earlier sessions
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"/tmp/spark_graft_warehouse/{name}", ignore_errors=True)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    l = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "b_orders", 8, "o_orderkey")
    write_bucketed(l, "b_lineitem", 8, "o_orderkey")
    # force the fact-fact join path (tiny test tables would broadcast,
    # which hides the property under test: bucket co-location)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey").groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))

        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        join_section = plan.split("HashAggregate")[0]
        # the join itself must not shuffle either side (bucket
        # co-location); only the aggregation above it may exchange
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, f"bucketed join shuffled:\n{join_section}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # correctness: same result as the plain (shuffling) join
    expected = (
        o.join(l, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

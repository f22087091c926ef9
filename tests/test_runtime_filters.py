"""Bloom-filter runtime join pruning (plans/runtime_filters.py).

Asserts the Catalyst injection actually happens under demo thresholds
(the fact side gains a ``might_contain`` predicate fed by a bloom
filter aggregated from the filtered dim side), that it does NOT
happen under production thresholds on tiny local scans, and that
results are identical either way.
"""

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.plans.runtime_filters import (
    demo_thresholds,
    enable_runtime_bloom_filters,
    reset_defaults,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture
def fact_dim_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def build():
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
        )

    return build


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_injection_fires_under_demo_thresholds(spark, fact_dim_join):
    # shuffle join required: a broadcast join already prunes via the
    # broadcast relation, so Catalyst skips bloom injection for it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        demo_thresholds(spark)
        plan = optimized(fact_dim_join())
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        reset_defaults(spark)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_no_injection_on_small_scans_by_default(spark, fact_dim_join):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        enable_runtime_bloom_filters(spark)  # production thresholds
        plan = optimized(fact_dim_join())
        # local sf0.01 lineitem is far below the 10 GB application floor
        assert "might_contain" not in plan
    finally:
        reset_defaults(spark)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_results_identical_with_and_without(spark, fact_dim_join):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        demo_thresholds(spark)
        with_bloom = fact_dim_join().collect()
        reset_defaults(spark)
        without = fact_dim_join().collect()
        assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, without))
        assert len(with_bloom) == 1
    finally:
        reset_defaults(spark)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

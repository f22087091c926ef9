"""HLL sketch rollups (operators/sketches.py).

Pins the mergeability algebra: estimates from unioned fine-grained
sketches must match estimates sketched directly at the coarse level,
and both must sit within HLL's error bound of the exact counts.
"""

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.sketches import (
    distinct_sketches,
    rollup_estimate,
)
from s3_sqs_data_ingestion_demo_spark.queries import t

SF = "/root/testdata/sf0.01"


def _events(spark):
    return t(spark, SF, "events").withColumn("day", F.to_date("ts"))


def test_union_of_daily_matches_direct_total(spark):
    e = _events(spark)
    daily = distinct_sketches(e, ["day"], "user_id")
    merged = rollup_estimate(daily, []).first()[0]
    direct = rollup_estimate(
        distinct_sketches(e, [], "user_id"), []
    ).first()[0]
    # HLL union is lossless over same-lg_k sketches
    assert merged == direct


def test_estimates_within_bound_of_exact(spark):
    e = _events(spark)
    exact = e.agg(F.countDistinct("user_id")).first()[0]
    est = rollup_estimate(distinct_sketches(e, ["day"], "user_id"), []).first()[0]
    assert abs(est - exact) <= max(1, 0.05 * exact)


def test_grouped_rollup_from_fine_sketches(spark):
    e = _events(spark).withColumn("week", F.weekofyear("day"))
    fine = distinct_sketches(e, ["week", "day"], "user_id")
    weekly = rollup_estimate(fine, ["week"])
    exact = e.groupBy("week").agg(
        F.countDistinct("user_id").alias("exact")
    )
    joined = weekly.join(exact, "week").collect()
    assert len(joined) > 1
    for r in joined:
        assert abs(r.approx_distinct - r.exact) <= max(1, 0.05 * r.exact)

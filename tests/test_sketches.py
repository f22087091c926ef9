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


def test_kmv_exact_under_capacity_and_merge(spark):
    from pyspark.sql import functions as F

    from s3_sqs_data_ingestion_demo_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketches,
    )

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketches(df, ["g"], "v", k=64)
    est = {r.g: r.e for r in sk.select("g", kmv_estimate("kmv", 64).alias("e")).collect()}
    # under capacity -> exact
    assert est == {"a": 30.0, "b": 30.0}
    # merged sketch of a∪b estimates the true union (50 distinct),
    # exactly, because 50 < k
    merged = (
        sk.groupBy()
        .pivot("g", ["a", "b"])
        .agg(F.first("kmv"))
        .select(kmv_estimate(kmv_merge("a", "b", 64), 64).alias("e"))
        .collect()[0].e
    )
    assert merged == 50.0


def test_kmv_estimate_accuracy_over_capacity(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketches,
    )

    df = spark.range(5000).selectExpr("'g' AS g", "id AS v")
    sk = kmv_sketches(df, ["g"], "v", k=256)
    [r] = sk.select(kmv_estimate("kmv", 256).alias("e")).collect()
    assert abs(r.e - 5000) / 5000 < 0.15  # ~1/sqrt(k) regime


def test_heavy_hitters_exact_with_guarantee(spark):
    from pyspark.sql import functions as F

    from s3_sqs_data_ingestion_demo_spark.operators.sketches import (
        heavy_hitters,
    )

    # skewed synthetic: value i appears (21-i)*50 times, i in 0..20
    rows = [(f"v{i:02d}",) for i in range(21) for _ in range((21 - i) * 50)]
    df = spark.createDataFrame(rows, "k string").repartition(13)
    out = heavy_hitters(df, "k", k=5, capacity=256).collect()
    got = sorted((r.value, r.cnt) for r in out)
    want = sorted((f"v{i:02d}", (21 - i) * 50) for i in range(5))
    assert got == want
    assert all(r.exact_guaranteed == 1 for r in out)
    # result is identical under a different partitioning (the
    # guarantee makes candidates a superset everywhere)
    out2 = heavy_hitters(df.repartition(3), "k", k=5, capacity=256).collect()
    assert sorted((r.value, r.cnt) for r in out2) == want


def test_heavy_hitters_reports_lost_guarantee(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.sketches import (
        heavy_hitters,
    )

    # near-uniform data with capacity too small for the threshold:
    # counts are right for whatever candidates survive, but the flag
    # must report the guarantee is gone
    df = spark.range(5000).selectExpr("CAST(id % 1000 AS STRING) AS k")
    out = heavy_hitters(df, "k", k=5, capacity=64).collect()
    assert all(r.exact_guaranteed == 0 for r in out)

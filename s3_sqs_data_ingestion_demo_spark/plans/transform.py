"""Pre-sink SQL transform hook.

The reference's ``job.json`` carries a ``transform_query`` key that its
code never reads (reference: spark-job/job.json:19 — dormant config).
This engine wires it: the micro-batch is registered as view ``batch``
(alias ``source_table`` for merge-SQL parity, reference:
spark-job/read.py:176) and the configured SQL runs before the sink.
This is the hook that exposes the whole Spark SQL operator surface —
joins, aggregations, windows, scalar functions — to declarative jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def apply_transform_query(
    spark: SparkSession, df: DataFrame, query: str | None
) -> DataFrame:
    if not query or not query.strip():
        return df
    df.createOrReplaceTempView("batch")
    df.createOrReplaceTempView("source_table")
    try:
        return spark.sql(query)
    finally:
        # Views are session-scoped; drop so successive batches don't leak.
        spark.catalog.dropTempView("batch")
        spark.catalog.dropTempView("source_table")

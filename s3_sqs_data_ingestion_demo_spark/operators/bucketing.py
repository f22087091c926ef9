"""Bucketed-table support: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle.
Writing both tables bucketed (and sorted) by the join key hash-places
matching rows in the same bucket file, so Spark's planner joins
bucket-for-bucket with NO exchange — the DataFrame-level equivalent of
co-partitioned storage.

Bucket metadata lives in the session catalog (``saveAsTable``); plain
``parquet(path)`` writes cannot carry it.  Keep ``n_buckets`` equal on
both sides (or an integer multiple) so the planner can align them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int,
    key: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as a catalog-registered bucketed parquet table.
    Sorting within buckets additionally removes the join-time sort
    (sort-merge join degenerates to a streamed merge)."""
    writer = df.write.format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode("overwrite").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    planner produces a SortMergeJoin with zero Exchange on either side
    (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)

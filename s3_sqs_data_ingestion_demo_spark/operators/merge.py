"""Upsert / CDC-merge operators as pure DataFrame programs.

The reference's only real query is a MERGE INTO with a windowed
dedup-by-recency subquery (reference: spark-job/mergeSQL.sql:1-43,
executed at spark-job/read.py:173-180).  These helpers re-express the
same semantics as composable DataFrame transformations so they run on
any table backend, not just a V2 catalog.

Scale notes: both operators shuffle exactly once on the key columns
(hash partition → per-partition sort → window), which is the canonical
Spark top-1-per-group plan.  ``merge_upsert`` is designed so the
target side can be partition-pruned before the join (see
``table.ManagedTable.merge``) and never collects data to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ROW_NUM = "__sg_row_num"


def dedup_latest(
    df: DataFrame, key_columns: Sequence[str], order_column: str
) -> DataFrame:
    """Keep the most recent row per key.

    Identical semantics to the reference's ranked subquery
    (reference: spark-job/mergeSQL.sql:14-21): ``ROW_NUMBER() OVER
    (PARTITION BY keys ORDER BY order_column DESC) = 1``.  The window
    form is kept (not ``dropDuplicates``) because it is deterministic
    under ties-by-arrival and survives AQE re-planning.
    """
    w = Window.partitionBy(*key_columns).orderBy(
        F.col(order_column).desc(), *[F.col(k) for k in key_columns]
    )
    return (
        df.withColumn(_ROW_NUM, F.row_number().over(w))
        .filter(F.col(_ROW_NUM) == 1)
        .drop(_ROW_NUM)
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_columns: Sequence[str],
    order_column: str | None = None,
    policy: str = "unconditional",
) -> DataFrame:
    """Return the post-merge contents of ``target`` upserted with ``source``.

    Policies (reference semantics analysis: SURVEY.md §2.4 T4):

    - ``unconditional`` — matched keys take the source row no matter
      what, matching the reference's WHEN MATCHED THEN UPDATE with no
      timestamp guard (reference: spark-job/mergeSQL.sql:24-32).
      Implemented as ``target ANTI-JOIN source ∪ source``.
    - ``latest_wins`` — matched keys keep whichever row has the larger
      ``order_column`` (requires the target to retain that column);
      the corrected mode that is safe under out-of-order redelivery.
      Implemented as ``(target ∪ source)`` → ``dedup_latest``.

    Within-batch duplicates in ``source`` are always resolved first by
    ``dedup_latest`` when ``order_column`` is given, mirroring the
    reference's dedup subquery.
    """
    keys = list(key_columns)
    if order_column is not None:
        source = dedup_latest(source, keys, order_column)
    if policy == "unconditional":
        # null-safe anti: a source row carrying a null key must
        # REPLACE the target's null-keyed row, not duplicate it (plain
        # equality never matches NULL; dedup_latest's window already
        # groups null keys, so both policies agree on the contract)
        from ..table import join_nullsafe  # noqa: PLC0415

        kept = join_nullsafe(target, source.select(*keys), keys, "left_anti")
        return kept.unionByName(source.select(*target.columns))
    if policy == "latest_wins":
        if order_column is None:
            raise ValueError("latest_wins merge requires an order_column")
        unioned = target.unionByName(source.select(*target.columns))
        return dedup_latest(unioned, keys, order_column)
    raise ValueError(f"unknown merge policy: {policy!r}")

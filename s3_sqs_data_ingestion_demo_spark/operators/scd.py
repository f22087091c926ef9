"""Slowly-changing-dimension (SCD type 2) history from CDC changes.

The reference's merge pipeline keeps only each key's LATEST state
(type 1).  Type 2 keeps every version with a validity interval —
the dimension-history table warehouse pipelines build from the same
CDC feed — and composes with the as-of join for point-in-time
lookups ("what was this customer's segment when the order shipped").

Model: a change row (keys..., attrs..., order_col) opens a version at
``order_col``; the version closes when the key's next change opens
(``valid_to_seq`` = next ``order_col``, null while current).

Scale shape: history derivation is ONE window pass per batch-affected
key (lead over the change sequence); the incremental path
(``scd2_merge``) touches only keys present in the batch — existing
versions of affected keys are read back with a key semi-join, the
window recomputes over (existing ∪ batch) for those keys only, and
the result merges back keyed on (keys..., valid_from_seq): closed-out
current rows update in place, new versions append.  O(batch) work per
batch, independent of history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..table import ManagedTable


def _dedup_changes(
    changes: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """At most one change per (key, seq): a redelivered change row is
    dropped deterministically (ties broken by the remaining columns
    descending, so retries with identical payloads are a no-op)."""
    others = [c for c in changes.columns if c not in set(keys) and c != order_col]
    w = Window.partitionBy(*keys, order_col).orderBy(
        *[F.col(c).desc_nulls_last() for c in others] or [F.lit(1)]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_history(
    changes: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """Full history from a change log in one window pass: each change
    becomes a version row with ``valid_from_seq`` = its sequence,
    ``valid_to_seq`` = the key's next sequence (null while current),
    ``is_current`` flagging the open version."""
    d = _dedup_changes(changes, keys, order_col)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    nxt = F.lead(order_col).over(w)
    attrs = [c for c in d.columns if c not in set(keys) and c != order_col]
    return d.select(
        *keys,
        *attrs,
        F.col(order_col).cast("long").alias("valid_from_seq"),
        nxt.cast("long").alias("valid_to_seq"),
        nxt.isNull().cast("int").alias("is_current"),
    )


def scd2_schema(changes: DataFrame, keys: list[str], order_col: str):
    from pyspark.sql import types as T  # noqa: PLC0415

    fields = [f for f in changes.schema.fields if f.name != order_col]
    fields += [
        T.StructField("valid_from_seq", T.LongType(), True),
        T.StructField("valid_to_seq", T.LongType(), True),
        T.StructField("is_current", T.IntegerType(), True),
    ]
    return T.StructType(fields)


def create_scd2_table(
    spark, path: str, changes: DataFrame, keys: list[str], order_col: str
) -> ManagedTable:
    """DDL for the history table: keyed by (keys..., valid_from_seq) so
    incremental merges replace closed-out versions in place."""
    return ManagedTable.create(
        spark,
        path,
        scd2_schema(changes, keys, order_col),
        key_cols=list(keys) + ["valid_from_seq"],
        table_type="MOR",
        # per-batch history folds are O(batch keys): bound each delta
        # commit's file count (table.py "write.max-delta-files")
        properties={"write.max-delta-files": "4"},
    )


def scd2_merge(
    table: ManagedTable, batch: DataFrame, keys: list[str], order_col: str
) -> int:
    """Incrementally fold a CDC batch into the history table: only the
    batch's keys are re-windowed (existing versions of those keys ∪
    the batch's changes), then merged back on (keys, valid_from_seq)."""
    batch_keys = batch.select(*keys).distinct()
    existing = (
        table.read()
        .join(batch_keys, list(keys), "left_semi")
        .drop("valid_to_seq", "is_current")
        .withColumnRenamed("valid_from_seq", order_col)
    )
    combined = existing.unionByName(
        batch.select(*existing.columns)
    )
    return table.merge(scd2_history(combined, keys, order_col))


def asof_lookup(
    history: DataFrame, keys: list[str], seq_col_value
) -> DataFrame:
    """Point-in-time slice: the version of each key valid AT a given
    sequence number — the SCD2 read pattern (half-open intervals:
    from ≤ s < to)."""
    s = F.lit(seq_col_value)
    return history.filter(
        (F.col("valid_from_seq") <= s)
        & (F.col("valid_to_seq").isNull() | (F.col("valid_to_seq") > s))
    )

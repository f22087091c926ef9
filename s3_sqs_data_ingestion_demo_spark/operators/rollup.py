"""Incrementally-maintained aggregate tables (materialized rollups).

The lakehouse pattern behind every "hypertable rollup" / continuous
aggregate: a summary ``ManagedTable`` kept in sync with its source by
consuming the source's CHANGE FEED (``read_changes`` file-level fast
path) instead of re-aggregating the world — refresh cost is
O(new data), not O(table).

Supported aggregates: count + sums (the additive family).  Additive
maintenance is only sound for APPEND-ONLY change streams: an update
stream needs retractions (old-image subtraction) which this feed does
not carry, so the refresh detects merge (delta) commits in the
consumed window and fails loudly rather than double-counting.

Scale shape per refresh: one aggregate over the delta (partial,
map-side combined), one semi-join read of the affected rollup groups
(group-key equi-join; rollup tables are group-cardinality-sized), one
keyed merge back.  The source version consumed is persisted in the
rollup table's properties, so refresh is restartable and idempotent —
a crashed refresh re-reads the same window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ManagedTable

_STATE_KEY = "rollup.src-version"


def rollup_schema(
    group_fields: list[T.StructField], sum_cols: list[str]
) -> T.StructType:
    fields = list(group_fields) + [T.StructField("n_rows", T.LongType(), True)]
    fields += [T.StructField(f"sum_{c}", T.DoubleType(), True) for c in sum_cols]
    return T.StructType(fields)


def create_rollup(
    src: ManagedTable,
    path: str,
    group_cols: list[str],
    sum_cols: list[str],
) -> ManagedTable:
    """DDL for the summary table: keyed by the group columns, MOR so
    refreshes are O(delta) appends."""
    group_fields = [
        f for f in src.meta.schema.fields if f.name in set(group_cols)
    ]
    if len(group_fields) != len(group_cols):
        missing = set(group_cols) - {f.name for f in group_fields}
        raise ValueError(f"group columns missing from source schema: {missing}")
    dst = ManagedTable.create(
        src.spark,
        path,
        rollup_schema(group_fields, sum_cols),
        key_cols=list(group_cols),
        table_type="MOR",
        # refresh folds are O(changed groups) but arrive with shuffle
        # fan-out — bound each delta commit's file count (table.py
        # "write.max-delta-files")
        properties={"write.max-delta-files": "4"},
    )
    dst.set_properties(**{_STATE_KEY: src._current_version()})
    return dst


def refresh_rollup(
    src: ManagedTable,
    dst: ManagedTable,
    group_cols: list[str],
    sum_cols: list[str],
) -> int:
    """Fold the source changes since the last refresh into the rollup;
    returns the new rollup version (current version when there was
    nothing to consume).

    Fails loudly if the consumed window contains merge (delta) commits
    — additive maintenance cannot represent updates without
    retractions (see module docstring)."""
    last = int(dst.meta.properties.get(_STATE_KEY, 1))
    cur = src._current_version()
    if cur <= last:
        return dst._current_version()
    # append-only guard: every entry added in (last, cur] must be a
    # plain append, not a merge delta
    old_entries = src._manifest_at(last)
    for e in src._manifest_at(cur):
        if e not in old_entries and e.get("kind") == "delta":
            raise ValueError(
                "refresh_rollup consumes an append-only change stream; "
                f"source window v{last}->v{cur} contains merge commits "
                "(updates need retraction handling)"
            )
    delta = src.read_changes(last, cur)
    agg = delta.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_d_n"),
        *[F.sum(F.col(c).cast("double")).alias(f"_d_{c}") for c in sum_cols],
    )
    # current values of ONLY the affected groups (rollup tables are
    # group-cardinality-sized; the join is on the rollup's key)
    existing = dst.read().join(agg.select(*group_cols), list(group_cols), "left_semi")
    combined = (
        agg.join(existing, list(group_cols), "left")
        .select(
            *group_cols,
            (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("_d_n")).alias("n_rows"),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0.0)) + F.col(f"_d_{c}")
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
    )
    version = dst.merge(combined)
    dst.set_properties(**{_STATE_KEY: cur})
    return version

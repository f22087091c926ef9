"""Incrementally-maintained aggregate tables (materialized rollups).

The lakehouse pattern behind every "hypertable rollup" / continuous
aggregate: a summary ``ManagedTable`` kept in sync with its source by
consuming the source's CHANGE FEED (``read_changes`` file-level fast
path) instead of re-aggregating the world — refresh cost is
O(new data), not O(table).

Supported aggregates: count + sums (the additive family).  Append-only
change windows fold the plain change feed (weight +1 per row); windows
containing merge deltas, tombstoned deletes, or rewrites consume the
CDF (``read_changes_cdf``) instead, where pre-images and deletes carry
weight -1 — the RETRACTION — so updates move a row's contribution
between groups exactly and emptied groups are deleted.

Scale shape per refresh: one aggregate over the delta (partial,
map-side combined), one semi-join read of the affected rollup groups
(group-key equi-join; rollup tables are group-cardinality-sized), one
keyed merge back.  Crash safety: the fold commits under a tag derived
from the consumed source window (``rollup-<lo>-<hi>``) BEFORE the
consume cursor advances in a separate metadata write — a refresh that
crashed between the two replays the same window, finds the tag via
``has_commit_tag``, and skips the fold instead of re-adding a delta
the rollup already contains.  Keep ``expire_snapshots``' horizon
longer than the restart window or the tag probe loses its witness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ManagedTable

_STATE_KEY = "rollup.src-version"


def change_segments(src: ManagedTable, lo: int, hi: int) -> list[tuple[int, int]]:
    """Split the consumed window ``(lo, hi]`` at "maintenance" commits
    (compaction: content-neutral rewrites).  A rewrite inside the
    window would push ``read_changes_cdf`` onto its full-diff
    fallback; skipping the neutral step keeps every segment on the
    O(segment) fast path — the same reasoning every lakehouse change
    feed applies to rewrite-only snapshots.  Per-segment deltas
    compose (additively for rollups, by key-set union for join MVs).
    Returns [] for a maintenance-only window."""
    vs = [v for v in src.history() if lo <= v <= hi]
    segments: list[tuple[int, int]] = []
    seg_lo = prev = vs[0]
    for v in vs[1:]:
        if src._snapshot_kind(v) == "maintenance":
            if seg_lo != prev:
                segments.append((seg_lo, prev))
            seg_lo = v
        prev = v
    if seg_lo != vs[-1]:
        segments.append((seg_lo, vs[-1]))
    return segments


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
    consume_from: int | None = None,
) -> ManagedTable:
    """DDL for the summary table: keyed by the group columns, MOR so
    refreshes are O(delta) appends.

    ``consume_from`` anchors the change-feed cursor: default = the
    source's CURRENT version (track new data only); pass ``1`` (the
    empty created snapshot) to have the first refresh bootstrap the
    rollup from the source's existing content via the same feed."""
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
    dst.set_properties(
        **{
            _STATE_KEY: (
                src._current_version()
                if consume_from is None
                else int(consume_from)
            )
        }
    )
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

    Append-only windows consume the plain change feed (one aggregate
    over the new files, weight +1 per row).  Windows containing merge
    deltas, tombstoned deletes, or rewrites consume the CDF instead
    (``read_changes_cdf``): pre-images and deletes contribute weight
    -1 — the retraction — and post-images/inserts +1, so updates move
    a row's contribution between groups exactly.  Groups whose count
    reaches zero are deleted from the rollup, not left as zero rows.
    Refresh cost stays O(window + matching base keys + affected
    groups).

    The fold is exactly-once under crash replay: the combined frame
    (INCLUDING emptied groups, at count 0) merges under a
    window-derived commit tag, then the emptied groups are deleted,
    then the cursor advances.  A replayed window whose tag is already
    live skips straight to the (idempotent) emptied-group sweep and
    the cursor write — never re-folding a delta the rollup already
    absorbed."""
    last = int(dst.meta.properties.get(_STATE_KEY, 1))
    cur = src._current_version()
    if cur <= last:
        return dst._current_version()

    window_tag = f"rollup-{last}-{cur}"
    # Crash replay (died between the tagged fold commit and the cursor
    # write): the delta is already in the rollup.  Finish the two
    # idempotent steps and advance.  The probe is bounded — a replayed
    # fold is by definition the newest activity on the rollup table.
    if dst.has_commit_tag(window_tag, max_scan=16):
        zero = dst.read().filter(F.col("n_rows") <= 0).select(*group_cols)
        if not zero.isEmpty():
            dst.delete_keys(zero)
        dst.set_properties(**{_STATE_KEY: cur})
        return dst._current_version()

    segments = change_segments(src, last, cur)
    if not segments:  # maintenance-only window: nothing to fold
        dst.set_properties(**{_STATE_KEY: cur})
        return dst._current_version()

    def _segment_delta(seg_lo: int, seg_hi: int) -> DataFrame:
        old_entries = src._manifest_at(seg_lo)
        new_entries = src._manifest_at(seg_hi)
        pure_append = all(e in new_entries for e in old_entries) and not any(
            e not in old_entries and e.get("kind") in ("delta", "tombstone")
            for e in new_entries
        )
        if pure_append:
            return src.read_changes(seg_lo, seg_hi).withColumn(
                "_w", F.lit(1)
            )
        return (
            src.read_changes_cdf(seg_lo, seg_hi)
            .withColumn(
                "_w",
                F.when(
                    F.col("_change_type").isin(
                        "insert", "update_postimage"
                    ),
                    1,
                ).otherwise(-1),
            )
            .drop("_change_type")
        )

    delta = _segment_delta(*segments[0])
    for seg in segments[1:]:
        delta = delta.unionByName(_segment_delta(*seg))
    agg = delta.groupBy(*group_cols).agg(
        F.sum("_w").alias("_d_n"),
        *[
            F.sum(F.col("_w") * F.col(c).cast("double")).alias(f"_d_{c}")
            for c in sum_cols
        ],
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
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
                    + F.coalesce(F.col(f"_d_{c}"), F.lit(0.0))
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        # group-cardinality-bounded frame read twice (upsert + the
        # emptied-group delete) — pin it once
        .localCheckpoint(eager=True)
    )
    # Emptied groups (count 0) are INCLUDED in the tagged merge so a
    # crash before their delete leaves a visible marker the replay
    # sweep can finish from — excluding them would strand their stale
    # pre-fold rows if the delete never ran.
    version = dst.merge(combined, tag=window_tag)
    emptied = combined.filter(F.col("n_rows") <= 0).select(*group_cols)
    if not emptied.isEmpty():
        version = dst.delete_keys(emptied)
    dst.set_properties(**{_STATE_KEY: cur})
    return version

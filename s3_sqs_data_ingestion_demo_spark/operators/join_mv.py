"""Incrementally-maintained JOIN materializations.

The join counterpart of operators/rollup.py's aggregate rollups: a
``ManagedTable`` holding ``left ⋈ right`` (inner equi-join), kept in
sync by consuming BOTH sources' change feeds instead of re-joining the
world.  Where the rollup folds weighted retractions (the additive
family lets deltas add), a join's delta is not additive in any useful
way once join keys can move — so the MV refreshes by AFFECTED-KEY
RECOMPUTE, the strategy streaming systems call delta-rejoin:

1. collect the join-key values touched by either source's change
   window (CDF pre-images included — a row whose join key CHANGED
   dirties both its old and new key value);
2. re-join ONLY those keys from the sources' current states (the
   value-set is pushed to the parquet scans via ``read_where_in``
   when bounded, a broadcast semi-join otherwise);
3. upsert the recomputed slice into the MV by its composite key
   (left keys + right keys) and delete MV rows whose key vanished
   from the slice.

Refresh cost is O(changed windows + rows matching the affected keys),
never O(table).  The recompute makes refresh IDEMPOTENT BY
CONSTRUCTION: replaying a window (crash before the cursor write)
re-derives the same affected keys from current state and converges —
no additive double-count is possible, so no commit tag is needed
(contrast refresh_rollup, which folds deltas and must tag).  A crash
between the slice merge and the vanished-key delete leaves only
transiently stale rows that the replay removes.

Scale shape at 100 TB: both slice reads are key-restricted scans
(manifest min/max entry skip + parquet pushdown through
``read_where_in``); the slice join is bounded by the batch's affected
keys, not the table; the MV write is a keyed MOR delta.  Skewed join
keys hit the slice join only — bounded frames Spark's AQE handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ManagedTable, join_nullsafe
from .rollup import ChangeWindowCache, change_segments

_LEFT_KEY = "join-mv.left-version"
_RIGHT_KEY = "join-mv.right-version"
_CAP_KEY = "join-mv.max-affected-keys"


def create_join_mv(
    left: ManagedTable,
    right: ManagedTable,
    path: str,
    on: tuple[str, str],
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    consume_from: tuple[int, int] | None = None,
) -> ManagedTable:
    """DDL for the materialization of ``left ⋈ right ON l.on[0] =
    r.on[1]``: keyed by the concatenation of both sources' key columns
    (so many-to-many joins materialize one row per matched pair), MOR
    so refreshes are O(delta) upserts.

    Column selections default to each source's full schema; they must
    include that side's key columns and the join column, and the two
    selections must not collide on names (rename upstream — the MV is
    a flat table).  ``consume_from`` anchors both change-feed cursors
    (default: each source's CURRENT version; pass ``(1, 1)`` to
    bootstrap from existing content on the first refresh)."""
    lcol, rcol = on
    lsel = list(left_cols or left.meta.schema.fieldNames())
    rsel = list(right_cols or right.meta.schema.fieldNames())
    for side, tbl, sel, jc in (
        ("left", left, lsel, lcol),
        ("right", right, rsel, rcol),
    ):
        missing = (set(tbl.meta.key_cols) | {jc}) - set(sel)
        if missing:
            raise ValueError(
                f"{side} column selection must include that side's key "
                f"and join columns; missing {sorted(missing)}"
            )
        unknown = set(sel) - set(tbl.meta.schema.fieldNames())
        if unknown:
            raise ValueError(
                f"{side} columns not in source schema: {sorted(unknown)}"
            )
        if not tbl.meta.key_cols:
            raise ValueError(
                f"join MV sources need key columns ({side} side has none)"
            )
    clash = set(lsel) & set(rsel)
    if clash:
        raise ValueError(
            f"left/right selections collide on {sorted(clash)} — rename "
            "columns upstream; the MV is a flat table"
        )
    lfields = {f.name: f for f in left.meta.schema.fields}
    rfields = {f.name: f for f in right.meta.schema.fields}
    schema = T.StructType(
        [lfields[c] for c in lsel] + [rfields[c] for c in rsel]
    )
    mv = ManagedTable.create(
        left.spark,
        path,
        schema,
        key_cols=list(left.meta.key_cols) + list(right.meta.key_cols),
        table_type="MOR",
        properties={"write.max-delta-files": "4"},
    )
    lv, rv = (
        (left._current_version(), right._current_version())
        if consume_from is None
        else (int(consume_from[0]), int(consume_from[1]))
    )
    mv.set_properties(
        **{
            _LEFT_KEY: lv,
            _RIGHT_KEY: rv,
            # column provenance: refresh projects each source slice to
            # ITS selection before joining, so a non-selected column
            # sharing a name across sources can never be picked from
            # the wrong side (and the scans stay column-pruned)
            "join-mv.left-cols": ",".join(lsel),
            "join-mv.right-cols": ",".join(rsel),
        }
    )
    return mv


def _affected_keys(
    src: ManagedTable,
    col: str,
    lo: int,
    hi: int,
    window_cache: ChangeWindowCache | None = None,
) -> DataFrame | None:
    """Distinct join-key values whose MATCH SET may have changed in
    ``(lo, hi]`` — insert/delete rows and BOTH images of updates (a
    moved join key dirties its old and new value).  None = no data
    segments (maintenance-only window).

    With a ``window_cache`` (the declarative batch path) the values
    project off the batch's SHARED pinned change frame instead of
    re-reading the window's CDF: the weighted frame carries exactly
    the same row images (inserts/post-images at +1, deletes/pre-images
    at -1 — pure-append segments contribute their inserted rows either
    way), so the distinct ``col`` values are identical by
    construction."""
    if window_cache is not None:
        if not window_cache.segments(src, lo, hi):
            return None
        frame, _ = window_cache.weighted_changes(src, lo, hi)
        return (
            frame.select(F.col(col).alias("_jk"))
            .filter(F.col("_jk").isNotNull())
            .distinct()
        )
    segments = change_segments(src, lo, hi)
    if not segments:
        return None
    parts = [
        src.read_changes_cdf(s_lo, s_hi).select(F.col(col).alias("_jk"))
        for s_lo, s_hi in segments
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # nulls never match an inner equi-join — no MV row to maintain
    return out.filter(F.col("_jk").isNotNull()).distinct()


def refresh_join_mv(
    left: ManagedTable,
    right: ManagedTable,
    mv: ManagedTable,
    on: tuple[str, str],
    window_cache: ChangeWindowCache | None = None,
) -> int:
    """Fold both sources' changes since the last refresh into the MV;
    returns the new MV version (current version when caught up).

    See the module header for the affected-key-recompute strategy and
    its idempotence-by-construction crash contract.  ``window_cache``
    (optional) shares each side's pinned change frame with the batch's
    other maintenance families (rollup.ChangeWindowCache)."""
    lcol, rcol = on
    last_l = int(mv.meta.properties.get(_LEFT_KEY, 1))
    last_r = int(mv.meta.properties.get(_RIGHT_KEY, 1))
    cur_l = left._current_version()
    cur_r = right._current_version()
    if cur_l <= last_l and cur_r <= last_r:
        return mv._current_version()

    parts = []
    if cur_l > last_l:
        p = _affected_keys(left, lcol, last_l, cur_l, window_cache)
        if p is not None:
            parts.append(p)
    if cur_r > last_r:
        p = _affected_keys(right, rcol, last_r, cur_r, window_cache)
        if p is not None:
            parts.append(p)
    if not parts:  # maintenance-only windows on both sides
        mv.set_properties(**{_LEFT_KEY: cur_l, _RIGHT_KEY: cur_r})
        return mv._current_version()
    affected = parts[0]
    for p in parts[1:]:
        affected = affected.unionByName(p)
    # evaluated once by the capped collect on the fast path but up to
    # THREE times by the distributed path's semi-joins (each a full
    # change-feed recomputation) — pin it; bounded by the windows'
    # distinct join-key values
    affected = affected.distinct().localCheckpoint(eager=True)

    # Bounded-key fast path: collect the value set (capped, probed via
    # limit(cap+1) so a huge batch never grows the driver) and push it
    # to BOTH sources' scans as an isin — manifest entry skip + parquet
    # row-group skip.  Past the cap, stay fully distributed: semi-join
    # each source against the affected frame instead.
    cap = int(mv.meta.properties.get(_CAP_KEY, 10_000))
    vals = [r._jk for r in affected.limit(cap + 1).collect()]
    lsel = mv.meta.properties["join-mv.left-cols"].split(",")
    rsel = mv.meta.properties["join-mv.right-cols"].split(",")
    if len(vals) <= cap:
        if not vals:  # windows netted to zero changed keys
            mv.set_properties(**{_LEFT_KEY: cur_l, _RIGHT_KEY: cur_r})
            return mv._current_version()
        l_slice = left.read_where_in(lcol, vals).select(*lsel)
        r_slice = right.read_where_in(rcol, vals).select(*rsel)
        mv_touched = mv.read_where_in(lcol, vals)
    else:
        # past the cap the value set never reaches the driver: stay
        # fully distributed with a semi-join per source (AQE picks
        # broadcast when the affected frame turns out small)
        l_slice = left.read().join(
            affected, F.col(lcol) == F.col("_jk"), "left_semi"
        ).select(*lsel)
        r_slice = right.read().join(
            affected, F.col(rcol) == F.col("_jk"), "left_semi"
        ).select(*rsel)
        mv_touched = mv.read().join(
            affected, F.col(lcol) == F.col("_jk"), "left_semi"
        )

    mv_cols = mv.meta.schema.fieldNames()
    lnames = set(lsel)
    slice_df = (
        l_slice.join(r_slice, l_slice[lcol] == r_slice[rcol], "inner")
        .select(
            *[
                (l_slice[c] if c in lnames else r_slice[c]).alias(c)
                for c in mv_cols
            ]
        )
        # read twice (upsert + vanished-key anti-join) — pin it once;
        # bounded by the affected keys' match set
        .localCheckpoint(eager=True)
    )
    keys = list(mv.meta.key_cols)
    version = mv.merge(slice_df)
    # MV rows whose join key was affected but which the recomputed
    # slice no longer contains: their source row was deleted or its
    # join key moved away — remove them.  (mv_touched is read AFTER
    # the merge would be wrong: it was computed above, against the
    # pre-merge state, which is exactly the set that can vanish.)
    vanished = (
        # null-safe anti on the composite MV key: join KEYS are
        # non-null by inner-join semantics, but a source's PRIMARY key
        # may carry a null the table layer now supports — a stale pair
        # keyed by it must still vanish
        join_nullsafe(
            mv_touched.select(*keys), slice_df.select(*keys), keys,
            "left_anti",
        )
    )
    # one consumer since delete_keys probes emptiness via its own
    # tombstone write (r13): the old pin + isEmpty pair here was two
    # extra jobs per refresh.  mv_touched was bound (manifest roots
    # resolved) BEFORE the merge above, so the lazy anti-join still
    # reads the pre-merge MV state inside the delete's write job.
    version = mv.delete_keys(vanished)  # empty set → current version
    mv.set_properties(**{_LEFT_KEY: cur_l, _RIGHT_KEY: cur_r})
    return version

"""Incrementally-maintained top-k-per-group materializations.

The "best N rows per group" summary every curation pipeline keeps
(highest-quality documents per domain, largest orders per status,
most-recent events per user) — maintained from the source's CHANGE
FEED instead of re-ranking the world.  This generalizes the rollup's
MIN/MAX machinery (operators/rollup.py) from k=1 extremes to k full
rows:

* INSERT-ONLY windows fold without touching the base table: the new
  rows compete with the group's CURRENT top-k (at most k rows per
  group, already materialized), a window rank keeps the best k, and
  rows pushed out are deleted — O(window + k·affected groups).
* Windows containing RETRACTIONS (merge deltas, tombstoned deletes,
  rewrites) cannot fold — removing the 3rd-best row says nothing
  about the new 3rd-best — so every retraction-touched group is
  RESCANNED from the source pinned at the window's high version,
  exactly like the MIN/MAX rescan: output bounded by the affected
  groups, never O(table).

Ranking is a STRICT TOTAL ORDER — ``order_col`` (desc or asc, nulls
last) with the id columns as the tie-break — so the maintained set is
deterministic and a full re-rank of the final state reproduces it
bit-exactly (the invariant the tests pin).

Crash safety mirrors the rollup: the upsert of the window's winners
commits under a window-derived tag (``topk-<lo>-<hi>``) BEFORE the
push-out/vanished-row delete and the cursor write; a retry RECOVERS a
crashed attempt's window via the bounded tag-prefix probe, recomputes
the same winners deterministically (change feed + pinned base read),
skips the already-committed merge, and finishes the idempotent delete
sweep.  The fold path stays deterministic across a replay because the
crashed merge only ever ADDS winners that were already in the
candidate set — re-ranking the post-crash state picks the same k.

Contract shared with the rollup: plain ``append()`` commits must
carry NEW keys only (use ``merge`` for upserts — its delta entries
route the window onto the CDF retraction path).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ManagedTable, join_nullsafe
from .rollup import (
    ChangeWindowCache,
    _rescan_base,
    change_segments,
    window_weighted_changes,
)

_STATE_KEY = "topk.src-version"


def _mv_fields(
    src: ManagedTable, cols: list[str], what: str
) -> list[T.StructField]:
    by_name = {f.name: f for f in src.meta.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"{what} columns missing from source schema: {missing}")
    return [
        T.StructField(by_name[c].name, by_name[c].dataType, True) for c in cols
    ]


def create_topk_mv(
    src: ManagedTable,
    path: str,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_cols: list[str],
    payload_cols: list[str] | None = None,
    descending: bool = True,
    consume_from: int | None = None,
) -> ManagedTable:
    """DDL for the top-k table: one row per retained source row,
    keyed by (group, id) so refreshes are O(delta) keyed merges.
    ``id_cols`` must be a per-row unique identifier within each group
    (typically the source's key columns) — it is both the MV key and
    the ranking tie-break, which is what makes the maintained set
    deterministic.  ``consume_from=1`` bootstraps from the source's
    existing content on the first refresh."""
    if int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not id_cols:
        raise ValueError("top-k MVs need id_cols (the per-row identity)")
    overlap = set(group_cols) & set(id_cols)
    if overlap:
        raise ValueError(
            f"id columns {sorted(overlap)} duplicate group columns"
        )
    payload_cols = [
        c
        for c in (payload_cols or [])
        if c not in set(group_cols) | set(id_cols) | {order_col}
    ]
    fields = (
        _mv_fields(src, list(group_cols), "group")
        + _mv_fields(src, list(id_cols), "id")
        + _mv_fields(src, [order_col], "order")
        + _mv_fields(src, payload_cols, "payload")
    )
    dst = ManagedTable.create(
        src.spark,
        path,
        T.StructType(fields),
        key_cols=list(group_cols) + list(id_cols),
        table_type="MOR",
        properties={
            "write.max-delta-files": "4",
            "topk.k": str(int(k)),
            "topk.order-column": order_col,
            "topk.descending": str(bool(descending)).lower(),
            # the group/id split and the order are part of the MV's
            # identity: refreshes and routing validate against them
            "topk.group-columns": json.dumps(list(group_cols)),
            "topk.id-columns": json.dumps(list(id_cols)),
        },
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


def _check_contract(
    dst: ManagedTable,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_cols: list[str],
    descending: bool,
) -> None:
    """The ranking contract (k, order, direction, group/id split) is
    part of the MV's identity, persisted at create — a refresh under a
    DIFFERENT contract would silently corrupt the set (raising k
    cannot resurrect rows already pushed out; flipping the order ranks
    a candidate set maintained under the old order), so any drift is a
    loud error: rebuild the MV to change the contract."""
    props = dst.meta.properties
    want = {
        "topk.k": str(int(k)),
        "topk.order-column": order_col,
        "topk.descending": str(bool(descending)).lower(),
        "topk.group-columns": json.dumps(list(group_cols)),
        "topk.id-columns": json.dumps(list(id_cols)),
    }
    for key, val in want.items():
        stored = props.get(key)
        if stored is None:
            # an absent contract key means the table is not a top-k MV
            # created by create_topk_mv (or its properties were lost) —
            # skipping the comparison would accept ANY k/order/
            # direction/group split, the exact corruption class this
            # check exists to prevent
            raise ValueError(
                f"top-k contract missing: {key} is not persisted on "
                f"{dst.path} — the table was not created by "
                "create_topk_mv or its contract properties were lost; "
                "recreate the MV (create_topk_mv) rather than "
                "refreshing under an unverifiable contract"
            )
        if stored != val:
            raise ValueError(
                f"top-k contract drift: {key} is {stored!r} on the MV "
                f"but this refresh declares {val!r} — the ranking "
                "contract is immutable; rebuild the MV to change it"
            )


def _rank(order_col: str, descending: bool, id_cols: list[str]):
    from pyspark.sql import Window  # noqa: PLC0415

    order = (
        F.col(order_col).desc_nulls_last()
        if descending
        else F.col(order_col).asc_nulls_last()
    )
    return Window.partitionBy("_g").orderBy(
        order, *[F.col(c).asc_nulls_last() for c in id_cols]
    )


def _topk_of(
    cands: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_cols: list[str],
    out_cols: list[str],
    descending: bool,
) -> DataFrame:
    """Best k rows per group under the strict total order.  The window
    partitions on a single composed struct column so null group values
    form their own partition exactly like SQL GROUP BY."""
    ranked = cands.withColumn(
        "_g", F.struct(*[F.col(c) for c in group_cols])
    ).withColumn(
        "_rn", F.row_number().over(_rank(order_col, descending, id_cols))
    )
    return ranked.filter(F.col("_rn") <= k).select(*out_cols)


def refresh_topk_mv(
    src: ManagedTable,
    dst: ManagedTable,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_cols: list[str],
    payload_cols: list[str] | None = None,
    descending: bool = True,
    window_cache: ChangeWindowCache | None = None,
) -> int:
    """Fold the source changes since the last refresh into the top-k
    table; returns the new MV version (current version when there was
    nothing to consume).  See the module docstring for the fold /
    rescan split and the crash contract.  ``window_cache`` (optional)
    shares the consumed window's pinned change frame with the batch's
    other maintenance families (rollup.ChangeWindowCache)."""
    out = None
    while True:
        out, done = _refresh_topk_window(
            src, dst, group_cols, order_col, int(k), id_cols,
            payload_cols, descending, window_cache,
        )
        if done:
            return out


def _refresh_topk_window(
    src: ManagedTable,
    dst: ManagedTable,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_cols: list[str],
    payload_cols: list[str] | None,
    descending: bool,
    window_cache: ChangeWindowCache | None = None,
) -> tuple[int, bool]:
    payload_cols = [
        c
        for c in (payload_cols or [])
        if c not in set(group_cols) | set(id_cols) | {order_col}
    ]
    out_cols = list(group_cols) + list(id_cols) + [order_col] + payload_cols
    key_cols = list(group_cols) + list(id_cols)
    _check_contract(dst, group_cols, order_col, k, id_cols, descending)

    last = int(dst.meta.properties.get(_STATE_KEY, 1))
    actual = src._current_version()
    cur = actual
    if cur <= last:
        return dst._current_version(), True

    # window recovery — same reasoning as the rollup: a crashed
    # attempt's tag pins its high bound; replay THAT window before
    # folding anything newer (bounded probe: stops at the previous
    # fold's tag)
    recovered = dst.find_commit_tag(f"topk-{last}-", stop_prefix="topk-")
    if recovered:
        cur = int(recovered.rsplit("-", 1)[1])
    window_tag = f"topk-{last}-{cur}"

    segments = (
        window_cache.segments(src, last, cur)
        if window_cache is not None
        else change_segments(src, last, cur)
    )
    if not segments:  # maintenance-only window
        dst.set_properties(**{_STATE_KEY: cur})
        return dst._current_version(), cur >= actual

    if window_cache is not None:
        # shared-and-pinned by the cache — never re-pin
        delta, any_cdf = window_cache.weighted_changes(src, last, cur)
    else:
        delta, any_cdf = window_weighted_changes(src, segments)
        # the window frame feeds BOTH the touched-group aggregate and
        # the fold branch's insert selection — pin it once
        # (window-bounded by contract) so the CDF tree computes ONCE
        # instead of per consumer; on a rescan-only window (fold never
        # runs) the pin's only overhead vs the single consumption is
        # the store+read-back of a window-bounded frame, far below one
        # CDF recompute — interleaved warm A/B at sf0.1: ~6% off the
        # driver entry (medians 12.7 s pinned vs 13.5 s unpinned)
        delta = delta.localCheckpoint(eager=True)
    # group-cardinality-bounded; consumed by up to three joins below
    touched = (
        delta.groupBy(*group_cols)
        .agg(
            F.max(F.when(F.col("_w") == -1, 1).otherwise(0)).alias("_retract")
        )
        .localCheckpoint(eager=True)
    )
    rescan_keys = touched.filter(F.col("_retract") == 1).select(*group_cols)
    fold_keys = touched.filter(F.col("_retract") == 0).select(*group_cols)
    # ONE driver action answers both branch-emptiness questions off the
    # already-pinned (tiny) touched frame — previously two isEmpty()
    # probes, each its own job
    counts = touched.agg(
        F.coalesce(F.sum("_retract"), F.lit(0)).alias("nr"),
        F.count(F.lit(1)).alias("nt"),
    ).first()
    n_rescan = int(counts.nr)
    n_fold = int(counts.nt) - n_rescan

    if counts.nt == 0:
        # the window's changes net to zero rows: nothing to fold or
        # rescan — advance the cursor without touching the MV
        dst.set_properties(**{_STATE_KEY: cur})
        return dst._current_version(), cur >= actual

    mv_affected = join_nullsafe(
        dst.read(), touched.select(*group_cols), list(group_cols), "left_semi"
    ).localCheckpoint(eager=True)

    winners = None
    fold_ran = False
    if not any_cdf or n_fold > 0:
        fold_ran = True
        # fold: inserted rows compete with the groups' current top-k.
        # A replay after a crashed merge sees the winners already in
        # the MV — the dedup keeps the candidate set identical, so the
        # re-rank picks the same k.
        inserts = join_nullsafe(
            delta.filter(F.col("_w") == 1).select(*out_cols),
            fold_keys,
            list(group_cols),
            "left_semi",
        )
        fold_cands = (
            join_nullsafe(mv_affected, fold_keys, list(group_cols), "left_semi")
            .select(*out_cols)
            .unionByName(inserts)
            .dropDuplicates(key_cols)
        )
        winners = _topk_of(
            fold_cands, group_cols, order_col, k, id_cols, out_cols,
            descending,
        )
    if any_cdf and n_rescan > 0:
        # rescan: retraction-touched groups re-rank from the source
        # pinned at the window's high version — race-free vs
        # concurrent appends, bounded by the affected groups
        cap = int(dst.meta.properties.get("topk.max-rescan-groups", "4096"))
        base = _rescan_base(
            src, cur, list(group_cols), rescan_keys, cap
        ).select(*out_cols)
        rescanned = _topk_of(
            base, group_cols, order_col, k, id_cols, out_cols, descending
        )
        winners = (
            rescanned if winners is None else winners.unionByName(rescanned)
        )

    version = dst._current_version()
    if winners is not None:
        # read twice (merge + the stale sweep's anti side) — pin once
        winners = winners.localCheckpoint(eager=True)
        # at most one window per low cursor ever commits, so the
        # recovery probe doubles as the replay check.  Emptiness (a
        # rescan-only window whose vanished groups left zero winners)
        # is decided by the merge's own tombstone-free write (r13):
        # an empty winners frame no-ops WITHOUT committing the tag —
        # exactly what the old pre-probe enforced, minus its job.
        if recovered is None:
            version = dst.merge(winners, tag=window_tag)
        # stale sweep (idempotent): affected-group MV rows that are
        # not among the window's winners — pushed out of the top-k by
        # a fold, or vanished/demoted under a rescan.  mv_affected was
        # pinned BEFORE the merge, so a row the merge just upserted is
        # judged by its key, not its pre-merge payload.
        stale = join_nullsafe(
            mv_affected.select(*key_cols),
            winners.select(*key_cols),
            key_cols,
            "left_anti",
        )
        # delete_keys probes emptiness via its own tombstone write
        # (r13) — the old isEmpty pre-probe was an extra job
        version = dst.delete_keys(stale)
    dst.set_properties(**{_STATE_KEY: cur})
    return version, cur >= actual


def rebuild_topk_mv(
    src: ManagedTable,
    dst: ManagedTable,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_cols: list[str],
    payload_cols: list[str] | None = None,
    descending: bool = True,
) -> int:
    """Full re-rank of the source's CURRENT state overwriting the MV,
    cursor re-anchored — the ``ExpiredCursorError`` remedy and the
    general reset.  Same crash contract as ``rebuild_rollup``: retry
    the rebuild after a crash, don't refresh over a half-rebuilt
    state.

    Unlike ``refresh_topk_mv``, a rebuild does NOT require the stored
    contract to match (or exist): the overwrite replaces the MV's
    entire content, so rebuilding IS the documented way to change the
    ranking contract — and the remedy for an MV whose contract
    properties were lost.  What cannot change is the table's
    STRUCTURE: the MV key must equal (group, id) and every declared
    column must exist in its schema — those are validated here, and
    the contract properties are re-stamped to the declared values so
    subsequent refreshes verify against what the rebuild actually
    ranked."""
    if int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if list(dst.meta.key_cols) != list(group_cols) + list(id_cols):
        raise ValueError(
            f"top-k rebuild declares key (group={list(group_cols)}, "
            f"id={list(id_cols)}) but the MV at {dst.path} is keyed by "
            f"{list(dst.meta.key_cols)} — the key is table structure; "
            "recreate the MV (create_topk_mv) to change it"
        )
    payload_cols = [
        c
        for c in (payload_cols or [])
        if c not in set(group_cols) | set(id_cols) | {order_col}
    ]
    out_cols = list(group_cols) + list(id_cols) + [order_col] + payload_cols
    have = set(dst.meta.schema.fieldNames())
    lacking = [c for c in out_cols if c not in have]
    if lacking:
        raise ValueError(
            f"top-k rebuild declares columns {lacking} the MV schema "
            f"lacks at {dst.path} — recreate the MV (create_topk_mv) "
            "to change its shape"
        )
    cur = src._current_version()
    winners = _topk_of(
        src.read_version(cur).select(*out_cols),
        list(group_cols), order_col, int(k), list(id_cols), out_cols,
        descending,
    )
    dst.overwrite(winners)
    dst.set_properties(
        **{
            _STATE_KEY: cur,
            "topk.k": str(int(k)),
            "topk.order-column": order_col,
            "topk.descending": str(bool(descending)).lower(),
            "topk.group-columns": json.dumps(list(group_cols)),
            "topk.id-columns": json.dumps(list(id_cols)),
        }
    )
    return dst._current_version()


def reaggregate_topk(
    dst: ManagedTable,
    subset_cols: list[str],
    order_col: str,
    k: int | None = None,
    descending: bool = True,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k at a COARSER granularity answered from the MV — the
    routing move: any row in a coarse group's top-k is necessarily in
    its fine group's top-k (the coarse group is a union of fine
    groups, and a row beaten by k rows within its own fine group is
    beaten by k rows in any union containing it), so re-ranking the
    MV's k·groups rows under the subset key is EXACT for any k' <= k.
    Never touches the base table."""
    subset = list(subset_cols)
    mv_groups = json.loads(
        dst.meta.properties.get("topk.group-columns", "null")
    ) or [c for c in dst.meta.key_cols]
    mv_ids = json.loads(
        dst.meta.properties.get("topk.id-columns", "null")
    ) or []
    ids = list(id_cols or mv_ids
               or [c for c in dst.meta.key_cols if c not in mv_groups])
    # the subset-exactness argument only holds over GROUP columns (a
    # coarse group must be a UNION of fine groups); an id column in
    # the subset would yield a meaningless per-row "top-k"
    missing = set(subset) - set(mv_groups)
    if missing:
        raise ValueError(
            f"subset columns {sorted(missing)} are not MV group "
            f"columns {mv_groups}"
        )
    mv_k = int(dst.meta.properties.get("topk.k", "0"))
    k = mv_k if k is None else int(k)
    if mv_k and k > mv_k:
        raise ValueError(
            f"cannot answer top-{k} from a top-{mv_k} materialization "
            "(rows beyond the maintained k were never retained)"
        )
    # strict total order at the coarse granularity: ids are unique per
    # FINE group, so the collapsed-away fine-group columns join the
    # tie-break (the MV key is unique over ids + all group columns)
    tie = ids + [
        c for c in mv_groups if c not in subset and c not in ids
    ]
    ranked = dst.read().withColumn(
        "_g", F.struct(*[F.col(c) for c in subset])
    )
    out = ranked.withColumn(
        "rnk", F.row_number().over(_rank(order_col, descending, tie))
    ).drop("_g")
    return out.filter(F.col("rnk") <= k)


def read_topk(
    dst: ManagedTable,
    group_cols: list[str],
    order_col: str,
    descending: bool = True,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """The materialized top-k with its rank column — the query surface
    (``WHERE rnk <= j`` for any j <= k comes free).  Reads only the
    MV (k·groups rows), never the base table."""
    ranked = dst.read().withColumn(
        "_g", F.struct(*[F.col(c) for c in group_cols])
    )
    ids = list(
        id_cols
        or json.loads(dst.meta.properties.get("topk.id-columns", "null"))
        or [c for c in dst.meta.key_cols if c not in group_cols]
    )
    return ranked.withColumn(
        "rnk", F.row_number().over(_rank(order_col, descending, ids))
    ).drop("_g")

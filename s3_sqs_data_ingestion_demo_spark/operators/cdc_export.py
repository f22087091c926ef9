"""Outbound change-data-capture export — the connector surface.

``read_changes_cdf`` answers "what changed" as a DataFrame; this
module PERSISTS those windows to a plain parquet directory a
downstream system (warehouse sync, search indexer, another cluster)
can tail without linking against this library — the outbound half of
the CDC story, mirroring Delta's table_changes / Iceberg's changelog
scan consumed as files.

Layout: ``export_dir/w_<lo>_<hi>/`` — one immutable directory per
consumed source window, atomically published by directory rename, rows
carrying ``_change_type`` (insert / update_preimage /
update_postimage / delete) plus per-SEGMENT ``_export_lo``/
``_export_hi`` stamps (a window splits at maintenance commits;
segment bounds order all changes totally, within and across
windows).  The consume cursor IS
the directory listing (max published ``hi``): no side state, so the
exporter is replay-safe by construction — a crashed attempt leaves
only an unpublished temp directory (cleaned on the next run) and the
retry recomputes the same window; a replay whose window directory
already exists skips it.  Single concurrent exporter per directory
(the same contract as any file-based sink); concurrent SOURCE writers
are fine — the window pins versions.

Windows are CONTIGUOUS by construction (each window's ``lo`` is the
previous window's ``hi``), and every listing verifies that chain — a
window directory lost to a partial sync or manual cleanup raises
instead of letting a reader silently reconstruct state missing that
window's changes.

Tailing and retention: ``read_change_export(..., since=v)`` subsets
the window DIRECTORIES by their encoded bounds before Spark ever
lists a file — an incremental consumer pays O(tail), never
O(all history) — and ``prune_export(export_dir, up_to)`` deletes
windows a downstream cursor has passed (Delta's
``table_changes(startingVersion=…)`` contract: incremental by
design, with retention on the producer side).  Prune records its
floor in the pruner-owned ``_pruned_to.json`` BEFORE deleting
(crash-safe: leftover below-floor directories are invisible to
readers and swept by the next prune; a legacy ``pruned_to`` inside
the anchor is still honored for directories pruned before the
ownership split).  After a prune, a full read reconstructs state
only from the retained suffix — prune strictly below every
consumer's cursor.

Pure-append windows export straight off the cheap change feed (no CDF
classification); windows with merge deltas / tombstones / rewrites
export the net-effect CDF.  Maintenance-only windows publish an
empty marker directory so the listing-cursor still advances
(compaction is content-neutral, exactly why ``change_segments``
splits there).

Schema evolution: each window's parquet carries the source schema AT
EXPORT TIME, and the anchor schema is refreshed whenever the source
evolves — ``read_change_export`` reconciles per-window schemas
through ``merge_types`` (added columns null-fill for old windows,
widened types promote), then serves the result UNDER THE EXPORT'S
CURRENT SCHEMA: a column dropped since stops being served even from
old windows — the table layer's own rule ("history is served under
the CURRENT schema", table.drop_column), so replaying a post-drop
export matches the live table's shape exactly.  An irreconcilable
mix is refused loudly before any projection could mask it.
``coalesce_export`` rewrites losslessly (the reconciled union, no
projection) — reads keep projecting.
"""

from __future__ import annotations

import json
import logging
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

from ..table import ManagedTable, align_to_schema, merge_types
from .rollup import (
    ExpiredCursorError,
    change_segments,
    segment_is_pure_append,
)

_ANCHOR = "_anchor.json"
_FLOOR = "_pruned_to.json"
_PREFIX = "w_"
# role-scoped temp prefixes: the exporter and the coalescer may
# legitimately overlap, and each sweeps ONLY its own role's crashed
# leftovers — a shared sweep would rmtree the other role's in-flight
# write and could publish a partially-deleted directory
_TMP = "_tmp_"  # exporter temp (also matches legacy crashed dirs)
_TMP_C = "_tmp_c_"  # coalescer temp
_TMP_F = "_tmp_f_"  # forget-scrubber temp (scrub_export_windows)
_TRASH_F = "_trash_f_"  # forget-scrubber displaced original
_FORGET_JOURNAL = "_forget_inflight.json"  # scrubber swap journal


def _sweep_tmp(export_dir: str, role_export: bool) -> None:
    for name in os.listdir(export_dir):
        mine = (
            name.startswith(_TMP)
            and not name.startswith(_TMP_C)
            and not name.startswith(_TMP_F)
            if role_export
            else name.startswith(_TMP_C)
        )
        if mine:
            shutil.rmtree(os.path.join(export_dir, name), ignore_errors=True)


def _recover_forget(export_dir: str) -> bool:
    """Complete or roll back a window swap ``scrub_export_windows``
    left mid-flight (see its crash contract).  Returns True when
    anything was repaired.  SCRUBBER-ROLE ONLY: the journal is owned
    by the single-maintainer scrub role, and only the next scrub (or
    ``forget_keys`` re-run) may recover it — a READER that "healed" a
    journal could be racing a LIVE scrubber mid-swap and would delete
    its in-flight temp or steal its rename (readers instead retry the
    listing and then raise with the re-run remedy; ``_listed``).  The
    journal fully determines the direction: if the window directory
    exists it is either the untouched original (roll back: drop the
    tmp) or the already-swapped rewrite (finish: drop the trash); if
    it is missing, the crash hit between the two renames and either
    the rewrite (tmp) rolls forward or the displaced original (trash)
    rolls back — a re-run redoes a rolled-back window idempotently."""
    jp = os.path.join(export_dir, _FORGET_JOURNAL)
    try:
        with open(jp) as fh:
            doc = json.load(fh)
    except FileNotFoundError:
        return False
    target = os.path.join(export_dir, doc["name"])
    tmp = os.path.join(export_dir, doc["tmp"])
    trash = os.path.join(export_dir, doc["trash"])
    if os.path.exists(target):
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
    elif os.path.exists(tmp):
        os.rename(tmp, target)  # roll the rewrite forward
        shutil.rmtree(trash, ignore_errors=True)
    elif os.path.exists(trash):
        os.rename(trash, target)  # roll the original back
    try:
        os.remove(jp)
    except FileNotFoundError:
        # belt-and-braces for a manually-cleaned journal; recovery is
        # single-maintainer by contract (concurrent scrubs are NOT
        # supported — the exists-then-rename pairs above would race)
        pass
    return True


def _parse_window(name: str) -> tuple[int, int] | None:
    """(lo, hi) from a window directory name, None for anything that
    merely looks window-like (manual copies, sync artifacts) — the ONE
    parser every listing and sweep shares, so a stray ``w_backup_old``
    is skipped everywhere instead of crashing one code path."""
    if not name.startswith(_PREFIX):
        return None
    try:
        lo, hi = name[len(_PREFIX):].split("_")
        return (int(lo), int(hi))
    except ValueError:
        return None


def create_change_export(
    src: ManagedTable, export_dir: str, consume_from: int | None = None
) -> None:
    """Provision the export directory and anchor its cursor: default =
    the source's CURRENT version (export new changes only); pass ``1``
    to have the first export carry the source's existing content as
    inserts (bootstrap).

    The anchor also records the source's merge policy and table type:
    a downstream replica may live on another cluster where the source
    table path is unreachable, so the export directory itself must
    carry what ``sync_from_export`` needs to enforce the
    ``apply_changes`` exactness contract (a ``latest_wins`` replica
    pairs only with a ``latest_wins`` MOR source)."""
    os.makedirs(export_dir, exist_ok=True)
    if os.path.exists(os.path.join(export_dir, _ANCHOR)):
        raise ValueError(f"change export already provisioned at {export_dir}")
    lo = src._current_version() if consume_from is None else int(consume_from)
    _write_anchor(
        export_dir,
        {
            "from_version": lo,
            "source": src.path,
            # both fixed at table create — safe to pin at provision
            "source_merge_policy": src.meta.merge_policy,
            "source_table_type": src.meta.table_type.upper(),
            # lets a reader construct an EMPTY changes frame when
            # only maintenance markers have been published yet;
            # refreshed by export_changes when the source evolves
            "schema": src.meta.schema.jsonValue(),
        },
    )


def _read_anchor(export_dir: str) -> dict:
    with open(os.path.join(export_dir, _ANCHOR)) as fh:
        return json.load(fh)


def _write_anchor(export_dir: str, doc: dict) -> None:
    # atomic replace: a reader never sees a half-written anchor
    tmp = os.path.join(export_dir, f"{_ANCHOR}.tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(export_dir, _ANCHOR))


def _floor(export_dir: str, anchor: dict) -> int:
    """Versions at or below the floor are not retained: the anchor's
    provision point, raised by every prune.  The prune floor lives in
    its OWN file (``_pruned_to.json``, pruner-owned) so a concurrent
    ``export_changes`` anchor-schema refresh can never clobber it —
    the two writers touch disjoint files instead of read-modify-
    writing one.  (Legacy ``pruned_to`` inside the anchor is still
    honored for directories pruned before the split.)"""
    floor = max(int(anchor["from_version"]), int(anchor.get("pruned_to", 0)))
    try:
        with open(os.path.join(export_dir, _FLOOR)) as fh:
            floor = max(floor, int(json.load(fh)["pruned_to"]))
    except FileNotFoundError:
        pass
    return floor


def _published_windows(export_dir: str, floor: int) -> list[tuple[int, int]]:
    """Retained windows sorted ascending, contiguity-verified: the
    chain must start at the floor and each window's ``lo`` must equal
    the previous ``hi`` — a gap means a window directory was lost
    (partial sync, manual cleanup) and reading past it would silently
    drop that window's changes.  Below-floor directories (a crashed
    prune's leftovers) are invisible, and a window fully COVERED by a
    wider one is skipped (a crashed ``coalesce_export`` leaves its
    merged window published alongside not-yet-deleted originals — the
    merged window carries the same rows, so readers prefer it and the
    next coalesce/prune sweeps the leftovers)."""
    raw = [
        w
        for name in os.listdir(export_dir)
        if (w := _parse_window(name)) is not None and w[1] > floor
    ]
    # covered-window resolution in ONE linear pass over the (lo asc,
    # hi desc) order: every earlier window has lo <= this lo, so this
    # window is covered iff its hi is at or below the running max hi —
    # O(n log n), run on every listing, so no quadratic pass here
    out = []
    max_hi = floor
    for w in sorted(raw, key=lambda w: (w[0], -w[1])):
        if w[1] <= max_hi:
            continue  # covered by a wider (or equal-lo longer) window
        out.append(w)
        max_hi = w[1]
    prev = floor
    for lo, hi in out:
        if lo != prev:
            raise ValueError(
                f"change-export window chain broken at {export_dir}: "
                f"expected a window starting at version {prev}, found "
                f"w_{lo}_{hi} — a window directory was lost or pruned "
                "out of order; rebuild the export (re-provision with "
                "consume_from=1) rather than serving a gapped history"
            )
        prev = hi
    return out


def _listed(export_dir: str) -> tuple[dict, int, list[tuple[int, int]]]:
    """One consistent ``(anchor, floor, windows)`` listing for the
    reader paths.  The floor read and the ``os.listdir`` are not
    atomic, so a concurrent ``prune_export`` that records a new floor
    and deletes windows BETWEEN them makes the chain look broken at
    the stale floor — re-read the floor and re-list ONCE when it
    moved; a genuinely lost window leaves the floor unchanged and the
    retry re-raises the same error."""
    anchor = _read_anchor(export_dir)
    floor = _floor(export_dir, anchor)
    try:
        return anchor, floor, _published_windows(export_dir, floor)
    except ValueError:
        # transient causes that look like a broken chain: a concurrent
        # prune that moved the floor between our floor read and the
        # listing, and a LIVE forget-scrub inside its two-rename swap
        # gap (journal present — possibly removed again by the time we
        # look, if the swap just completed).  Re-read/retry — but
        # NEVER recover the journal from a reader: a live scrubber
        # mid-swap is indistinguishable from a crashed one, and a
        # reader-side repair would delete its in-flight temp or steal
        # its rename (the scrub role alone recovers, at its own
        # entry).  Every retry re-reads the floor first, so a prune
        # race and a scrub race resolve through the same loop.
        import time  # noqa: PLC0415

        jp = os.path.join(export_dir, _FORGET_JOURNAL)
        # one clean re-list is owed whenever the journal may have just
        # vanished under us: initially (the original listing could have
        # raced a swap that then completed), and again after EVERY
        # journal sighting (a multi-window scrub removes and re-writes
        # the journal between windows — any failed listing may be
        # followed by the journal disappearing before our check)
        grace = 1
        for _ in range(10):
            anchor = _read_anchor(export_dir)
            floor = _floor(export_dir, anchor)
            try:
                return anchor, floor, _published_windows(export_dir, floor)
            except ValueError:
                if not os.path.exists(jp):
                    if grace:
                        grace -= 1
                        continue
                    raise
                grace = 1
                # a healthy swap's gap is two back-to-back renames —
                # wait it out briefly; a crashed scrub stays broken
                time.sleep(0.05)
        raise ValueError(
            f"change-export window chain at {export_dir} is broken "
            "while a takedown scrub journal (_forget_inflight.json) "
            "is present — a scrub is mid-swap or crashed there; if no "
            "scrub is running, re-run scrub_export_windows (or the "
            "forget_keys that launched it) to recover the swap"
        )


def _cursor(export_dir: str) -> int:
    _, floor, ws = _listed(export_dir)
    return ws[-1][1] if ws else floor


def export_exists(export_dir: str) -> bool:
    """Is ``export_dir`` a provisioned change export (anchor present)?
    The declarative job path uses this to provision lazily on the
    first batch, mirroring how declared MVs create themselves."""
    return os.path.exists(os.path.join(export_dir, _ANCHOR))


def list_export_windows(export_dir: str) -> list[tuple[int, int]]:
    """The retained published windows, ascending — the public listing
    (contiguity-verified, covered windows resolved, prune races
    retried) for cadence decisions and monitoring."""
    return _listed(export_dir)[2]


def validate_export_cadences(
    keep_last_windows: int, coalesce_after: int
) -> None:
    """Refuse the retention + binpack combination: both cadences
    trigger on the DIRECTORY COUNT, so setting both always degenerates.
    With ``keep_last_windows > coalesce_after``, coalesce caps the
    listing at ``coalesce_after + 1`` directories before retention's
    threshold is ever crossed — the prune never fires, the export
    retains full history forever, and every coalesce rewrites an
    ever-growing O(history) window.  With ``keep_last_windows <=
    coalesce_after``, the prune (which runs first) caps the listing at
    ``keep_last_windows`` directories, so the coalesce never fires —
    silently dead config.  The knobs serve different consumers: set
    ``keep_last_windows`` for tailing consumers (retention already
    bounds the directory count), or ``coalesce_after`` for
    full-history exports (bootstrap cost), never both."""
    if keep_last_windows > 0 and coalesce_after > 0:
        raise ValueError(
            "keep_last_windows and coalesce_after cannot both be set: "
            "both cadences trigger on the window-directory count, so "
            "one of them silently never fires (and with "
            "keep_last_windows > coalesce_after, retention is disabled "
            "while each coalesce rewrites ever-growing history) — "
            "retention already bounds the directory count, so pick one"
        )


def maintain_export_cadences(
    spark,
    export_dir: str,
    keep_last_windows: int = 0,
    coalesce_after: int = 0,
) -> None:
    """The listing-derived retention/binpack cadences shared by the
    declarative batch hook (job._maintain_cdc_exports) and the
    streaming twin (streaming.start_streaming_cdc_export) — ONE place
    for the boundary arithmetic and the prune-before-coalesce order
    (a binpack must never rewrite windows retention is about to
    delete).

    ``keep_last_windows`` > 0: prune all but the most recent N windows
    (windows are contiguous, so the lo of the oldest KEPT window is
    the boundary everything older sits at or below).
    ``coalesce_after`` > 0: once MORE than N windows are retained,
    binpack everything below the newest window — the tail the next
    export appends to stays untouched.  Mutually exclusive
    (``validate_export_cadences``).

    Producer-side retention respects registered consumers: the prune
    boundary is additionally capped at the minimum registered consumer
    cursor (``_consumer_floor``), so a lagging replica that records
    its progress via ``sync_from_export(..., consumer_id=...)`` never
    finds windows it still needs deleted out from under it."""
    validate_export_cadences(keep_last_windows, coalesce_after)
    if keep_last_windows:
        windows = list_export_windows(export_dir)
        if len(windows) > keep_last_windows:
            up_to = windows[-keep_last_windows][0]
            floor = _consumer_floor(export_dir)
            if floor is not None:
                up_to = min(up_to, floor)
            prune_export(export_dir, up_to)
    if coalesce_after:
        windows = list_export_windows(export_dir)
        if len(windows) > coalesce_after:
            coalesce_export(spark, export_dir, up_to=windows[-2][1])


_CONSUMERS = "_consumers"


def record_consumer_cursor(
    export_dir: str, consumer_id: str, cursor: int
) -> None:
    """Register/advance a named consumer's durably-applied cursor in
    the export directory's ``_consumers/`` registry (one JSON file per
    consumer, atomic replace) — the fan-out contract: producer-side
    retention (``maintain_export_cadences``) prunes at
    min(count-based boundary, min registered cursor), so N replicas
    can tail one export and the slowest never hits
    ``ExpiredCursorError``.  Consumers that never register are
    invisible to retention (the documented keep-up-or-expire trade of
    bare ``keep_last_windows``)."""
    if not consumer_id or "/" in consumer_id or consumer_id.startswith("."):
        raise ValueError(
            f"consumer_id must be a plain name, got {consumer_id!r}"
        )
    reg = os.path.join(export_dir, _CONSUMERS)
    os.makedirs(reg, exist_ok=True)
    tmp = os.path.join(reg, f"{consumer_id}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"cursor": int(cursor)}, fh)
    os.replace(tmp, os.path.join(reg, f"{consumer_id}.json"))


def _consumer_floor(export_dir: str) -> int | None:
    """min registered consumer cursor, or None when no consumer has
    registered (retention then falls back to pure count-based pruning).
    A half-written registry entry is impossible (atomic replace); a
    stale one is the operator's to delete — a decommissioned consumer
    that never unregisters pins retention forever, by design (losing a
    live replica's windows is the worse failure)."""
    reg = os.path.join(export_dir, _CONSUMERS)
    try:
        names = [n for n in os.listdir(reg) if n.endswith(".json")]
    except FileNotFoundError:
        return None
    floor = None
    for n in names:
        with open(os.path.join(reg, n)) as fh:
            c = int(json.load(fh)["cursor"])
        floor = c if floor is None else min(floor, c)
    return floor


def drop_consumer(export_dir: str, consumer_id: str) -> None:
    """Unregister a decommissioned consumer so its frozen cursor stops
    pinning producer-side retention."""
    try:
        os.remove(
            os.path.join(export_dir, _CONSUMERS, f"{consumer_id}.json")
        )
    except FileNotFoundError:
        pass


def export_changes(src: ManagedTable, export_dir: str) -> tuple[int, int] | None:
    """Export the source changes since the last published window;
    returns the published (lo, hi) or None when there was nothing to
    consume.  See the module docstring for the layout and the crash
    contract."""
    _sweep_tmp(export_dir, role_export=True)  # own crashed leftovers only
    lo = _cursor(export_dir)
    hi = src._current_version()
    if hi <= lo:
        return None
    anchor = _read_anchor(export_dir)
    if anchor["schema"] != src.meta.schema.jsonValue():
        # the source evolved: refresh the anchor so the marker-only
        # read path (and any shape-probing consumer) serves the
        # CURRENT exported shape, not the provision-time one
        anchor["schema"] = src.meta.schema.jsonValue()
        _write_anchor(export_dir, anchor)
    target = os.path.join(export_dir, f"{_PREFIX}{lo}_{hi}")
    if os.path.exists(target):  # replayed window: already published
        return (lo, hi)
    segments = change_segments(src, lo, hi)
    if not segments:
        # maintenance-only window: publish an empty marker so the
        # cursor (the listing) still advances past it
        os.makedirs(target)
        return (lo, hi)
    # the rollup's window_weighted_changes collapses _change_type into
    # a signed weight for fold consumers; the export keeps the full
    # CDF shape, so derive per segment (shared classification helper —
    # the exporter and the fold consumers must agree on what is
    # pure-append).  Rows are stamped with their SEGMENT's bounds, not
    # the window's: net-effect is per segment, so a key changed in two
    # segments of one window (a maintenance commit between two data
    # commits) emits two state-setting rows — the per-segment
    # ``_export_hi`` keeps them strictly ordered for ``replay_to_state``
    # (window directories and segment stamps order consistently:
    # every segment hi lies inside its window's (lo, hi]).
    frames = []
    for seg_lo, seg_hi in segments:
        if segment_is_pure_append(src, seg_lo, seg_hi):
            f = src.read_changes(seg_lo, seg_hi).withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            f = src.read_changes_cdf(seg_lo, seg_hi)
        frames.append(
            f.withColumn("_export_lo", F.lit(seg_lo)).withColumn(
                "_export_hi", F.lit(seg_hi)
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    tmp = os.path.join(export_dir, f"{_TMP}{lo}_{hi}_{os.getpid()}")
    out.write.mode("overwrite").parquet(tmp)
    os.replace(tmp, target)
    return (lo, hi)


def prune_export(export_dir: str, up_to: int) -> int | None:
    """Retention: delete published windows whose ``hi`` is at or below
    ``up_to`` — safe once every downstream consumer's cursor has
    passed them (a later full read reconstructs state only from the
    retained suffix).  Returns the new floor (a window boundary), or
    None when nothing qualified.  Crash-safe: the floor is recorded
    (in its own pruner-owned ``_pruned_to.json`` — never the anchor,
    so a concurrent exporter's schema refresh cannot clobber it)
    BEFORE any directory is deleted; a crash mid-prune leaves
    below-floor leftovers that readers ignore and the next prune
    sweeps.  Single concurrent pruner per directory (the same
    contract as the exporter; exporter and pruner may overlap
    freely — they write disjoint files)."""
    floor = _floor(export_dir, _read_anchor(export_dir))
    # sweep a crashed prune's leftovers first (below the recorded
    # floor, so invisible to every reader)
    for name in os.listdir(export_dir):
        w = _parse_window(name)
        if w is not None and w[1] <= floor:
            shutil.rmtree(
                os.path.join(export_dir, name), ignore_errors=True
            )
    windows = _published_windows(export_dir, floor)
    deletable = [w for w in windows if w[1] <= int(up_to)]
    if not deletable:
        return None
    new_floor = deletable[-1][1]  # windows are contiguous: a boundary
    tmp = os.path.join(export_dir, f"{_FLOOR}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"pruned_to": new_floor}, fh)
    os.replace(tmp, os.path.join(export_dir, _FLOOR))
    for lo, hi in deletable:
        shutil.rmtree(
            os.path.join(export_dir, f"{_PREFIX}{lo}_{hi}"),
            ignore_errors=True,
        )
    return new_floor


def read_change_export(
    spark, export_dir: str, since: int | None = None
) -> DataFrame:
    """Published windows as one frame (rows carry ``_change_type`` and
    ``_export_lo``/``_export_hi``) — what a downstream consumer reads.
    ``since`` is the consumer's cursor (a previously returned window
    ``hi``): only windows ABOVE it are listed and opened — the
    directory names encode the bounds, so the tail costs O(new
    windows), not O(all history).  A ``since`` below the retention
    floor raises ``ExpiredCursorError`` (the asked-for changes were
    pruned; silently serving a gapped tail would corrupt the
    consumer's state).  Windows written before a schema evolution are
    reconciled onto the evolved shape (``merge_types``: added columns
    null-fill, widened types promote)."""
    anchor, floor, windows = _listed(export_dir)
    return _frame_for(spark, export_dir, anchor, floor, windows, since)


def _frame_for(
    spark,
    export_dir: str,
    anchor: dict,
    floor: int,
    windows: list[tuple[int, int]],
    since: int | None,
) -> DataFrame:
    """Build the consumer frame from an ALREADY-TAKEN listing — shared
    by ``read_change_export`` and ``tail_change_export`` so the tail
    path lists the directory exactly once per cycle."""
    if since is not None:
        since = int(since)
        if since < floor:
            raise ExpiredCursorError(
                f"change-export cursor {since} predates the retention "
                f"floor {floor} at {export_dir} — the windows were "
                "pruned; re-bootstrap the consumer from a full read "
                "or a fresh export"
            )
        windows = [w for w in windows if w[1] > since]
    if not windows and since is None:
        raise ValueError(f"no published change windows under {export_dir}")
    dirs = [
        os.path.join(export_dir, f"{_PREFIX}{lo}_{hi}")
        for lo, hi in windows
    ]
    dirs = [d for d in dirs if any(f.endswith(".parquet") for f in os.listdir(d))]
    if not dirs:
        # published-but-empty tail: markers only (or an empty since-
        # tail) — an empty frame with the exported shape, not an
        # error: a tail loop must survive a maintenance-only cycle
        from pyspark.sql import types as T  # noqa: PLC0415

        base = T.StructType.fromJson(anchor["schema"])
        fields = list(base.fields) + [
            T.StructField("_change_type", T.StringType(), True),
            T.StructField("_export_lo", T.IntegerType(), False),
            T.StructField("_export_hi", T.IntegerType(), False),
        ]
        return spark.createDataFrame([], T.StructType(fields))
    from pyspark.sql import types as T  # noqa: PLC0415

    return _read_reconciled(
        spark, dirs, current_schema=T.StructType.fromJson(anchor["schema"])
    )


_META_COLS = ("_change_type", "_export_lo", "_export_hi")


def _read_reconciled(
    spark, dirs: list[str], current_schema=None
) -> DataFrame:
    """Window directories as one frame, schemas reconciled across
    evolution boundaries (shared by the consumer read and
    ``coalesce_export``'s rewrite).

    ``current_schema`` (the anchor's source schema — passed by the
    CONSUMER read paths, not by coalesce) additionally projects the
    reconciled union onto the export's current shape: columns present
    only in old windows (dropped since) stop being served, columns
    added since null-fill old windows — the table layer's own
    evolution rule ("history is served under the CURRENT schema",
    table.drop_column), so ``replay_to_state`` over a post-drop read
    matches the live table's shape exactly.  The cross-window
    ``merge_types`` reconciliation still runs FIRST, so an
    irreconcilable mix raises loudly before any projection could mask
    it.  ``coalesce_export`` deliberately omits the projection: a
    binpack rewrite stays lossless (the union shape), and reads keep
    projecting."""
    frames = [spark.read.parquet(d) for d in dirs]
    schemas = [f.schema for f in frames]
    single = all(s == schemas[0] for s in schemas[1:])
    if single and current_schema is None:
        # single-shape fast path: one multi-path relation, one footer
        # schema — the common case between evolutions
        return spark.read.parquet(*dirs)
    if single:
        target = schemas[0]
    else:
        # mixed shapes across an evolution boundary: reconcile through
        # the same lossless rules the table itself evolves under;
        # anything irreconcilable raises (merge_types) instead of
        # silently taking one file's schema and dropping the evolved
        # columns
        target = schemas[0]
        for s in schemas[1:]:
            target = merge_types(target, s)
    if current_schema is not None:
        from pyspark.sql import types as T  # noqa: PLC0415

        merged = {f.name: f for f in target.fields}
        fields = []
        for f in current_schema.fields:
            if f.name in merged:
                # monotone widenings make these equal in practice;
                # merge keeps the read loud if they ever are not
                fields.append(
                    T.StructField(
                        f.name,
                        merge_types(merged[f.name].dataType, f.dataType),
                        True,
                    )
                )
            else:
                # anchor-only column (added after every retained data
                # window): serve it null-filled like the table does
                fields.append(T.StructField(f.name, f.dataType, True))
        fields += [merged[n] for n in _META_COLS]
        target = T.StructType(fields)
    if single:
        # one multi-path relation even when a projection applies: a
        # single shared shape that ALREADY matches the current
        # projection (the steady state — anchor == window schema)
        # skips the select entirely; a coalesced union-shaped window
        # after a drop pays one projection, never a per-window union
        fast = spark.read.parquet(*dirs)
        shape = [(f.name, f.dataType) for f in schemas[0].fields]
        if shape == [(f.name, f.dataType) for f in target.fields]:
            return fast
        return align_to_schema(fast, target)
    out = align_to_schema(frames[0], target)
    for f in frames[1:]:
        out = out.unionByName(align_to_schema(f, target))
    return out


def coalesce_export(spark, export_dir: str, up_to: int) -> tuple[int, int] | None:
    """Binpack for the export: merge every retained window whose
    ``hi`` is at or below ``up_to`` into ONE window directory — a
    consumer bootstrapping from a long history then opens one
    directory instead of one per historical batch (``prune_export``
    serves tailing consumers; this serves full-read ones).  Rows keep
    their per-SEGMENT stamps, so ``replay_to_state`` ordering is
    byte-identical; mixed schemas across an evolution reconcile the
    same way reads do.  Returns the merged (lo, hi), or None when
    fewer than two windows qualify.

    Crash contract: the merged window is PUBLISHED first (atomic
    rename), the originals deleted after — a crash in between leaves
    originals fully COVERED by the merged window, which every listing
    skips and the next coalesce/prune sweeps.  Consumers mid-way
    through the merged range simply re-read it (at-least-once;
    ``replay_to_state``-style application is idempotent, and a
    row-level ``_export_hi > cursor`` filter recovers exactly-once).
    Single concurrent maintainer per directory, same contract as the
    exporter."""
    floor = _floor(export_dir, _read_anchor(export_dir))
    _sweep_tmp(export_dir, role_export=False)  # own crashed leftovers only
    # sweep a crashed coalesce's covered leftovers (invisible to reads)
    raw = sorted(
        w
        for name in os.listdir(export_dir)
        if (w := _parse_window(name)) is not None and w[1] > floor
    )
    live = _published_windows(export_dir, floor)
    for w in raw:
        if w not in live:
            shutil.rmtree(
                os.path.join(export_dir, f"{_PREFIX}{w[0]}_{w[1]}"),
                ignore_errors=True,
            )
    merge = [w for w in live if w[1] <= int(up_to)]
    if len(merge) < 2:
        return None
    lo, hi = merge[0][0], merge[-1][1]
    paths = [
        os.path.join(export_dir, f"{_PREFIX}{a}_{b}") for a, b in merge
    ]
    data_dirs = [
        d for d in paths
        if any(f.endswith(".parquet") for f in os.listdir(d))
    ]
    target = os.path.join(export_dir, f"{_PREFIX}{lo}_{hi}")
    if data_dirs:
        tmp = os.path.join(export_dir, f"{_TMP_C}{lo}_{hi}_{os.getpid()}")
        _read_reconciled(spark, data_dirs).write.mode("overwrite").parquet(tmp)
        os.replace(tmp, target)
    else:
        os.makedirs(target)  # all markers: one merged marker
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return (lo, hi)


def scrub_export_windows(
    spark, export_dir: str, ids: DataFrame, key_cols: list[str]
) -> int:
    """Takedown cascade for the export (the compliance flow's outbound
    half, job.forget_keys): rewrite every retained window that carries
    a forgotten key's rows so NO payload survives under the export
    directory — published CDC windows hold full insert/pre/post/delete
    images that ``keep_last_windows`` may never prune, and every
    replica bootstrap re-materializes them.  Returns the number of
    windows rewritten.

    What survives, precisely: insert / update_preimage /
    update_postimage rows of forgotten keys are DROPPED; their
    ``delete`` rows are KEPT with every non-key data column nulled
    (the CDF serves deletes with full pre-images).  Keeping the nulled
    tombstone is load-bearing: a lagging replica that absorbed the
    key's insert before the takedown still receives the delete and
    removes the row — scrubbing the delete too would strand the
    payload on every slow replica forever.  The key value itself
    remains, as in Delta/Iceberg delete files: it is the address of
    the removal, not the content.  Replay stays coherent:
    ``replay_to_state`` over a scrubbed export equals the live table
    (the forgotten keys' latest change is the kept delete, or nothing
    at all — absent either way).

    Window identity is untouched — names, bounds, and every other
    row's ``_export_lo``/``_export_hi`` stamps are preserved, so
    consumer cursors and the contiguity chain never notice.

    Crash contract (per window, sequential): write the filtered rows
    to a role-scoped temp, journal {window, tmp, trash}
    (``_forget_inflight.json``, atomic replace), rename the original
    window to the trash name, rename the temp into place, then remove
    the journal and the trash.  A crash anywhere leaves a journal that
    fully determines recovery (``_recover_forget``) — run by the NEXT
    scrub/forget invocation, never by readers: a reader cannot tell a
    crashed swap from a live one, so reader-side repair would race the
    scrubber's own renames.  Readers hitting the swap's transient
    one-window gap retry the listing briefly (the gap is two
    back-to-back renames) and, when the journal persists past the
    retries, raise naming the re-run remedy.  A rolled-back window is
    redone by re-running the forget — idempotent throughout.  The
    scrubber is a MAINTAINER role (same single-maintainer contract as
    ``coalesce_export``): don't run two scrubs or a scrub + coalesce
    concurrently; the exporter may overlap (disjoint directories,
    role-scoped temp sweeps).

    Scale shape: ONE reconciled scan of the retained data windows
    (bounded by retention) broadcast-semi-joined against the forgotten
    keys finds the hit windows by their segment stamps; only hit
    windows are rewritten, each a window-bounded scan + broadcast
    join.  Never O(history) when retention is configured, and a miss
    costs one probe scan."""
    _recover_forget(export_dir)
    # a crashed scrub's unjournaled leftovers (temp written, journal
    # not yet) are safe to sweep — the swap never started
    for name in os.listdir(export_dir):
        if name.startswith(_TMP_F) or name.startswith(_TRASH_F):
            shutil.rmtree(os.path.join(export_dir, name), ignore_errors=True)
    _, _, windows = _listed(export_dir)
    paths = {
        w: os.path.join(export_dir, f"{_PREFIX}{w[0]}_{w[1]}")
        for w in windows
    }
    data = [
        w
        for w in windows
        if any(f.endswith(".parquet") for f in os.listdir(paths[w]))
    ]
    if not data:
        return 0
    # null-keyed ids cannot address a subject (and would break the
    # equality joins below): refuse loudly rather than silently
    # scrubbing nothing for them
    ids = ids.select(*key_cols).distinct().localCheckpoint(eager=True)
    any_null = F.lit(False)
    for k in key_cols:
        any_null = any_null | F.col(k).isNull()
    if ids.filter(any_null).limit(1).count():
        raise ValueError(
            "scrub_export_windows: forgotten ids contain a null key — "
            "null keys cannot address a row for removal"
        )
    # probe pass: segment stamps identify each hit row's window
    # (every segment hi lies inside its window's (lo, hi])
    hits = {
        r["_export_hi"]
        for r in _read_reconciled(spark, [paths[w] for w in data])
        .join(F.broadcast(ids), on=key_cols, how="left_semi")
        .select("_export_hi")
        .distinct()
        .collect()
    }
    hit_windows = [w for w in data if any(w[0] < h <= w[1] for h in hits)]
    marked_ids = ids.withColumn("_forget", F.lit(True))
    for lo, hi in hit_windows:
        target = paths[(lo, hi)]
        df = spark.read.parquet(target)
        missing = [k for k in key_cols if k not in df.columns]
        if missing:
            raise ValueError(
                f"scrub_export_windows: window w_{lo}_{hi} lacks key "
                f"column(s) {missing} — cannot address its rows"
            )
        types = {f.name: f.dataType for f in df.schema.fields}
        kept = df.join(F.broadcast(marked_ids), on=key_cols, how="left").filter(
            F.col("_forget").isNull()
            | (F.col("_change_type") == F.lit("delete"))
        )
        out = kept.select(
            *[
                F.when(
                    F.col("_forget").isNotNull(),
                    F.lit(None).cast(types[c]),
                )
                .otherwise(F.col(c))
                .alias(c)
                if c not in key_cols and c not in _META_COLS
                else F.col(c)
                for c in df.columns
            ]
        )
        name = f"{_PREFIX}{lo}_{hi}"
        tmp_name = f"{_TMP_F}{lo}_{hi}_{os.getpid()}"
        trash_name = f"{_TRASH_F}{lo}_{hi}_{os.getpid()}"
        tmp = os.path.join(export_dir, tmp_name)
        out.write.mode("overwrite").parquet(tmp)
        jp = os.path.join(export_dir, _FORGET_JOURNAL)
        with open(jp + ".tmp", "w") as fh:
            json.dump({"name": name, "tmp": tmp_name, "trash": trash_name}, fh)
        os.replace(jp + ".tmp", jp)
        os.rename(target, os.path.join(export_dir, trash_name))
        os.rename(tmp, target)
        os.remove(jp)
        shutil.rmtree(os.path.join(export_dir, trash_name), ignore_errors=True)
    return len(hit_windows)


def tail_change_export(
    spark, export_dir: str, cursor: int
) -> tuple[DataFrame, int]:
    """The consumer loop's one-call step: read the windows above
    ``cursor`` and return ``(changes, new_cursor)`` — pass the new
    cursor back next cycle (and hand it to ``prune_export`` once the
    changes are durably applied downstream).  A maintenance-only cycle
    returns an empty frame with an advanced cursor; a cursor below the
    retention floor raises ``ExpiredCursorError`` like the underlying
    read.  Cursor and frame derive from ONE directory listing, so they
    are consistent by construction (a window published after the
    listing lands in the next cycle) and the loop pays a single
    metadata pass per cycle."""
    anchor, floor, windows = _listed(export_dir)
    new_cursor = max(int(cursor), windows[-1][1] if windows else floor)
    changes = _frame_for(spark, export_dir, anchor, floor, windows, cursor)
    return changes, new_cursor


_APPLY_KEY = "cdc-apply.cursor"


def _check_policy_pairing(
    target: ManagedTable, source_policy: tuple[str, str] | None
) -> None:
    """Enforce the apply_changes exactness contract for ``latest_wins``
    replicas (ADVICE r11): with the source's (merge_policy, table_type)
    known — ``sync_from_export`` reads it off the export anchor — a
    mispaired replica RAISES instead of silently drifting (the
    tombstone mask rejects lower-ordered re-inserts a COW or
    unconditional source serves).  Without it (bare ``apply_changes``
    on a hand-built tail, or a pre-r12 anchor missing the fields), a
    latest_wins target gets a warning: the pairing cannot be verified."""
    if target.meta.merge_policy != "latest_wins":
        return  # unconditional replicas mirror ANY source
    if source_policy is None:
        log.warning(
            "apply_changes onto a latest_wins replica (%s) without a "
            "known source policy: exact mirroring holds only when the "
            "source is a latest_wins MOR table — a COW or "
            "unconditional source's delete-then-lower-ordered-reinsert "
            "sequences will diverge (see the exactness contract)",
            target.path,
        )
        return
    policy, ttype = source_policy
    if policy != "latest_wins" or ttype.upper() != "MOR":
        raise ValueError(
            f"latest_wins replica {target.path} cannot mirror a "
            f"source with merge_policy={policy!r} table_type={ttype!r}:"
            " only a latest_wins MOR source resolves reads identically"
            " (a COW delete erases order memory the replica's "
            "tombstone keeps) — recreate the replica with the default "
            "unconditional policy, which mirrors any source exactly"
        )


def apply_changes(
    changes: DataFrame,
    target: ManagedTable,
    new_cursor: int,
    source_policy: tuple[str, str] | None = None,
) -> int:
    """Apply a tail read into a downstream ``ManagedTable`` — the
    production consumer for ``tail_change_export``, turning the tail's
    at-least-once delivery into exactly-once application (Delta's
    MERGE-from-CDF replication recipe, expressed on this table layer).

    Per key, the tail's latest state-setting change wins (the
    ``replay_to_state`` rank over per-segment stamps); post-images and
    inserts MERGE on the target's keys.  Deletes are applied for
    EVERY key that carries one anywhere in the tail — not just keys
    whose latest change is a delete — and they are applied BEFORE the
    merge, so a row the source deleted can never outlive its delete
    on the replica: a tail carrying delete(k) plus a LOWER-ordered
    re-insert of k would otherwise leave a ``latest_wins`` replica's
    stale higher-ordered copy winning reads forever.  Keys whose
    latest change is a delete contribute no merge row, so the
    tombstone stands.

    EXACTNESS CONTRACT: a replica with ``merge_policy='unconditional'``
    (the default) mirrors the source exactly — application order IS
    export order, and the export already encodes each source's own
    read resolution into net-effect changes (the round-trip law).  A
    ``latest_wins`` replica resolves reads by its order column on top
    of that, which matches a ``latest_wins`` MOR source (identical
    resolution on both sides) but can diverge from a COW source: a
    COW delete physically erases its row's order value, so the source
    can serve a later LOWER-ordered re-insert that a MOR replica's
    tombstone mask rejects.  Prefer unconditional replicas; pair
    ``latest_wins`` replicas only with ``latest_wins`` MOR sources.
    ENFORCED when ``source_policy`` (the source's (merge_policy,
    table_type) — ``sync_from_export`` reads it off the export anchor)
    is given: a mispaired latest_wins replica raises; without it a
    latest_wins target gets a warning (the pairing is unverifiable).
    (Appending previously-deleted keys is outside the engine's append
    contract — append is for new keys; route re-inserts through
    merge.)

    Two guards make re-delivery safe:

    - rows at or below the replica's durable ``cdc-apply.cursor``
      property are filtered out BEFORE the rank — a coalesced window
      spanning the cursor (or a re-read after a crash) never rewrites
      keys with changes the replica already absorbed;
    - a call whose ``new_cursor`` does not advance the stored cursor
      is a pure no-op (the whole tail was already applied).

    Source schema evolution PROPAGATES: the replica's contract is
    reconciled with the tail's shape (``evolve_schema`` — added
    columns add, lossless widenings widen, both metadata-only and
    idempotent) before the merge, so evolved values land instead of
    being silently projected away.  A column the source DROPPED stays
    on the replica (the export read already stopped serving it;
    applied post-images null-fill it) — drop it on the replica
    deliberately if desired.

    Crash contract: evolve → delete → merge → cursor write, in that
    order.  A crash mid-way replays the same tail next cycle;
    re-tombstoning and re-merging the same latest-per-key rows are
    idempotent, so the replica converges and the cursor only advances
    once the changes are durably applied.  Between the delete and the
    merge, readers transiently miss re-inserted keys — the same
    transient class as the join MV's stale-row window.  Returns the
    target's version.

    Scale shape: one key-partitioned rank over the pinned tail
    (O(tail)), one tombstone delete + one keyed MOR merge on the
    target — never O(replica)."""
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    keys = list(target.meta.key_cols)
    if not keys:
        raise ValueError(
            f"apply_changes target {target.path} has no key columns — "
            "a keyed replica is required to apply keyed changes"
        )
    _check_policy_pairing(target, source_policy)
    applied = int(target.meta.properties.get(_APPLY_KEY, 0))
    new_cursor = int(new_cursor)
    if new_cursor <= applied:
        return target._current_version()
    setting = (
        changes.filter(
            F.col("_change_type").isin(
                "insert", "update_postimage", "delete"
            )
            & (F.col("_export_hi") > applied)
        )
        # consumed by the rank feeding the merge's write AND the
        # any-delete key set's tombstone write — pin once; bounded by
        # the tail
        .localCheckpoint(eager=True)
    )
    base_schema = T.StructType(
        [f for f in setting.schema.fields if f.name not in _META_COLS]
    )
    # metadata-only and idempotent — same rule as the ingest path
    target.evolve_schema(base_schema)
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
        F.col("_export_hi").desc()
    )
    latest = (
        setting.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    ups = latest.filter(F.col("_change_type") != "delete").drop(
        "_rn", "_change_type", "_export_lo", "_export_hi"
    )
    # ANY delete in the tail tombstones its key (see docstring);
    # delete_keys dedups and no-ops on an empty set internally
    dels = setting.filter(F.col("_change_type") == "delete").select(*keys)
    version = target.delete_keys(dels)
    # emptiness is decided by the merge's own write (r13): the old
    # shape pinned `latest` and probed isEmpty to feed
    # assume_nonempty — with the write-as-probe that pair is two
    # extra jobs, and `latest`'s rank shuffle now has exactly one
    # consumer (the merge's write), so the pin goes too
    vmerge = target.merge(ups)
    if vmerge > version:
        version = vmerge
    target.set_properties(**{_APPLY_KEY: new_cursor})
    return version


def validate_sync_preconditions(
    export_dir: str,
    target: ManagedTable,
    allow_partial_bootstrap: bool = False,
) -> tuple[int, tuple[str, str] | None]:
    """The raise-early checks every replica-sync entry point shares —
    ``sync_from_export`` runs them per cycle; the streaming twin
    (``start_streaming_replica_sync``) runs them BEFORE the stream
    starts so a doomed consumer fails fast instead of burying the
    refusal in the first trigger's exception.  Returns ``(applied,
    source_policy)``: the cursor to tail from (the provision point on
    a fresh replica) and the anchor-recorded source policy (None on
    pre-r12 anchors — the pairing then degrades to ``apply_changes``'s
    warning).  Raises: ``ExpiredCursorError`` when a fresh replica
    cannot reconstruct full state (pruned export, or an export
    provisioned mid-history without ``allow_partial_bootstrap``);
    ``ValueError`` when a ``latest_wins`` replica is paired with
    anything but a ``latest_wins`` MOR source, and when ``export_dir``
    is not a provisioned export at all (the producer has not started,
    or the path is a typo — every consumer entry point shares this
    loud refusal instead of a raw missing-file error)."""
    try:
        anchor = _read_anchor(export_dir)
    except FileNotFoundError as exc:
        raise ValueError(
            f"{export_dir!r} is not a provisioned change export (no "
            "_anchor.json) — start the producer job first "
            "(output_config.cdc_exports provisions lazily on its "
            "first batch), or fix the path"
        ) from exc
    applied = int(target.meta.properties.get(_APPLY_KEY, 0))
    if applied == 0:
        provisioned = int(anchor["from_version"])
        if _floor(export_dir, anchor) > provisioned:
            raise ExpiredCursorError(
                f"replica bootstrap from {export_dir} is impossible: "
                "windows below the retention floor were pruned, so the "
                "retained suffix cannot reconstruct full state — "
                "re-provision the export with consume_from=1 or seed "
                "the replica from a table snapshot"
            )
        if provisioned > 1 and not allow_partial_bootstrap:
            raise ExpiredCursorError(
                f"replica bootstrap from {export_dir} would be PARTIAL:"
                f" the export was provisioned at source version "
                f"{provisioned} (consume_from=None anchors at the "
                "source's then-current version), so rows that predate "
                "the provision were never exported — re-provision the "
                "export with consume_from=1, seed the replica from a "
                "table snapshot, or pass allow_partial_bootstrap=True "
                "to deliberately absorb post-provision changes only"
            )
        applied = provisioned
    policy = None
    if "source_merge_policy" in anchor:
        policy = (
            str(anchor["source_merge_policy"]),
            str(anchor.get("source_table_type", "")),
        )
        # known policy: a mispairing raises HERE (fail-fast on every
        # entry path); the unverifiable case stays apply_changes's
        # warning so it fires exactly once per apply
        _check_policy_pairing(target, policy)
    return applied, policy


def sync_from_export(
    spark,
    export_dir: str,
    target: ManagedTable,
    consumer_id: str | None = None,
    allow_partial_bootstrap: bool = False,
) -> int:
    """One replica-sync step: tail the export from the replica's own
    durable cursor (``cdc-apply.cursor``) and apply exactly-once —
    the loop body a downstream sync job runs per cycle.  Returns the
    new cursor (pass it to ``prune_export`` once every consumer has
    passed it).

    ``consumer_id`` (fan-out): after the apply, record the cursor in
    the export's ``_consumers/`` registry so producer-side retention
    (``maintain_export_cadences``) never prunes windows this replica
    still needs — required when N replicas tail one export at
    different speeds.  Registration happens AFTER the apply commits,
    so a crash between them merely under-reports progress (retention
    keeps one extra window — safe side).

    Bootstrap: a replica that has never applied (no stored cursor)
    starts at the export's provision point and absorbs the full
    retained history — refused with ``ExpiredCursorError`` when the
    export was ALREADY pruned, AND when the export was provisioned
    mid-history (``from_version > 1``, the ``consume_from=None``
    default): either way the retained windows lack pre-provision rows,
    so the replica would silently present a partial table as full
    state.  Re-provision the export with ``consume_from=1``, seed the
    replica from a table snapshot, or pass
    ``allow_partial_bootstrap=True`` to deliberately absorb only
    post-provision changes.

    The exactness contract is ENFORCED here: the anchor records the
    source's merge policy and table type at provision, so a
    ``latest_wins`` replica tailing anything but a ``latest_wins`` MOR
    source raises before the first apply (pre-r12 anchors without the
    fields degrade to ``apply_changes``'s warning).  All raise-early
    checks live in ``validate_sync_preconditions`` (shared with the
    streaming twin's pre-start fail-fast)."""
    applied, policy = validate_sync_preconditions(
        export_dir, target, allow_partial_bootstrap
    )
    changes, new_cursor = tail_change_export(spark, export_dir, applied)
    apply_changes(changes, target, new_cursor, source_policy=policy)
    if consumer_id is not None:
        record_consumer_cursor(export_dir, consumer_id, new_cursor)
    return new_cursor


def replay_to_state(changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Reconstruct the source's final live state from an export alone
    — the downstream-sync semantics (and the round-trip check): per
    key, the state-setting change with the highest segment stamp wins
    (segments are net-effect, so each key has at most one
    insert/post-image or delete per segment); a key whose latest
    change is a delete is absent."""
    from pyspark.sql import Window  # noqa: PLC0415

    setting = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage", "delete")
    )
    w = Window.partitionBy(
        *[F.col(c) for c in key_cols]
    ).orderBy(F.col("_export_hi").desc())
    return (
        setting.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_change_type") != "delete"))
        .drop("_rn", "_change_type", "_export_lo", "_export_hi")
    )

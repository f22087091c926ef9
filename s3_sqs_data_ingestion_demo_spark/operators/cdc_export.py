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

Pure-append windows export straight off the cheap change feed (no CDF
classification); windows with merge deltas / tombstones / rewrites
export the net-effect CDF.  Maintenance-only windows publish an
empty marker directory so the listing-cursor still advances
(compaction is content-neutral, exactly why ``change_segments``
splits there).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..table import ManagedTable
from .rollup import change_segments, segment_is_pure_append

_ANCHOR = "_anchor.json"
_PREFIX = "w_"
_TMP = "_tmp_"


def create_change_export(
    src: ManagedTable, export_dir: str, consume_from: int | None = None
) -> None:
    """Provision the export directory and anchor its cursor: default =
    the source's CURRENT version (export new changes only); pass ``1``
    to have the first export carry the source's existing content as
    inserts (bootstrap)."""
    os.makedirs(export_dir, exist_ok=True)
    anchor = os.path.join(export_dir, _ANCHOR)
    if os.path.exists(anchor):
        raise ValueError(f"change export already provisioned at {export_dir}")
    lo = src._current_version() if consume_from is None else int(consume_from)
    with open(anchor, "w") as fh:
        json.dump(
            {
                "from_version": lo,
                "source": src.path,
                # lets a reader construct an EMPTY changes frame when
                # only maintenance markers have been published yet
                "schema": src.meta.schema.jsonValue(),
            },
            fh,
        )


def _published_windows(export_dir: str) -> list[tuple[int, int]]:
    out = []
    for name in os.listdir(export_dir):
        if name.startswith(_PREFIX):
            try:
                lo, hi = name[len(_PREFIX):].split("_")
                out.append((int(lo), int(hi)))
            except ValueError:
                continue
    return sorted(out)


def _cursor(export_dir: str) -> int:
    ws = _published_windows(export_dir)
    if ws:
        return ws[-1][1]
    with open(os.path.join(export_dir, _ANCHOR)) as fh:
        return int(json.load(fh)["from_version"])


def export_changes(src: ManagedTable, export_dir: str) -> tuple[int, int] | None:
    """Export the source changes since the last published window;
    returns the published (lo, hi) or None when there was nothing to
    consume.  See the module docstring for the layout and the crash
    contract."""
    for name in os.listdir(export_dir):
        if name.startswith(_TMP):  # a crashed attempt's unpublished dir
            shutil.rmtree(os.path.join(export_dir, name), ignore_errors=True)
    lo = _cursor(export_dir)
    hi = src._current_version()
    if hi <= lo:
        return None
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


def read_change_export(spark, export_dir: str) -> DataFrame:
    """Every published window as one frame (rows carry
    ``_change_type`` and ``_export_lo``/``_export_hi``) — what a
    downstream consumer reads; filter ``_export_hi > <cursor>`` to
    tail incrementally."""
    windows = _published_windows(export_dir)
    if not windows:
        raise ValueError(f"no published change windows under {export_dir}")
    dirs = [
        os.path.join(export_dir, f"{_PREFIX}{lo}_{hi}")
        for lo, hi in windows
    ]
    dirs = [d for d in dirs if any(f.endswith(".parquet") for f in os.listdir(d))]
    if not dirs:
        # published, but every window so far is a maintenance marker
        # (or an empty net effect): an empty frame with the exported
        # shape, not an error — a tail loop must survive a
        # maintenance-only cycle
        from pyspark.sql import types as T  # noqa: PLC0415

        with open(os.path.join(export_dir, _ANCHOR)) as fh:
            base = T.StructType.fromJson(json.load(fh)["schema"])
        fields = list(base.fields) + [
            T.StructField("_change_type", T.StringType(), True),
            T.StructField("_export_lo", T.IntegerType(), False),
            T.StructField("_export_hi", T.IntegerType(), False),
        ]
        return spark.createDataFrame([], T.StructType(fields))
    return spark.read.parquet(*dirs)


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

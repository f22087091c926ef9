"""Outbound CDC export (operators/cdc_export.py): windows published
atomically as immutable parquet directories, cursor derived from the
listing (no side state), replay-safe, and the round-trip law —
``replay_to_state(read_change_export(...))`` reconstructs the source's
final live state exactly."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
    create_change_export,
    export_changes,
    read_change_export,
    replay_to_state,
)
from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    ExpiredCursorError,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _mk_src(spark, tmp):
    return ManagedTable.create(
        spark,
        f"{tmp}/src",
        SCHEMA,
        key_cols=["id"],
        order_column="seq",
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v, seq=s) for i, g, v, s in rows], SCHEMA
    )


def _state(df):
    return sorted((r.id, r.grp, r.v) for r in df.select("id", "grp", "v").collect())


def test_roundtrip_across_upserts_and_deletes(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(i, "a", i, 1) for i in range(10)]))
    assert export_changes(src, ex) is not None
    src.merge(_rows(spark, [(2, "b", 99, 2), (10, "a", 5, 2)]))
    src.delete_keys(spark.createDataFrame([(3,), (4,)], "id int"))
    assert export_changes(src, ex) is not None
    assert export_changes(src, ex) is None  # nothing new
    replayed = replay_to_state(
        read_change_export(spark, ex), ["id"]
    )
    assert _state(replayed) == _state(src.read())


def test_delete_then_reinsert_across_windows(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    export_changes(src, ex)
    src.merge(_rows(spark, [(1, "b", 7, 3)]))
    export_changes(src, ex)
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert _state(replayed) == [(1, "b", 7)]


def test_replay_skips_published_window(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    # a replayed call for the same window returns it without rewriting
    mtimes = {
        n: os.path.getmtime(os.path.join(ex, n)) for n in os.listdir(ex)
    }
    assert export_changes(src, ex) == w1 or export_changes(src, ex) is None
    for n, m in mtimes.items():
        assert os.path.getmtime(os.path.join(ex, n)) == m


def test_crashed_tmp_dir_is_cleaned(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    junk = os.path.join(ex, "_tmp_1_2_999")
    os.makedirs(junk)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    assert not os.path.exists(junk)
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert _state(replayed) == [(1, "a", 1)]


def test_bootstrap_and_maintenance_only_windows(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 1, 1), (2, "a", 2, 1)]))
    ex = f"{tmp_path}/export"
    # consume_from=1: first export carries existing content as inserts
    create_change_export(src, ex, consume_from=1)
    export_changes(src, ex)
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert _state(replayed) == [(1, "a", 1), (2, "a", 2)]
    # a compaction-only window publishes an empty marker and advances
    src.compact()
    w = export_changes(src, ex)
    assert w is not None
    assert export_changes(src, ex) is None
    # the empty marker doesn't break the reader
    assert _state(
        replay_to_state(read_change_export(spark, ex), ["id"])
    ) == [(1, "a", 1), (2, "a", 2)]


def test_expired_cursor_fails_loudly(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    for i in range(6):
        src.append(_rows(spark, [(i, "a", i, 1)]))
    src.expire_snapshots(keep_last=2)
    with pytest.raises(ExpiredCursorError):
        export_changes(src, ex)


def test_double_provision_refused(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    with pytest.raises(ValueError, match="already provisioned"):
        create_change_export(src, ex)


def test_maintenance_split_window_orders_segments(spark, tmp_path):
    """A maintenance commit BETWEEN two data commits inside one export
    window: the two segments' net effects carry distinct per-segment
    stamps, so replay keeps the LATER state deterministically (the
    review finding: window-level stamps tied and row_number picked an
    arbitrary winner)."""
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 10, 1)]))
    export_changes(src, ex)
    # one window containing: update -> compaction -> update
    src.merge(_rows(spark, [(1, "a", 20, 2)]))
    src.compact()
    src.merge(_rows(spark, [(1, "a", 30, 3)]))
    export_changes(src, ex)
    changes = read_change_export(spark, ex)
    # the two post-images carry different segment stamps
    his = sorted(
        r._export_hi
        for r in changes.filter("_change_type = 'update_postimage'")
        .select("_export_hi").collect()
    )
    assert len(his) == 2 and his[0] < his[1]
    replayed = replay_to_state(changes, ["id"])
    assert _state(replayed) == [(1, "a", 30)]


def test_maintenance_split_delete_then_reinsert_same_window(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "b", 2, 1)]))
    export_changes(src, ex)
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    src.compact()
    src.merge(_rows(spark, [(1, "c", 7, 3)]))
    export_changes(src, ex)
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert _state(replayed) == [(1, "c", 7), (2, "b", 2)]


def test_marker_only_export_reads_empty(spark, tmp_path):
    """A tail loop must survive a maintenance-only cycle: when every
    published window is a marker, read_change_export returns an EMPTY
    frame with the exported shape (schema from the anchor), not an
    error."""
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)  # anchored at current: nothing to export
    src.compact()
    assert export_changes(src, ex) is not None  # marker published
    changes = read_change_export(spark, ex)
    assert changes.count() == 0
    assert "_change_type" in changes.columns
    assert "_export_hi" in changes.columns
    # and replay over it yields an empty state, not a crash
    assert replay_to_state(changes, ["id"]).count() == 0
    # a data window afterwards reads normally alongside the marker
    src.append(_rows(spark, [(2, "b", 5, 2)]))
    export_changes(src, ex)
    assert _state(
        replay_to_state(read_change_export(spark, ex), ["id"])
    ) == [(2, "b", 5)]

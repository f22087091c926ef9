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
    prune_export,
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


# ---- tailing, retention, gap detection (round 10) ----


def test_since_read_opens_only_new_window_files(spark, tmp_path):
    """The tail contract: read_change_export(since=cursor) must subset
    the window DIRECTORIES by their encoded bounds before Spark lists
    a file — inputFiles() proves the old windows were never opened."""
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    src.append(_rows(spark, [(2, "b", 2, 1)]))
    w2 = export_changes(src, ex)
    src.merge(_rows(spark, [(2, "b", 9, 2)]))
    w3 = export_changes(src, ex)
    tail = read_change_export(spark, ex, since=w1[1])
    files = tail.inputFiles()
    assert files, "tail should have data files"
    old_dir = f"w_{w1[0]}_{w1[1]}"
    assert all(old_dir not in f for f in files)
    assert any(f"w_{w2[0]}_{w2[1]}" in f for f in files)
    assert any(f"w_{w3[0]}_{w3[1]}" in f for f in files)
    # and the rows are exactly the two later windows' changes
    ids = sorted(r.id for r in tail.filter(
        "_change_type in ('insert','update_postimage')").collect())
    assert ids == [2, 2]
    # a caught-up cursor reads an empty, correctly-shaped tail
    empty = read_change_export(spark, ex, since=w3[1])
    assert empty.count() == 0 and "_change_type" in empty.columns


def test_prune_export_retention(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    src.merge(_rows(spark, [(1, "a", 5, 2)]))
    w2 = export_changes(src, ex)
    # prune the consumed first window
    assert prune_export(ex, w1[1]) == w1[1]
    assert not os.path.exists(os.path.join(ex, f"w_{w1[0]}_{w1[1]}"))
    assert os.path.exists(os.path.join(ex, f"w_{w2[0]}_{w2[1]}"))
    # the retained suffix still reads and exports continue seamlessly
    assert read_change_export(spark, ex).count() > 0
    src.append(_rows(spark, [(3, "c", 3, 1)]))
    w3 = export_changes(src, ex)
    assert w3[0] == w2[1]
    # a consumer whose cursor predates the floor fails loudly
    with pytest.raises(ExpiredCursorError, match="retention floor"):
        read_change_export(spark, ex, since=0)
    # pruning everything leaves a working (empty) export
    assert prune_export(ex, w3[1]) == w3[1]
    assert read_change_export(spark, ex, since=w3[1]).count() == 0
    src.append(_rows(spark, [(4, "d", 4, 1)]))
    w4 = export_changes(src, ex)
    assert w4[0] == w3[1]
    assert _state(
        replay_to_state(read_change_export(spark, ex, since=w3[1]), ["id"])
    ) == [(4, "d", 4)]


def test_prune_export_noop_below_existing_floor(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    assert prune_export(ex, 0) is None
    assert prune_export(ex, w1[1]) == w1[1]
    assert prune_export(ex, w1[1]) is None  # idempotent


def test_crashed_prune_leftover_invisible_and_swept(spark, tmp_path):
    """A prune that recorded its floor but crashed before deleting:
    the below-floor directory must be invisible to readers/exporters
    and swept by the next prune."""
    import json as _json

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    src.append(_rows(spark, [(2, "b", 2, 1)]))
    w2 = export_changes(src, ex)
    # simulate the crash: floor recorded (pruner-owned file), dir NOT
    # deleted
    with open(os.path.join(ex, "_pruned_to.json"), "w") as fh:
        _json.dump({"pruned_to": w1[1]}, fh)
    leftover = os.path.join(ex, f"w_{w1[0]}_{w1[1]}")
    assert os.path.exists(leftover)
    # readers ignore the leftover (no w1 rows), exports continue
    ids = {r.id for r in read_change_export(spark, ex).collect()}
    assert ids == {2}
    assert export_changes(src, ex) is None
    # the next prune sweeps it even when nothing new qualifies
    prune_export(ex, w1[1])
    assert not os.path.exists(leftover)
    assert os.path.exists(os.path.join(ex, f"w_{w2[0]}_{w2[1]}"))


def test_lost_window_gap_detected(spark, tmp_path):
    """ADVICE r9: a window directory lost to partial sync / manual
    cleanup must raise — resuming past the gap would silently
    reconstruct state missing that window's changes."""
    import shutil as _shutil

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    src.append(_rows(spark, [(2, "b", 2, 1)]))
    export_changes(src, ex)
    src.append(_rows(spark, [(3, "c", 3, 1)]))
    _shutil.rmtree(os.path.join(ex, f"w_{w1[0]}_{w1[1]}"))
    with pytest.raises(ValueError, match="window chain broken"):
        read_change_export(spark, ex)
    with pytest.raises(ValueError, match="window chain broken"):
        export_changes(src, ex)


# ---- composition with schema evolution (round 10) ----


def test_export_across_add_columns(spark, tmp_path):
    """Windows written before and after an add_columns evolution read
    as ONE coherent evolved shape: old-window rows null-fill the new
    column, replay matches the live table."""
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1), (2, "b", 2, 1)]))
    export_changes(src, ex)
    src.add_columns([T.StructField("note", T.StringType(), True)])
    evolved = spark.createDataFrame(
        [Row(id=2, grp="b", v=20, seq=2, note="hot"),
         Row(id=3, grp="c", v=3, seq=1, note="new")],
        src.meta.schema,
    )
    src.merge(evolved)
    export_changes(src, ex)
    changes = read_change_export(spark, ex)
    assert "note" in changes.columns
    rows = {(r.id, r._change_type): r for r in changes.collect()}
    assert rows[(1, "insert")].note is None  # pre-evolution window
    assert rows[(3, "insert")].note == "new"
    replayed = replay_to_state(changes, ["id"])
    got = sorted((r.id, r.grp, r.v, r.note) for r in replayed.collect())
    want = sorted(
        (r.id, r.grp, r.v, r.note)
        for r in src.read().collect()
    )
    assert got == want
    # the evolved column survives a since-tail read too
    tail = read_change_export(spark, ex, since=2)
    assert "note" in tail.columns


def test_export_across_widen_column(spark, tmp_path):
    """A widen_column evolution (int → bigint) between windows: the
    reconciled read promotes old windows' narrow values losslessly."""
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 7, 1)]))
    export_changes(src, ex)
    src.widen_column("v", T.LongType())
    big = 2**40
    src.merge(
        spark.createDataFrame(
            [Row(id=2, grp="b", v=big, seq=2)], src.meta.schema
        )
    )
    export_changes(src, ex)
    changes = read_change_export(spark, ex)
    assert dict(changes.dtypes)["v"] == "bigint"
    replayed = replay_to_state(changes, ["id"])
    assert sorted((r.id, r.v) for r in replayed.collect()) == [
        (1, 7), (2, big)
    ]


def test_marker_read_serves_evolved_schema(spark, tmp_path):
    """The anchor schema is refreshed on evolution, so the empty
    marker-only read path serves the CURRENT exported shape, not the
    provision-time one."""
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)  # anchored at current
    src.add_columns([T.StructField("note", T.StringType(), True)])
    src.compact()  # the only new commit is maintenance: marker window
    assert export_changes(src, ex) is not None
    changes = read_change_export(spark, ex)
    assert changes.count() == 0
    assert "note" in changes.columns


def test_prune_floor_survives_concurrent_schema_refresh(spark, tmp_path):
    """Review finding (r10): the floor lives in its own pruner-owned
    file, so an exporter's anchor-schema refresh can never clobber it.
    An export that rewrites the anchor AFTER a prune must leave the
    retention floor intact — chain still anchored at the floor, a
    below-floor cursor still refused."""
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    src.append(_rows(spark, [(2, "b", 2, 1)]))
    w2 = export_changes(src, ex)
    assert prune_export(ex, w1[1]) == w1[1]
    # the exporter now refreshes the anchor (schema evolution) — the
    # stale-anchor write-back that used to regress the floor
    src.add_columns([T.StructField("note", T.StringType(), True)])
    src.merge(
        spark.createDataFrame(
            [Row(id=3, grp="c", v=3, seq=1, note="n")], src.meta.schema
        )
    )
    w3 = export_changes(src, ex)
    assert w3[0] == w2[1]
    # floor intact: chain reads fine, pre-floor cursor still expired
    assert read_change_export(spark, ex).count() > 0
    with pytest.raises(ExpiredCursorError, match="retention floor"):
        read_change_export(spark, ex, since=0)
    # and a stray window-like directory crashes neither prune nor read
    os.makedirs(os.path.join(ex, "w_backup_old"))
    assert prune_export(ex, 0) is None
    assert read_change_export(spark, ex).count() > 0


def test_tail_change_export_loop(spark, tmp_path):
    """The one-call consumer step: (changes, new_cursor) per cycle,
    cursor monotone, maintenance-only cycles advance it with an empty
    frame, and prune behind the cursor keeps the loop running."""
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        tail_change_export,
    )

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    cur = 1
    state = {}

    def pump():
        nonlocal cur
        changes, new_cur = tail_change_export(spark, ex, cur)
        for r in sorted(
            changes.filter(
                "_change_type in ('insert','update_postimage','delete')"
            ).collect(),
            key=lambda x: x._export_hi,
        ):
            if r._change_type == "delete":
                state.pop(r.id, None)
            else:
                state[r.id] = (r.grp, r.v)
        prune_export(ex, cur)
        cur = new_cur

    src.append(_rows(spark, [(1, "a", 1, 1), (2, "b", 2, 1)]))
    export_changes(src, ex)
    pump()
    assert sorted((i, g, v) for i, (g, v) in state.items()) == _state(src.read())
    src.compact()  # maintenance-only cycle: empty frame, cursor advances
    export_changes(src, ex)
    before = cur
    pump()
    assert cur > before
    src.merge(_rows(spark, [(2, "b", 9, 2)]))
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    export_changes(src, ex)
    pump()
    assert sorted((i, g, v) for i, (g, v) in state.items()) == _state(src.read())
    # an idle cycle is a no-op with a stable cursor
    before = cur
    pump()
    assert cur == before


def test_coalesce_export_merges_windows(spark, tmp_path):
    """Binpack for the export: merged window carries the same rows
    with the same per-segment stamps — replay identical, tail reads
    unaffected, one directory instead of three."""
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        coalesce_export,
    )

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1), (2, "b", 2, 1)]))
    w1 = export_changes(src, ex)
    src.merge(_rows(spark, [(2, "b", 9, 2)]))
    export_changes(src, ex)
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    w3 = export_changes(src, ex)
    before = _state(replay_to_state(read_change_export(spark, ex), ["id"]))
    assert coalesce_export(spark, ex, w3[1]) == (w1[0], w3[1])
    dirs = [n for n in os.listdir(ex) if n.startswith("w_")]
    assert dirs == [f"w_{w1[0]}_{w3[1]}"]
    after = _state(replay_to_state(read_change_export(spark, ex), ["id"]))
    assert after == before == _state(src.read())
    # fewer than two windows: no-op
    assert coalesce_export(spark, ex, w3[1]) is None
    # the export continues seamlessly past the merged window
    src.append(_rows(spark, [(5, "e", 5, 1)]))
    w4 = export_changes(src, ex)
    assert w4[0] == w3[1]
    assert _state(
        replay_to_state(read_change_export(spark, ex), ["id"])
    ) == _state(src.read())


def test_coalesce_export_crash_leaves_covered_originals(spark, tmp_path):
    """Publish-then-delete crash: originals fully covered by the
    merged window are skipped by every listing and swept by the next
    coalesce."""
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        coalesce_export,
    )

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    w1 = export_changes(src, ex)
    src.append(_rows(spark, [(2, "b", 2, 1)]))
    w2 = export_changes(src, ex)
    coalesce_export(spark, ex, w2[1])
    # manufacture the crash leftover: a covered original still on disk
    leftover = os.path.join(ex, f"w_{w1[0]}_{w1[1]}")
    os.makedirs(leftover)
    # readers skip it (rows come from the merged window only)
    assert _state(
        replay_to_state(read_change_export(spark, ex), ["id"])
    ) == _state(src.read())
    assert export_changes(src, ex) is None
    # the next coalesce sweeps it even when nothing new merges
    assert coalesce_export(spark, ex, w2[1]) is None
    assert not os.path.exists(leftover)


def test_coalesce_export_markers_and_evolution(spark, tmp_path):
    """Marker-only ranges merge to one marker; mixed schemas across an
    evolution merge onto the reconciled shape."""
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        coalesce_export,
    )

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    src.add_columns([T.StructField("note", T.StringType(), True)])
    src.merge(
        spark.createDataFrame(
            [Row(id=2, grp="b", v=2, seq=1, note="n")], src.meta.schema
        )
    )
    w2 = export_changes(src, ex)
    # evolution boundary inside the merged range: reconciled schema
    assert coalesce_export(spark, ex, w2[1]) is not None
    changes = read_change_export(spark, ex)
    assert "note" in changes.columns
    rows = {r.id: r.note for r in changes.collect()}
    assert rows == {1: None, 2: "n"}
    # marker-only range merges to one marker dir
    src.compact()
    export_changes(src, ex)
    src.compact()
    w4 = export_changes(src, ex)
    merged = coalesce_export(spark, ex, w4[1])
    assert merged is not None
    # full read still serves the data + an empty merged marker
    assert _state(
        replay_to_state(read_change_export(spark, ex), ["id"])
    ) == _state(src.read())


def test_coalesce_export_all_marker_range(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        coalesce_export,
    )

    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)  # anchored at current
    src.compact()
    w1 = export_changes(src, ex)
    src.compact()
    w2 = export_changes(src, ex)
    assert coalesce_export(spark, ex, w2[1]) == (w1[0], w2[1])
    dirs = [n for n in os.listdir(ex) if n.startswith("w_")]
    assert dirs == [f"w_{w1[0]}_{w2[1]}"]
    # merged marker reads as the shaped empty frame
    changes = read_change_export(spark, ex)
    assert changes.count() == 0 and "_change_type" in changes.columns


def test_listing_retries_once_on_concurrent_prune(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10: a prune that records a new floor and deletes
    windows BETWEEN a reader's floor read and its listdir makes the
    chain look broken at the stale floor.  The reader re-reads the
    floor and re-lists once (transient race resolved); a genuinely
    lost window — floor unchanged — still raises."""
    import s3_sqs_data_ingestion_demo_spark.operators.cdc_export as CE

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    src.merge(_rows(spark, [(1, "a", 2, 2)]))
    export_changes(src, ex)
    windows = sorted(
        CE._parse_window(n)
        for n in os.listdir(ex)
        if CE._parse_window(n) is not None
    )
    assert len(windows) == 2
    # prune the first window for real…
    floor = prune_export(ex, windows[0][1])
    assert floor == windows[0][1]
    # …then simulate the reader having read the PRE-prune floor: the
    # first _floor call answers stale, subsequent calls answer truth
    real_floor = CE._floor
    calls = {"n": 0}

    def stale_once(export_dir, anchor):
        calls["n"] += 1
        if calls["n"] == 1:
            return windows[0][0]  # pre-prune floor: chain looks broken
        return real_floor(export_dir, anchor)

    monkeypatch.setattr(CE, "_floor", stale_once)
    got = read_change_export(spark, ex)  # retries once, succeeds
    assert got.count() > 0
    assert calls["n"] == 2
    monkeypatch.undo()

    # a GENUINE gap (floor unchanged) still raises through the retry
    src.merge(_rows(spark, [(1, "a", 3, 3)]))
    export_changes(src, ex)
    src.merge(_rows(spark, [(1, "a", 4, 4)]))
    export_changes(src, ex)
    live = sorted(
        CE._parse_window(n)
        for n in os.listdir(ex)
        if CE._parse_window(n) is not None
    )
    victim = live[0]
    import shutil as _sh

    _sh.rmtree(os.path.join(ex, f"w_{victim[0]}_{victim[1]}"))
    with pytest.raises(ValueError, match="window chain broken"):
        read_change_export(spark, ex)


def test_export_across_drop_column(spark, tmp_path):
    """Windows written before a drop_column evolution stop serving the
    dropped column: the read projects the reconciled union onto the
    export's CURRENT schema — the table layer's own rule ("history is
    served under the CURRENT schema"), so replay matches the live
    table's shape exactly instead of resurrecting the column
    null-filled."""
    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1), (2, "b", 2, 1)]))
    export_changes(src, ex)
    src.drop_column("grp")
    src.merge(
        spark.createDataFrame(
            [Row(id=2, v=20, seq=2), Row(id=3, v=3, seq=1)],
            src.meta.schema,
        )
    )
    export_changes(src, ex)
    changes = read_change_export(spark, ex)
    assert "grp" not in changes.columns
    replayed = replay_to_state(changes, ["id"])
    assert sorted(replayed.columns) == sorted(src.read().columns)
    assert sorted((r.id, r.v) for r in replayed.collect()) == sorted(
        (r.id, r.v) for r in src.read().collect()
    )
    # the pre-drop window's OTHER values still serve (id=1 is an
    # old-window survivor)
    assert (1, 1) in [(r.id, r.v) for r in replayed.collect()]


def test_export_add_widen_add_chain_with_coalesce(spark, tmp_path):
    """A multi-step evolution chain (add -> widen -> add) with
    coalesce_export run across BOTH boundaries: the binpack rewrite
    reconciles losslessly and replay stays byte-identical to the live
    table at every step."""
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        coalesce_export,
        list_export_windows,
    )

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)

    src.add_columns([T.StructField("note", T.StringType(), True)])
    src.merge(spark.createDataFrame(
        [Row(id=2, grp="b", v=2, seq=1, note="x")], src.meta.schema))
    export_changes(src, ex)

    src.widen_column("v", T.LongType())
    big = 2**40
    src.merge(spark.createDataFrame(
        [Row(id=3, grp="c", v=big, seq=1, note=None)], src.meta.schema))
    w3 = export_changes(src, ex)

    # binpack across the add AND widen boundaries
    assert coalesce_export(spark, ex, w3[1]) is not None
    assert len(list_export_windows(ex)) == 1

    def check():
        changes = read_change_export(spark, ex)
        assert dict(changes.dtypes)["v"] == "bigint"
        got = sorted(
            (r.id, r.grp, r.v, r.note)
            for r in replay_to_state(changes, ["id"]).collect()
        )
        want = sorted(
            (r.id, r.grp, r.v, r.note) for r in src.read().collect()
        )
        assert got == want

    check()

    # second add AFTER the coalesce, then coalesce across that
    # boundary too (merged window ∪ post-evolution window)
    src.add_columns([T.StructField("tag", T.IntegerType(), True)])
    src.merge(spark.createDataFrame(
        [Row(id=1, grp="a", v=10, seq=2, note=None, tag=7)],
        src.meta.schema))
    w4 = export_changes(src, ex)
    changes = read_change_export(spark, ex)
    assert "tag" in changes.columns
    assert coalesce_export(spark, ex, w4[1]) is not None
    assert len(list_export_windows(ex)) == 1
    got = sorted(
        (r.id, r.grp, r.v, r.note, r.tag)
        for r in replay_to_state(read_change_export(spark, ex), ["id"])
        .collect()
    )
    want = sorted(
        (r.id, r.grp, r.v, r.note, r.tag) for r in src.read().collect()
    )
    assert got == want


def test_coalesce_across_drop_boundary_stays_lossless(spark, tmp_path):
    """coalesce_export across a drop_column boundary rewrites the
    UNION shape (lossless — the dropped column's old values survive
    the binpack), while consumer reads keep projecting it away."""
    import pyarrow.parquet as pq

    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        coalesce_export,
        list_export_windows,
    )

    src = _mk_src(spark, tmp_path)
    ex = f"{tmp_path}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    src.drop_column("grp")
    src.merge(spark.createDataFrame(
        [Row(id=2, v=2, seq=1)], src.meta.schema))
    w2 = export_changes(src, ex)
    assert coalesce_export(spark, ex, w2[1]) is not None
    ws = list_export_windows(ex)
    assert len(ws) == 1
    # physical files keep the union shape (grp survives the rewrite)
    merged_dir = os.path.join(ex, f"w_{ws[0][0]}_{ws[0][1]}")
    pfile = next(
        os.path.join(merged_dir, f)
        for f in os.listdir(merged_dir)
        if f.endswith(".parquet")
    )
    assert "grp" in pq.read_schema(pfile).names
    # the consumer read projects it away and replay matches the table
    changes = read_change_export(spark, ex)
    assert "grp" not in changes.columns
    got = sorted(
        (r.id, r.v)
        for r in replay_to_state(changes, ["id"]).collect()
    )
    assert got == sorted((r.id, r.v) for r in src.read().collect())

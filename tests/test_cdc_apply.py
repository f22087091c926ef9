"""Downstream applier (operators/cdc_export.apply_changes /
sync_from_export): a replica ManagedTable kept in sync by tailing a
change export — the at-least-once tail made exactly-once by the
replica's durable ``cdc-apply.cursor`` property and a row-level
``_export_hi > cursor`` guard.

Pinned: two-table sync across insert/upsert/delete equals the source;
re-applied tails are no-ops; below-cursor rows never rewrite applied
keys (the coalesced-window case); prune below the replica cursor
keeps the loop working; a fresh replica refuses to bootstrap from a
pruned export."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
    _APPLY_KEY,
    apply_changes,
    create_change_export,
    export_changes,
    prune_export,
    sync_from_export,
    tail_change_export,
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


def _mk(spark, tmp, name):
    return ManagedTable.create(
        spark, f"{tmp}/{name}", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v, seq=s) for i, g, v, s in rows], SCHEMA
    )


def _state(tbl):
    return sorted(
        (r.id, r.grp, r.v) for r in tbl.read().select("id", "grp", "v").collect()
    )


def test_two_table_sync_tracks_source(spark, tmp_path):
    d = str(tmp_path)
    src, rep = _mk(spark, d, "src"), _mk(spark, d, "rep")
    ex = f"{d}/export"
    create_change_export(src, ex)
    batches = [
        ("append", [(1, "a", 1, 1), (2, "a", 2, 1), (3, "b", 3, 1)]),
        ("merge", [(1, "b", 10, 2), (4, "c", 4, 2)]),
        ("delete", [(2, "", 0, 0)]),
    ]
    for kind, rows in batches:
        if kind == "append":
            src.append(_rows(spark, rows))
        elif kind == "merge":
            src.merge(_rows(spark, rows))
        else:
            src.delete_keys(
                spark.createDataFrame([(r[0],) for r in rows], "id int")
            )
        export_changes(src, ex)
        cursor = sync_from_export(spark, ex, rep)
        assert _state(rep) == _state(src)
        assert int(rep.meta.properties[_APPLY_KEY]) == cursor

    # a maintenance-only cycle (nothing new) advances nothing, breaks
    # nothing
    v = rep._current_version()
    sync_from_export(spark, ex, rep)
    assert rep._current_version() == v
    assert _state(rep) == _state(src)


def test_reapplied_tail_is_noop_and_idempotent(spark, tmp_path):
    d = str(tmp_path)
    src, rep = _mk(spark, d, "src"), _mk(spark, d, "rep")
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    changes, cur = tail_change_export(spark, ex, 1)
    apply_changes(changes, rep, cur)
    assert _state(rep) == _state(src)
    v = rep._current_version()
    # same tail again (crash after cursor write): cursor guard no-ops
    # without a single new commit
    apply_changes(changes, rep, cur)
    assert rep._current_version() == v
    # crash BEFORE the cursor write: simulate by resetting the cursor
    # and re-applying — idempotent merge, state converges
    rep.set_properties(**{_APPLY_KEY: 0})
    apply_changes(changes, rep, cur)
    assert _state(rep) == _state(src)


def test_below_cursor_rows_never_rewrite_applied_keys(spark, tmp_path):
    """The coalesced-window case: a merged window spanning the
    replica's cursor re-delivers rows the replica already absorbed —
    they must be filtered BEFORE the rank, not re-merged."""
    d = str(tmp_path)
    rep = _mk(spark, d, "rep")
    rep.merge(_rows(spark, [(1, "a", 5, 9)]))
    rep.set_properties(**{_APPLY_KEY: 10})
    meta = [
        T.StructField("_change_type", T.StringType()),
        T.StructField("_export_lo", T.IntegerType()),
        T.StructField("_export_hi", T.IntegerType()),
    ]
    ch_schema = T.StructType(list(SCHEMA.fields) + meta)
    changes = spark.createDataFrame(
        [
            # id=1's STALE post-image from below the cursor: must not
            # overwrite the replica's newer value
            (1, "a", 1, 1, "update_postimage", 5, 7),
            # id=2's fresh insert above the cursor: must apply
            (2, "b", 2, 1, "insert", 10, 12),
        ],
        ch_schema,
    )
    apply_changes(changes, rep, 12)
    assert _state(rep) == [(1, "a", 5), (2, "b", 2)]
    assert int(rep.meta.properties[_APPLY_KEY]) == 12


def test_prune_below_replica_cursor_keeps_loop_working(spark, tmp_path):
    d = str(tmp_path)
    src, rep = _mk(spark, d, "src"), _mk(spark, d, "rep")
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    cursor = sync_from_export(spark, ex, rep)
    # producer-side retention below the consumer's cursor
    assert prune_export(ex, cursor) == cursor
    src.merge(_rows(spark, [(1, "a", 2, 2), (2, "b", 1, 1)]))
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    assert _state(rep) == _state(src) == [(1, "a", 2), (2, "b", 1)]


def test_fresh_replica_refuses_pruned_export(spark, tmp_path):
    d = str(tmp_path)
    src, rep = _mk(spark, d, "src"), _mk(spark, d, "rep")
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    src.merge(_rows(spark, [(1, "a", 2, 2)]))
    export_changes(src, ex)
    # prune the first window: the suffix alone cannot reconstruct state
    first_hi = sorted(
        int(n.split("_")[2])
        for n in __import__("os").listdir(ex)
        if n.startswith("w_")
    )[0]
    prune_export(ex, first_hi)
    with pytest.raises(ExpiredCursorError, match="bootstrap"):
        sync_from_export(spark, ex, rep)


def test_apply_requires_keyed_target(spark, tmp_path):
    d = str(tmp_path)
    rep = ManagedTable.create(spark, f"{d}/rep", SCHEMA, table_type="MOR")
    empty = spark.createDataFrame(
        [],
        T.StructType(
            list(SCHEMA.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_export_lo", T.IntegerType()),
                T.StructField("_export_hi", T.IntegerType()),
            ]
        ),
    )
    with pytest.raises(ValueError, match="no key columns"):
        apply_changes(empty, rep, 5)


def test_delete_then_reinsert_in_one_tail_under_latest_wins(
    spark, tmp_path
):
    """Review finding (r11): a tail containing delete(k) and a
    re-insert of k must TOMBSTONE the replica's prior row before
    merging.  Under latest_wins a tombstone defeats lower-ordered
    late rows (re-inserting k with a LOWER seq does not resurrect it
    on the source — probed table semantics), so a replica holding
    k at seq=9 that merely merged the seq=2 re-insert would keep the
    stale seq=9 row winning reads forever; applying the delete first
    makes the replica resolve exactly like the source at every
    step."""
    d = str(tmp_path)
    src = ManagedTable.create(
        spark, f"{d}/src", SCHEMA, key_cols=["id"], order_column="seq",
        table_type="MOR", merge_policy="latest_wins",
    )
    rep = ManagedTable.create(
        spark, f"{d}/rep", SCHEMA, key_cols=["id"], order_column="seq",
        table_type="MOR", merge_policy="latest_wins",
    )
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 9)]))  # high seq
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    assert _state(rep) == [(1, "a", 1)]
    # now, WITHOUT a sync in between: delete then re-insert with a
    # LOWER seq — both land in the replica's next tail.  The source
    # resolves to EMPTY (the tombstone defeats the lower-seq late
    # row); without the tombstone the replica would still serve the
    # seq=9 row.
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    export_changes(src, ex)
    src.merge(_rows(spark, [(1, "b", 7, 2)]))  # lower seq than 9
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    assert _state(src) == []
    assert _state(rep) == []
    # a HIGHER-seq re-insert resurrects the key on both sides
    src.merge(_rows(spark, [(1, "c", 5, 10)]))
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    assert _state(src) == [(1, "c", 5)]
    assert _state(rep) == [(1, "c", 5)]


def test_apply_propagates_source_schema_evolution(spark, tmp_path):
    """Review finding (r11): evolved columns land on the replica
    (evolve_schema before the merge) instead of being silently
    projected away by the merge's align step."""
    d = str(tmp_path)
    src, rep = _mk(spark, d, "src"), _mk(spark, d, "rep")
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    src.add_columns([T.StructField("note", T.StringType(), True)])
    src.merge(
        spark.createDataFrame(
            [(2, "b", 2, 1, "hello")],
            T.StructType(
                list(SCHEMA.fields)
                + [T.StructField("note", T.StringType(), True)]
            ),
        )
    )
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    assert "note" in rep.meta.schema.fieldNames()
    got = {r.id: r.note for r in rep.read().collect()}
    assert got == {1: None, 2: "hello"}


def _synth_tail(spark, rows):
    """A hand-built tail frame (the COW-source shape: a delete AND a
    later lower-ordered re-insert of the same key are both visible)."""
    meta = [
        T.StructField("_change_type", T.StringType()),
        T.StructField("_export_lo", T.IntegerType()),
        T.StructField("_export_hi", T.IntegerType()),
    ]
    return spark.createDataFrame(
        rows, T.StructType(list(SCHEMA.fields) + meta)
    )


def test_deleted_row_never_outlives_its_delete(spark, tmp_path):
    """Pins the any-delete-BEFORE-merge ordering (r11 review): a tail
    carrying delete(k) plus a later LOWER-ordered re-insert of k —
    the shape a COW source exports, synthesized here because a MOR
    source's own resolution never publishes the losing re-insert.
    Without the tombstone, a latest_wins replica's stale seq=9 copy
    would win reads forever; with it, the deleted row is gone (the
    replica then resolves the re-insert under its own policy)."""
    d = str(tmp_path)
    rep = ManagedTable.create(
        spark, f"{d}/rep", SCHEMA, key_cols=["id"], order_column="seq",
        table_type="MOR", merge_policy="latest_wins",
    )
    rep.merge(_rows(spark, [(1, "a", 1, 9)]))
    rep.set_properties(**{_APPLY_KEY: 10})
    tail = _synth_tail(spark, [
        (1, None, None, None, "delete", 10, 11),
        (1, "b", 7, 2, "insert", 11, 12),
    ])
    apply_changes(tail, rep, 12)
    # the deleted seq=9 row must NOT survive.  (A latest_wins MOR
    # tombstone also rejects the lower-seq re-insert — the documented
    # COW→MOR divergence; the exact-mirror case is the unconditional
    # replica below.)
    got = [(r.id, r.seq) for r in rep.read().collect()]
    assert (1, 9) not in got
    assert got == []


def test_unconditional_replica_mirrors_cow_shaped_tail(spark, tmp_path):
    """The exactness contract: an unconditional replica applies in
    export order, so the COW-shaped delete-then-lower-ordered-reinsert
    tail lands the re-insert — exactly what the COW source serves."""
    d = str(tmp_path)
    rep = _mk(spark, d, "rep")  # default policy: unconditional
    rep.merge(_rows(spark, [(1, "a", 1, 9)]))
    rep.set_properties(**{_APPLY_KEY: 10})
    tail = _synth_tail(spark, [
        (1, None, None, None, "delete", 10, 11),
        (1, "b", 7, 2, "insert", 11, 12),
    ])
    apply_changes(tail, rep, 12)
    assert [(r.id, r.grp, r.v, r.seq) for r in rep.read().collect()] == [
        (1, "b", 7, 2)
    ]


def test_streaming_cdc_export_refuses_bad_mode(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.streaming import (
        start_streaming_cdc_export,
    )

    with pytest.raises(ValueError, match="mode must be"):
        start_streaming_cdc_export(
            spark, str(tmp_path), SCHEMA,
            ManagedTable.create(spark, f"{tmp_path}/t", SCHEMA,
                                key_cols=["id"], table_type="MOR"),
            f"{tmp_path}/ex", mode="upsert",
        )


def test_apply_across_source_drop_column(spark, tmp_path):
    """Apply after the source DROPPED a column: the export read stops
    serving it, so applied post-images null-fill it on the replica
    (the replica keeps the column — documented)."""
    d = str(tmp_path)
    src, rep = _mk(spark, d, "src"), _mk(spark, d, "rep")
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    assert _state(rep) == [(1, "a", 1)]
    src.drop_column("grp")
    src.merge(
        spark.createDataFrame(
            [(1, 10, 2), (2, 2, 1)],
            T.StructType([f for f in SCHEMA.fields if f.name != "grp"]),
        )
    )
    export_changes(src, ex)
    sync_from_export(spark, ex, rep)
    # the replica keeps grp (its own contract); updated/new rows
    # null-fill it; values otherwise match the source
    got = {(r.id): (r.grp, r.v) for r in rep.read().collect()}
    assert got == {1: (None, 10), 2: (None, 2)}
    assert sorted((r.id, r.v) for r in src.read().collect()) == sorted(
        (i, v) for i, (g, v) in got.items()
    )

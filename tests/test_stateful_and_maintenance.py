"""Custom stateful streaming operators + table maintenance."""

import glob
import os

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.streaming.stateful import (
    first_seen_keys,
    running_user_stats,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from tests.test_table import SCHEMA, df_of


def _feed(spark, land, name, rows):
    df = spark.createDataFrame(rows, "user_id long, value double")
    df.coalesce(1).write.mode("overwrite").parquet(land + "_tmp")
    for i, f in enumerate(glob.glob(land + "_tmp/*.parquet")):
        os.replace(f, os.path.join(land, f"{name}_{i}.parquet"))


def _run_stateful(spark, land, out, ck, op, mode="update"):
    stream = spark.readStream.schema("user_id long, value double").parquet(land)
    q = (
        op(stream)
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ck)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_running_stats_accumulate_across_restarts(spark, tmp_path):
    land = str(tmp_path / "in"); os.makedirs(land)
    out = str(tmp_path / "out"); ck = str(tmp_path / "ck")

    _feed(spark, land, "b1", [(1, 1.0), (1, 2.0), (2, 5.0)])
    _run_stateful(spark, land, out, ck, running_user_stats)
    r1 = {r.user_id: r for r in spark.read.parquet(out).collect()}
    assert (r1[1].n_events, r1[1].sum_value) == (2, 3.0)
    assert (r1[2].n_events, r1[2].sum_value) == (1, 5.0)

    # restart with a new batch: state must have been recovered
    _feed(spark, land, "b2", [(1, 10.0), (3, 7.0)])
    _run_stateful(spark, land, out, ck, running_user_stats)
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:  # keep max n_events per user (cumulative emissions)
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    assert (latest[1].n_events, latest[1].sum_value) == (3, 13.0)
    assert (latest[3].n_events, latest[3].sum_value) == (1, 7.0)


def test_first_seen_keys_cross_batch(spark, tmp_path):
    land = str(tmp_path / "in"); os.makedirs(land)
    out = str(tmp_path / "out"); ck = str(tmp_path / "ck")

    _feed(spark, land, "b1", [(1, 1.0), (2, 1.0), (1, 1.0)])
    _run_stateful(spark, land, out, ck, first_seen_keys, mode="append")
    assert sorted(r.user_id for r in spark.read.parquet(out).collect()) == [1, 2]

    _feed(spark, land, "b2", [(1, 9.0), (3, 1.0)])  # 1 is a re-sight
    _run_stateful(spark, land, out, ck, first_seen_keys, mode="append")
    assert sorted(r.user_id for r in spark.read.parquet(out).collect()) == [1, 2, 3]


def test_compact_preserves_data_and_replaces_roots(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "tbl"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    for i in range(4):  # many small appends -> many roots
        t.append(df_of(spark, [(i, "a", float(i), 1), (100 + i, "b", 1.0, 1)]))
    before = sorted(tuple(r) for r in t.read().collect())
    assert len(t._read_manifest()) == 4
    t.compact()
    assert len(t._read_manifest()) == 1
    assert sorted(tuple(r) for r in t.read().collect()) == before


def test_compaction_cadence_counts_data_commits_not_versions(spark, tmp_path):
    """compact_every must count DATA commits since the last compact.
    Raw-version modulus is off by one: compact itself bumps the
    version, so with compact_every=2 every single subsequent merge
    lands on an even version and triggers a full-table rewrite."""
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "tbl"), SCHEMA,
        partition_cols=[], key_cols=["id"], order_column="ts",
        table_type="MOR",
    )
    assert t.data_commits_since_maintenance() == 0  # create isn't data
    for i in range(2):
        t.merge(df_of(spark, [(i, "a", 1.0, 1)]))
    assert t.data_commits_since_maintenance() == 2
    t.compact()
    assert t.data_commits_since_maintenance() == 0  # counter reset
    t.merge(df_of(spark, [(9, "a", 1.0, 1)]))
    # one merge after a compact: cadence-2 must NOT be due yet
    assert t.data_commits_since_maintenance() == 1
    t.merge(df_of(spark, [(10, "a", 1.0, 1)]))
    assert t.data_commits_since_maintenance() == 2


def test_expire_snapshots_gc(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "tbl"), SCHEMA,
        partition_cols=[], key_cols=["id"], order_column="ts",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    t.overwrite(df_of(spark, [(2, "b", 2.0, 1)]))
    t.merge(df_of(spark, [(2, "b", 9.0, 2)]))
    data_roots_before = set(os.listdir(os.path.join(t.path, "data")))
    expired = t.expire_snapshots(keep_last=1)
    assert expired and t.history() == [t._current_version()]
    # current data still readable, orphaned roots gone
    assert [tuple(r) for r in t.read().collect()] == [(2, "b", 9.0, 2)]
    data_roots_after = set(os.listdir(os.path.join(t.path, "data")))
    assert data_roots_after < data_roots_before


def _has_protobuf():
    try:
        import google.protobuf.descriptor  # noqa: F401
        return True
    except ImportError:
        return False


import pytest


@pytest.mark.skipif(not _has_protobuf(), reason="transformWithState needs google.protobuf (absent here)")
def test_transform_with_state_running_stats(spark, tmp_path):
    """Same cumulative semantics on the Spark 4 transformWithState API,
    including checkpoint recovery across restarts."""
    from s3_sqs_data_ingestion_demo_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    land = str(tmp_path / "in"); os.makedirs(land)
    out = str(tmp_path / "out"); ck = str(tmp_path / "ck")

    _feed(spark, land, "b1", [(1, 1.0), (1, 2.0), (2, 5.0)])
    _run_stateful(spark, land, out, ck, running_user_stats_tws)
    r1 = {r.user_id: r for r in spark.read.parquet(out).collect()}
    assert (r1[1].n_events, r1[1].sum_value) == (2, 3.0)

    _feed(spark, land, "b2", [(1, 10.0)])
    _run_stateful(spark, land, out, ck, running_user_stats_tws)
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    assert (latest[1].n_events, latest[1].sum_value) == (3, 13.0)
    assert (latest[2].n_events, latest[2].sum_value) == (1, 5.0)


def test_transform_with_state_fails_loudly_without_protobuf(spark):
    """In environments without protobuf the operator must fail at plan
    time with a clear message, not crash the streaming worker."""
    if _has_protobuf():
        return  # covered by the full test above
    from s3_sqs_data_ingestion_demo_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    import os as _os
    land = "/tmp/sg_tws_probe"; _os.makedirs(land, exist_ok=True)
    df = spark.readStream.schema("user_id long, value double").parquet(land)
    try:
        running_user_stats_tws(df)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "protobuf" in str(e)

"""Rollback-to-snapshot (table.py rollback): append-only restore of a
retained earlier state — the Iceberg rollback_to_snapshot contract.
History keeps growing (the rolled-past snapshots stay
time-travelable), the change feed sees a rewrite window, and
incremental consumers absorb it through their retraction paths."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _mk(spark, tmp):
    return ManagedTable.create(
        spark,
        os.path.join(str(tmp), "t"),
        SCHEMA,
        key_cols=["id"],
        order_column="seq",
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v, seq=s) for i, g, v, s in rows], SCHEMA
    )


def _ids(df):
    return {(r.id, r.v) for r in df.collect()}


def test_rollback_restores_state_append_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 20, 1)]))
    good = t._current_version()
    t.merge(_rows(spark, [(1, "a", 99, 2), (3, "b", 5, 2)]))  # bad batch
    t.delete_keys(spark.createDataFrame([Row(id=2)]))          # worse
    bad = t._current_version()

    v = t.rollback(good)
    assert v > bad  # a NEW snapshot, not history rewriting
    assert _ids(t.read()) == {(1, 10), (2, 20)}
    # the bad states remain time-travelable until expired
    assert _ids(t.read_version(bad)) == {(1, 99), (3, 5)}
    # the rollback commit is tagged for replay detection
    assert t.has_commit_tag(f"rollback-{good}")
    # rollback of the rollback: forward again
    t.rollback(bad)
    assert _ids(t.read()) == {(1, 99), (3, 5)}


def test_rollback_by_ref_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [(1, "a", 1, 1)]))
    t.create_ref("audited")
    t.append(_rows(spark, [(2, "a", 2, 1)]))
    t.rollback("audited")
    assert _ids(t.read()) == {(1, 1)}
    with pytest.raises(ValueError, match="does not exist"):
        t.rollback("nope")
    with pytest.raises(ValueError, match="not a retained snapshot"):
        t.rollback(9999)
    # no-op rollback to current returns current without a new commit
    cur = t._current_version()
    assert t.rollback(cur) == cur


def test_rollback_feeds_incremental_consumers_exactly(spark, tmp_path):
    """A rollup refreshed across a rollback window must land on the
    restored state's aggregates — the rewrite window takes the CDF
    full-diff path and retractions absorb the undone batch."""
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        create_rollup,
        refresh_rollup,
    )

    t = _mk(spark, tmp_path)
    dst = create_rollup(
        t, os.path.join(str(tmp_path), "r"), ["grp"], ["v"], consume_from=1
    )
    t.append(_rows(spark, [(1, "a", 10, 1), (2, "b", 5, 1)]))
    refresh_rollup(t, dst, ["grp"], ["v"])
    good = t._current_version()
    t.merge(_rows(spark, [(1, "a", 99, 2), (3, "a", 7, 2)]))
    refresh_rollup(t, dst, ["grp"], ["v"])
    t.rollback(good)
    refresh_rollup(t, dst, ["grp"], ["v"])
    got = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    oracle = {
        r.grp: (r.n, float(r.s))
        for r in t.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == oracle == {"a": (1, 10.0), "b": (1, 5.0)}

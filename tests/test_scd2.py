"""SCD type-2 history from CDC changes (operators/scd.py)."""

import os

from pyspark.sql import functions as F  # noqa: F401

from s3_sqs_data_ingestion_demo_spark.operators.scd import (
    asof_lookup,
    create_scd2_table,
    scd2_history,
    scd2_merge,
)

CH = "k long, attr string, seq long"


def test_history_intervals_and_current_flag(spark):
    ch = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (1, "c", 30), (2, "x", 15)], CH
    )
    rows = {
        (r.k, r.valid_from_seq): (r.attr, r.valid_to_seq, r.is_current)
        for r in scd2_history(ch, ["k"], "seq").collect()
    }
    assert rows == {
        (1, 10): ("a", 20, 0),
        (1, 20): ("b", 30, 0),
        (1, 30): ("c", None, 1),
        (2, 15): ("x", None, 1),
    }


def test_redelivered_change_is_dropped(spark):
    ch = spark.createDataFrame([(1, "a", 10), (1, "a", 10)], CH)
    out = scd2_history(ch, ["k"], "seq").collect()
    assert len(out) == 1 and out[0].is_current == 1


def test_incremental_merge_equals_batch_history(spark, tmp_path):
    b1 = spark.createDataFrame([(1, "a", 10), (2, "x", 10)], CH)
    b2 = spark.createDataFrame([(1, "b", 20), (3, "n", 20)], CH)
    tbl = create_scd2_table(
        spark, os.path.join(str(tmp_path), "h"), b1, ["k"], "seq"
    )
    scd2_merge(tbl, b1, ["k"], "seq")
    scd2_merge(tbl, b2, ["k"], "seq")
    got = sorted(
        (r.k, r.valid_from_seq, r.attr, r.valid_to_seq, r.is_current)
        for r in tbl.read().collect()
    )
    want = sorted(
        (r.k, r.valid_from_seq, r.attr, r.valid_to_seq, r.is_current)
        for r in scd2_history(b1.unionByName(b2), ["k"], "seq").collect()
    )
    assert got == want
    # key 1's first version closed out in place; key 2 untouched
    assert (1, 10, "a", 20, 0) in got and (2, 10, "x", None, 1) in got


def test_asof_lookup_point_in_time(spark):
    ch = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "x", 15)], CH
    )
    hist = scd2_history(ch, ["k"], "seq")
    at12 = {r.k: r.attr for r in asof_lookup(hist, ["k"], 12).collect()}
    assert at12 == {1: "a"}  # key 2 not yet born at 12
    at20 = {r.k: r.attr for r in asof_lookup(hist, ["k"], 20).collect()}
    assert at20 == {1: "b", 2: "x"}  # half-open: version b opens AT 20

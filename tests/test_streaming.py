"""Structured Streaming: ingest exactly-once across restarts,
streaming-vs-batch window parity, watermark late-data behavior."""

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.streaming import start_file_ingest_stream
from s3_sqs_data_ingestion_demo_spark.streaming.windows import (
    sessionize,
    windowed_event_stats,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("part", T.StringType(), True),
        T.StructField("val", T.DoubleType(), True),
        T.StructField("ts", T.LongType(), True),
    ]
)

TBL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("part", T.StringType(), False),
        T.StructField("val", T.DoubleType(), True),
        T.StructField("ts", T.LongType(), True),
    ]
)


def _write_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("id,part,val,ts\n")
        for r in rows:
            fh.write(",".join(map(str, r)) + "\n")


def _drain(spark, land, table, ckpt):
    q = start_file_ingest_stream(
        spark, land, SRC_SCHEMA, table,
        options={"header": "true"}, mode="merge",
        checkpoint_dir=ckpt, available_now=True,
    )
    q.awaitTermination(120)


def test_ingest_exactly_once_across_restarts(spark, tmp_path):
    d = str(tmp_path)
    land = os.path.join(d, "landing")
    os.makedirs(land)
    table = ManagedTable.create(
        spark, os.path.join(d, "tbl"), TBL_SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    ckpt = os.path.join(d, "ckpt")

    _write_csv(os.path.join(land, "f1.csv"), [(1, "a", 1.0, 1), (2, "b", 2.0, 1)])
    _drain(spark, land, table, ckpt)
    assert table.read().count() == 2

    # restart with the same checkpoint: f1 must NOT reprocess; f2 must
    _write_csv(os.path.join(land, "f2.csv"), [(1, "a", 10.0, 2), (3, "c", 3.0, 1)])
    _drain(spark, land, table, ckpt)
    rows = {r.id: r for r in table.read().collect()}
    assert len(rows) == 3
    assert rows[1].val == 10.0  # upserted by f2
    v_after = table._current_version()

    # third restart with no new files: no new snapshot at all
    _drain(spark, land, table, ckpt)
    assert table._current_version() == v_after


def test_streaming_window_agg_matches_batch(spark, tmp_path):
    """The same windowed_event_stats over a stream (availableNow) and
    over the batch frame must agree — one operator, two engines."""
    from s3_sqs_data_ingestion_demo_spark.queries import t

    sf = "/root/testdata/sf0.001"
    # t() adapts to how this Spark surfaces TIMESTAMP(NANOS): older
    # versions honor nanosAsLong (bigint → timestamp_micros), 4.1+
    # reads it as TIMESTAMP_NTZ directly — a raw read with an
    # unconditional `ts div 1000` breaks on the latter.
    batch = t(spark, sf, "events")
    expected = sorted(
        tuple(r) for r in windowed_event_stats(batch, watermark=None).collect()
    )

    os.makedirs(tmp_path / "in")
    batch.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "part"))
    for f in os.listdir(tmp_path / "part"):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(tmp_path / "part", f), tmp_path / "in" / f)
    stream = spark.readStream.schema(batch.schema).parquet(str(tmp_path / "in"))

    agg = windowed_event_stats(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("select * from win_agg").collect())
    assert got == expected


def test_sessionize_batch_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:03:00", 2.0),   # same session (< 5 min gap)
        (1, "2024-01-01 10:20:00", 3.0),   # new session
        (2, "2024-01-01 10:00:00", 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_s string, value double").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = sorted(
        (r.user_id, str(r.session_start), r.n_events, r.sum_value)
        for r in sessionize(df, watermark=None).collect()
    )
    assert out == [
        (1, "2024-01-01 10:00:00", 2, 3.0),
        (1, "2024-01-01 10:20:00", 1, 3.0),
        (2, "2024-01-01 10:00:00", 1, 4.0),
    ]


def test_watermark_drops_very_late_rows(spark, tmp_path):
    """Late row beyond the watermark must be excluded from the final
    (append-mode) windowed result; a row within the bound is kept."""
    land = tmp_path / "late_in"
    os.makedirs(land)
    schema = "user_id int, ts timestamp, value double"

    df1 = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", 1.0), (1, "2024-01-01 13:00:00", 1.0)],
        "user_id int, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    df1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b1"))
    for f in os.listdir(tmp_path / "b1"):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(tmp_path / "b1", f), land / ("b1_" + f))

    stream = spark.readStream.schema(schema).parquet(str(land))
    agg = windowed_event_stats(
        stream, window="1 hour", watermark="1 hour", group_cols=("user_id",)
    )
    ck = str(tmp_path / "late_ck")
    out = str(tmp_path / "late_out")

    def run_batch():
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    # second file: one row 10:45 (window 10:00, far behind watermark
    # 13:00-1h=12:00 -> dropped), one row 12:30 (within bound -> kept)
    df2 = spark.createDataFrame(
        [(1, "2024-01-01 10:45:00", 100.0), (1, "2024-01-01 12:30:00", 7.0),
         (1, "2024-01-01 14:00:00", 1.0)],
        "user_id int, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    df2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b2"))
    for f in os.listdir(tmp_path / "b2"):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(tmp_path / "b2", f), land / ("b2_" + f))
    run_batch()
    run_batch()  # one more tick so closed windows flush

    rows = {
        str(r.window_start): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # 10:00 window emitted with ONLY the on-time row (late 100.0 dropped)
    assert rows.get("2024-01-01 10:00:00") == (1, 1.0)
    # 12:30 row (within watermark) landed in the 12:00 window
    assert rows.get("2024-01-01 12:00:00") == (1, 7.0)

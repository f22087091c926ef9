"""Stream-stream interval join + dedup-within-watermark."""

import glob
import os

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.streaming.joins import (
    dedup_within_watermark,
    stream_interval_join,
)

SCHEMA = "user_id long, ts timestamp, kind string, value double"


def _feed(spark, land, name, rows):
    df = spark.createDataFrame(
        [(u, t, k, v) for u, t, k, v in rows], "user_id long, ts_s string, kind string, value double"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "kind", "value")
    df.coalesce(1).write.mode("overwrite").parquet(land + "_tmp")
    for i, f in enumerate(glob.glob(land + "_tmp/*.parquet")):
        os.replace(f, os.path.join(land, f"{name}_{i}.parquet"))


def test_stream_stream_interval_join(spark, tmp_path):
    l_dir = str(tmp_path / "l"); r_dir = str(tmp_path / "r")
    os.makedirs(l_dir); os.makedirs(r_dir)
    _feed(spark, l_dir, "p", [
        (1, "2024-01-01 10:00:00", "purchase", 100.0),
        (2, "2024-01-01 11:00:00", "purchase", 50.0),
    ])
    _feed(spark, r_dir, "c", [
        (1, "2024-01-01 10:05:00", "click", 1.0),   # within 10m -> match
        (1, "2024-01-01 10:30:00", "click", 1.0),   # outside -> no match
        (2, "2024-01-01 10:59:00", "click", 1.0),   # before purchase -> no
        (2, "2024-01-01 11:04:00", "click", 1.0),   # within -> match
    ])
    left = spark.readStream.schema(SCHEMA).parquet(l_dir)
    right = spark.readStream.schema(SCHEMA).parquet(r_dir)
    joined = stream_interval_join(left, right, "user_id", "ts", "ts").select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("p_ts"),
        F.col("r.ts").alias("c_ts"),
    )
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted((r.user_id, str(r.c_ts)) for r in spark.read.parquet(out).collect())
    assert rows == [(1, "2024-01-01 10:05:00"), (2, "2024-01-01 11:04:00")]


def test_dedup_within_watermark_drops_dupes_across_batches(spark, tmp_path):
    land = str(tmp_path / "in"); os.makedirs(land)
    out = str(tmp_path / "out"); ck = str(tmp_path / "ck")

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(land)
        deduped = dedup_within_watermark(stream, ["user_id", "kind"], watermark="1 hour")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _feed(spark, land, "b1", [
        (1, "2024-01-01 10:00:00", "click", 1.0),
        (1, "2024-01-01 10:01:00", "click", 2.0),   # dup key within watermark
        (2, "2024-01-01 10:00:00", "view", 3.0),
    ])
    run()
    assert spark.read.parquet(out).count() == 2

    # second batch: another dup of (1, click) still within watermark ->
    # dropped thanks to checkpointed dedup state; a new key passes
    _feed(spark, land, "b2", [
        (1, "2024-01-01 10:02:00", "click", 9.0),
        (3, "2024-01-01 10:00:00", "click", 4.0),
    ])
    run()
    rows = sorted((r.user_id, r.kind) for r in spark.read.parquet(out).collect())
    assert rows == [(1, "click"), (2, "view"), (3, "click")]


def test_stream_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer interval join: a purchase with no click in-window is
    emitted NULL-padded once the watermark passes its interval."""
    l_dir = str(tmp_path / "lo_l"); r_dir = str(tmp_path / "lo_r")
    os.makedirs(l_dir); os.makedirs(r_dir)
    _feed(spark, l_dir, "p", [
        (1, "2024-01-01 10:00:00", "purchase", 100.0),   # will have no click
        (9, "2024-01-01 18:00:00", "purchase", 1.0),     # watermark pusher
    ])
    _feed(spark, r_dir, "c", [
        (9, "2024-01-01 18:01:00", "click", 1.0),
    ])
    left = spark.readStream.schema(SCHEMA).parquet(l_dir)
    right = spark.readStream.schema(SCHEMA).parquet(r_dir)
    joined = stream_interval_join(
        left, right, "user_id", "ts", "ts", watermark="1 minute", how="leftOuter"
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("p_ts"),
        F.col("r.ts").alias("c_ts"),
    )
    out = str(tmp_path / "lo_out")

    def run():
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "lo_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(); run()  # second tick finalizes lefts behind the watermark
    rows = {r.user_id: r.c_ts for r in spark.read.parquet(out).collect()}
    assert rows[9] is not None          # matched pair
    assert 1 in rows and rows[1] is None  # unmatched left emitted with NULL

"""Time-series regularization operators (gap-fill / resample).

The hypertable-style operation every event pipeline eventually needs:
turn an irregular event stream into a regular per-key time grid
(dashboards, feature windows, training frames), carrying the last
observation forward across gaps.

Scale shape: bucketing is a projection; per-(key, bucket) last-value
is one hash aggregate (window rank over the bucket, partial-agg
friendly); the grid explodes from each key's (min, max) span — rows
created JVM-side by ``sequence``, never on the driver; the forward
fill is one window pass per key ordered by bucket.  Two shuffles
total (key+bucket agg, key window), each on bounded-width rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_last_value(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    step_seconds: int = 3600,
    tiebreak_col: str = "event_id",
    mode: str = "locf",
) -> DataFrame:
    """Regular per-key grid at ``step_seconds`` resolution from each
    key's first to last observation, filling empty buckets by
    ``mode``: ``"locf"`` carries the most recent value forward;
    ``"linear"`` interpolates between the surrounding observations
    (buckets after the last observation still carry forward — there is
    nothing to interpolate toward).

    Within a bucket the surviving observation is deterministic: latest
    timestamp, then highest value, then highest ``tiebreak_col`` —
    exactly replicable by any SQL oracle; the interpolation arithmetic
    is a fixed expression tree over those deterministic inputs, so it
    is engine-exact too.

    Returns (key, bucket_start unix-seconds, value_filled, is_gap):
    ``is_gap=1`` marks grid points with no observation in the bucket
    (their value came from the fill).  The first bucket of every key
    is observed by construction, so ``value_filled`` is never null.
    """
    if mode not in ("locf", "linear"):
        raise ValueError(f"unknown resample mode: {mode!r}")
    step = int(step_seconds)
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast("long")
    ev = df.select(
        F.col(key_col).alias("key"),
        bucket.alias("bucket"),
        F.col(value_col).alias("v"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
    )
    w_in = Window.partitionBy("key", "bucket").orderBy(
        F.col("_ts").desc(), F.col("v").desc(), F.col("_tb").desc()
    )
    obs = (
        ev.withColumn("_rn", F.row_number().over(w_in))
        .filter(F.col("_rn") == 1)
        .select("key", "bucket", "v")
    )
    span = ev.groupBy("key").agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        "key",
        F.explode(F.sequence(F.col("_b0"), F.col("_b1"), F.lit(step))).alias(
            "bucket"
        ),
    )
    # The span table upstream of the explode is tiny (one row per key),
    # so AQE coalesces its exchange to one partition — and the explode,
    # the grid join, and the window pass then all run in a SINGLE task
    # (AQE's byte-based advisory can't see the row fan-out or the
    # window's per-row cost).  Re-spread the exploded grid by key with
    # an EXPLICIT partition count (explicit num opts out of AQE
    # coalescing); the window's hash requirement is satisfied by this
    # exchange, so nothing re-shuffles downstream.  Measured 3.0 → sub-
    # second on the linear-mode bench entry at sf0.1.
    nparts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    grid = grid.repartition(nparts, "key")
    w_prev = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(obs, ["key", "bucket"], "left")
    if mode == "locf":
        return joined.select(
            "key",
            "bucket",
            F.last("v", ignorenulls=True).over(w_prev).alias("value_filled"),
            F.col("v").isNull().cast("int").alias("is_gap"),
        )
    # "next observation" looks FORWARD — but a (currentRow,
    # unboundedFollowing) frame is evaluated by re-aggregating the
    # remaining partition for EVERY row (O(rows²) per key; measured
    # ~3× the whole query at sf0.1).  A DESC-ordered RUNNING frame
    # computes the same value incrementally in O(rows): one extra
    # sort pass, never quadratic.
    w_next = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    v_prev = F.last("v", ignorenulls=True).over(w_prev)
    b_prev = F.last(obs_bucket, ignorenulls=True).over(w_prev)
    v_next = F.last("v", ignorenulls=True).over(w_next)
    b_next = F.last(obs_bucket, ignorenulls=True).over(w_next)
    interp = v_prev + (v_next - v_prev) * (
        (F.col("bucket") - b_prev) / (b_next - b_prev)
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(v_next.isNull(), v_prev)  # tail buckets: carry forward
        .otherwise(interp)
    )
    return joined.select(
        "key",
        "bucket",
        filled.alias("value_filled"),
        F.col("v").isNull().cast("int").alias("is_gap"),
    )

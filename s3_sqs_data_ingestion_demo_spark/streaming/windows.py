"""Event-time streaming operators: watermarked windowed aggregation and
session windows.

The reference has NO event-time handling — its late-data behavior is an
unguarded MERGE (SURVEY §2.4 T4).  These operators supply the missing
streaming semantics the Spark-native way: watermarks bound state,
windows aggregate event time, and the same functions run identically
on batch DataFrames (used by the oracle-checked batch queries).

Scale notes: windowed aggregation state is pruned by the watermark;
session windows use Spark's built-in ``session_window`` (state merges
are handled by the streaming engine, not Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation.

    On a streaming DataFrame the watermark bounds state and admits
    late rows up to the bound; on a batch DataFrame the same code is
    a plain group-by (watermark is a no-op) — one definition, both
    engines, which is how operators stay testable against SQL oracles.
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("win"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    key_cols: tuple[str, ...] = ("user_id",),
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Session windows per key: events closer than ``gap`` merge into
    one session.  Uses Spark's native ``session_window`` — state
    merging happens in the streaming engine (no custom state store
    code), and the identical expression runs on batch frames."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sess"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            *key_cols,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )

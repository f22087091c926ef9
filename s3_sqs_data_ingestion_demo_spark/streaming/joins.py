"""Streaming joins and streaming dedup.

Completes the streaming operator surface: watermarked stream-stream
interval joins (state pruned by watermark on both sides) and
dedup-within-watermark (bounded-state streaming distinct — the
streaming complement of the batch dedup operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "30 minutes",
    within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right rows within ``(left_ts, left_ts +
    within]`` per key.  Both sides carry watermarks so the join state
    is pruned — without them, stream-stream join state grows forever.
    The interval bound is what makes outer/inner results emittable:
    Spark can declare a left row final once the watermark passes
    ``left_ts + within``.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark window are dropped; state for keys older than
    the watermark is evicted.  This is the production form of
    streaming dedup at 100 TB — unbounded ``dropDuplicates`` state is
    a slow OOM."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)

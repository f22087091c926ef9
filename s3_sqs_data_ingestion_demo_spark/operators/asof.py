"""As-of (point-in-time) and range joins — operators Spark lacks as
built-ins, composed from DataFrame primitives.

As-of join: for each left row, the single most recent right row with
``right.ts <= left.ts`` per key.  The naive formulation (non-equi join
+ per-row max) explodes to O(|L|·|R|) per key; the scalable
formulation used here is the **union trick**:

1. tag both inputs and union them — one relation ordered by (key, ts);
2. one window pass carries the latest right-row attributes forward
   (``last(..., ignorenulls)``) — exactly one shuffle on the key,
   state bounded by one row per partition position;
3. keep left rows, now annotated with their as-of match.

This is the same plan profile as the reference's dedup window (hash
partition → sort → window; reference: spark-job/mergeSQL.sql:14-21),
so it scales wherever that does.

Range join: bounded-interval non-equi join expressed so Catalyst can
use the equi-key for partitioning and apply the range predicate as a
post-join filter; with AQE, skewed keys split automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """Left as-of join: annotate each left row with its matching right
    row per key — the full ``merge_asof`` surface:

    - ``direction="backward"`` (default): most recent right row with
      ``right.ts <= left.ts``;
    - ``"forward"``: earliest right row with ``right.ts >= left.ts``;
    - ``"nearest"``: whichever of the two is closer in time (ties
      resolve backward).
    - ``tolerance``: maximum allowed distance — an INTERVAL string
      (timestamp columns, e.g. ``"2 hours"``) or a number (numeric
      columns); matches farther away are nulled out.

    ``right_cols`` — right attributes to carry (default: all non-key,
    non-ts columns).  Output columns: left.* + ``<col><suffix>`` for
    each carried column + ``<right_ts><suffix>``.
    Ties (equal timestamps) resolve to the right row (it sorts before
    the left row at the same instant).

    Plan shape: one shuffle on the key for every direction.  "nearest"
    adds a second window over the SAME partitioning with reversed
    ordering — Catalyst plans one extra in-partition sort, not a
    second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    keys = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    carried = [*right_cols, right_ts]

    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[c for c in left.columns if c not in keys]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carried],
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lhs.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    unioned = lhs.unionByName(rhs)
    # right rows (_is_left=0) sort before left rows at the same ts in
    # BOTH orderings, so a same-instant right row is always visible
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").desc(), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def fill(w) -> dict[str, F.Column]:
        return {
            c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in carried
        }

    if direction == "backward":
        fills = fill(wb)
    elif direction == "forward":
        fills = fill(wf)
    else:  # nearest
        b, f_ = fill(wb), fill(wf)
        b_ts, f_ts = b[right_ts], f_[right_ts]
        use_b = f_ts.isNull() | (
            b_ts.isNotNull() & ((F.col("_ts") - b_ts) <= (f_ts - F.col("_ts")))
        )
        fills = {c: F.when(use_b, b[c]).otherwise(f_[c]) for c in carried}

    if tolerance is not None:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        chosen_ts = fills[right_ts]
        valid = chosen_ts.isNotNull() & chosen_ts.between(
            F.col("_ts") - tol, F.col("_ts") + tol
        )
        fills = {c: F.when(valid, fills[c]) for c in carried}

    filled = unioned.select(
        *keys,
        "_ts",
        "_is_left",
        "_lrow",
        *[fills[c].alias(f"_f_{c}") for c in carried],
    ).filter(F.col("_is_left") == 1)
    left_payload = [c for c in left.columns if c not in keys]
    return filled.select(
        *keys,
        *[F.col(f"_lrow.{c}").alias(c) for c in left_payload],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in carried],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
) -> DataFrame:
    """Bounded-interval join: all right rows with
    ``left_ts + lower <= right_ts <= left_ts + upper`` per key.

    The equi-key carries the partitioning (one shuffle); the interval
    predicate filters after the hash join, so there is no cartesian
    blow-up beyond each key group.
    """
    keys = list(on)
    cond = (
        (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return left.alias("l").join(right.alias("r"), cond, "inner")

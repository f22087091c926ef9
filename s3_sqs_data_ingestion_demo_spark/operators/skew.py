"""Skew-mitigation operators.

AQE's skew-join splitting handles most cases automatically (enabled in
``session.DEFAULT_CONF``); these helpers cover the remaining one: a
single hot KEY in an aggregation, where one reducer gets the whole
key's traffic regardless of AQE.

``salted_agg`` implements two-phase salted aggregation for algebraic
aggregates: rows are spread across ``n_salts`` sub-keys (random salt),
partially aggregated, then re-aggregated on the true key.  The hot
key's work parallelizes across ``n_salts`` reducers; the second
shuffle moves only ``n_salts`` rows per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__sg_salt"

# (partial aggregate, final re-aggregate) pairs per supported agg
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation immune to hot keys.

    ``aggs``: output_name -> (fn, column) with fn in sum/count/min/max
    (algebraic aggregates that re-combine; avg = sum/count composed by
    the caller).

    Example::

        salted_agg(events, ["user_id"],
                   {"n": ("count", "*"), "total": ("sum", "value")})
    """
    for name, (fn, _) in aggs.items():
        if fn not in _MERGES:
            raise ValueError(f"{name}: {fn!r} is not an algebraic aggregate")
    salted = df.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            _MERGES[fn][0](col if col != "*" else F.lit(1)).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGES[fn][1](f"_p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def top_values_by_frequency(
    df: DataFrame, col: str, top_n: int = 20
) -> DataFrame:
    """Diagnostic: the hottest values of a key column and their share —
    what you run before deciding to salt."""
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("share", F.round(F.col("freq") / F.lit(total), 4))
        .orderBy(F.col("freq").desc(), F.col(col))
        .limit(top_n)
    )

"""Mergeable cardinality sketches (Apache DataSketches HLL, built in).

``COUNT(DISTINCT x)`` does not pre-aggregate: every rollup level
needs its own full pass, and a 100 TB daily/weekly/monthly hierarchy
re-reads the fact table per level.  HLL sketches fix the algebra —
one pass builds a fixed-size (2^lg_k registers) sketch per fine
group, and every coarser level is a cheap ``hll_union_agg`` over the
already-tiny sketch column.  Spark ships the DataSketches-compatible
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
functions (SQL/DataFrame, JVM-side); this module shapes them into the
rollup pattern.

Error is ~1.04/sqrt(2^lg_k) (≈1.6% at the default lg_k=12); sketches
below the dense threshold are exact (sparse mode), so small groups
report true counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch of ``col`` per ``keys`` group: the materialized
    fine-grained layer of a rollup hierarchy.  Output rows carry a
    fixed-size binary ``sketch`` column — at scale this is the table
    you persist, not the raw events."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    )


def rollup_estimate(
    sketches: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge the sketch column up to ``keys`` (possibly empty for a
    grand total) and estimate: sketch-sized shuffle, no re-scan of the
    fact data."""
    agg = F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
        "approx_distinct"
    )
    if keys:
        return sketches.groupBy(*keys).agg(agg)
    return sketches.agg(agg)

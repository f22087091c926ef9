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


# --------------------------------------------------------------------
# KMV (k-minimum-values) sketches — deterministic & mergeable
# --------------------------------------------------------------------
#
# The classic bottom-k sketch: keep the k smallest 60-bit hashes of
# the distinct values.  Everything about it is DETERMINISTIC given the
# hash function (the repo's portable md5-prefix construction), which
# HLL is not across engines — so KMV estimates, unions, and Jaccard
# overlaps are exactly oracle-checkable while staying mergeable
# (union = k smallest of the concatenation) and fixed-size.
# Estimator: with u_k = k-th minimum as a fraction of hash space,
# distinct ≈ (k-1)/u_k; sketches holding fewer than k values are
# EXACT (the whole distinct set hashed below capacity).

_KMV_BITS = 60
_KMV_SPACE = float(1 << _KMV_BITS)


def _h60(col) -> F.Column:
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketches(
    df: DataFrame, keys: list[str], col: str, k: int = 64
) -> DataFrame:
    """One bottom-k sketch of ``col`` per ``keys`` group: an ascending
    array of the k smallest distinct hashes.  One distinct aggregate +
    one per-group top-k (window rank) — shuffle rows are (group, hash)
    scalars; the output is ≤ k longs per group."""
    from pyspark.sql import Window  # noqa: PLC0415

    hashed = df.select(*keys, _h60(col).alias("_h")).distinct()
    w = Window.partitionBy(*keys).orderBy(F.col("_h").asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )


def kmv_estimate(sketch_col, k: int = 64) -> F.Column:
    """Distinct-count estimate from a sketch array: exact when the
    sketch is under capacity, (k-1)/u_k otherwise."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    u_k = F.element_at(c, k) / F.lit(_KMV_SPACE)
    return F.when(F.size(c) < k, F.size(c).cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )


def kmv_merge(a, b, k: int = 64) -> F.Column:
    """Union of two sketches = k smallest of the merged distinct
    hashes — the mergeability that lets rollup hierarchies combine
    sketches without re-reading facts."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_distinct(F.concat(ca, cb))), 1, k)


# --------------------------------------------------------------------
# Exact heavy hitters via two-phase Misra-Gries
# --------------------------------------------------------------------
#
# Full groupBy on an ultra-high-cardinality skewed key shuffles every
# distinct value to find the few heavy ones.  The classic bounded-
# memory alternative: per-partition Misra-Gries summaries (capacity-
# bounded counter maps, Arrow-batched) emit a candidate SUPERSET —
# guaranteed to contain every value with global frequency > n/capacity
# (if a value is that frequent globally, it exceeds the per-partition
# threshold in at least one partition) — then ONE exact recount of the
# candidates only.  The result is EXACT (and partition-independent)
# whenever the true k-th frequency clears n/capacity; the flag reports
# that guarantee instead of silently degrading.


def heavy_hitters(
    df, col: str, k: int = 10, capacity: int = 4096
) -> DataFrame:
    """Top-k most frequent values of ``col`` with exact counts:
    (value, cnt, exact_guaranteed).  Shuffle carries only candidate
    values (≤ capacity per partition), never the full key space."""
    import pandas as pd  # noqa: PLC0415

    src = df.select(F.col(col).cast("string").alias("value"))

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["value"].value_counts().items():
                if v in counters:
                    counters[v] += int(c)
                else:
                    counters[v] = int(c)
                    if len(counters) > capacity:
                        m = min(counters.values())
                        counters = {
                            kk: cc - m for kk, cc in counters.items() if cc > m
                        }
        yield pd.DataFrame({"value": list(counters.keys())})

    cand = src.mapInPandas(mg, "value string").distinct()
    counts = (
        src.join(cand, "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    topk = counts.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    n_total = src.agg(F.count(F.lit(1)).alias("_n"))
    kth = topk.agg(F.min("cnt").alias("_kth"))
    return (
        topk.crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(kth))
        .select(
            "value",
            "cnt",
            (F.col("_kth") > F.col("_n") / F.lit(capacity))
            .cast("int")
            .alias("exact_guaranteed"),
        )
    )

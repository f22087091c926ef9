"""Approximate string matching: edit-distance self-join at scale.

The entity-resolution primitive ("these two keys are the same record
up to a typo") that batch CDC pipelines need when source keys drift.
A naive distance join is O(n²) string comparisons; this operator uses
FastSS deletion-neighborhood blocking: for edit distance ≤ 1, two
strings match only if they share an element of
``{s} ∪ {s with one character deleted}`` — substitutions meet at the
same-position deletion, insertions/deletions meet at the shorter
string itself.  Candidates that share a block are then verified with
the exact JVM ``levenshtein``.

Scale shape (100 TB): each string emits ``len+1`` blocking keys (a
projection + generator, zero shuffle); the candidate join shuffles
(key, string) pairs only; hot blocks are capped like every bucketed
candidate generator in this repo (a block whose membership exceeds
``max_bucket`` is dropped loudly-by-contract rather than detonating
an executor — the cap is a recall/throughput dial, exactly the
MinHash ``max_band_freq`` pattern, operators/dedup.py:519-550);
verification is an integer column compare, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del1_keys(col: str) -> F.Column:
    """``{s} ∪ del1(s)`` as a distinct array — SQL ``substr`` composes
    per-index inside ``transform`` (1-based, expression positions)."""
    return F.array_distinct(
        F.concat(
            F.array(F.col(col)),
            F.expr(
                f"transform(sequence(1, length({col})), "
                f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1)))"
            ),
        )
    )


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    *,
    max_dist: int = 1,
    max_bucket: int = 1000,
) -> DataFrame:
    """All distinct value pairs of ``df[col]`` with edit distance
    ≤ ``max_dist`` (only 1 is supported — deeper distances need
    k-deletion neighborhoods), as (name_a < name_b, dist).
    """
    if max_dist != 1:
        raise ValueError(f"deletion-neighborhood blocking built for max_dist=1, got {max_dist}")
    vals = df.select(F.col(col).alias("s")).distinct()
    keyed = vals.select("s", F.explode(_del1_keys("s")).alias("k"))
    # Pair generation INSIDE grouped blocks (one shuffle of the keyed
    # stream, no self-join, no separate bucket-count pass — the size
    # filter and the pair explode read the same collected bucket); a
    # hot block beyond ``max_bucket`` is dropped by the same filter.
    # Verification runs BEFORE the dedup so the final distinct carries
    # only true pairs (≈ output-sized), not the full candidate
    # multiset.
    buckets = (
        keyed.groupBy("k")
        .agg(F.collect_list("s").alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    return (
        buckets.select(F.explode("members").alias("sa"), "members")
        .select("sa", F.explode("members").alias("sb"))
        .filter(F.col("sa") < F.col("sb"))
        .select(
            F.col("sa").alias("name_a"),
            F.col("sb").alias("name_b"),
            F.levenshtein(F.col("sa"), F.col("sb")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )

"""Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter).

At 100 TB the classic fact/dim shape — a huge shuffle join whose
build side is selective — wastes most of its fact-side shuffle on rows
the join will drop.  Spark (3.3+) can inject a bloom filter built from
the creation (dim) side as a *runtime* predicate on the application
(fact) side: the fact scan then drops non-joining rows before the
exchange, shrinking the shuffle by the join's selectivity.  This is
the row-level complement of dynamic partition pruning.

Injection is threshold-gated so small scans skip the overhead:

- ``...bloomFilter.enabled`` (default true): master switch;
- ``...bloomFilter.creationSideThreshold`` (default 10 MB): the build
  side's estimated size must fit under this (a bloom over an enormous
  side filters nothing);
- ``...runtimeFilter.number.threshold``: max filters per query;
- the application side must exceed
  ``spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold``
  (default 10 GB) — local test data never qualifies, a production
  fact table always does.  ``demo_thresholds`` drops this floor so
  plan tests can assert the injection on small data.

Nothing here changes query semantics: the bloom filter is a
may-contain pre-filter; the join itself still decides membership.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_APP_SIDE = (
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
)
_CREATION_SIDE = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"


def enable_runtime_bloom_filters(
    spark: SparkSession,
    creation_side_threshold: str = "10MB",
    application_side_min: str = "10GB",
) -> None:
    """(Re-)enable bloom-filter injection with explicit thresholds.

    All three confs are runtime-settable, so this works on a vanilla
    session (same contract as every query function here).
    """
    spark.conf.set(_ENABLED, "true")
    spark.conf.set(_CREATION_SIDE, creation_side_threshold)
    spark.conf.set(_APP_SIDE, application_side_min)


def demo_thresholds(spark: SparkSession) -> None:
    """Thresholds that let injection fire on local test-sized data:
    zero application-side floor, generous creation side.  For tests
    and demos — production keeps the defaults, where the 10 GB floor
    means only genuinely large scans pay the bloom build."""
    enable_runtime_bloom_filters(
        spark, creation_side_threshold="64MB", application_side_min="0"
    )


def reset_defaults(spark: SparkSession) -> None:
    """Restore the session-default thresholds."""
    for k in (_ENABLED, _CREATION_SIDE, _APP_SIDE):
        spark.conf.unset(k)

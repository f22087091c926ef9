"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions, checked against DuckDB at
sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing these modules fills the registry in queries.py
from s3_sqs_data_ingestion_demo_spark import extended_queries  # noqa: F401
from s3_sqs_data_ingestion_demo_spark import pipeline_queries  # noqa: F401
from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary at sf0.001."""
    return REGISTRY["q01_pricing_summary"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }

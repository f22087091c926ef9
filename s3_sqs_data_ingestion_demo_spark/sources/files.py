"""Batch file sources with multi-format dispatch.

The reference reads a per-poll list of files as one DataFrame but only
handles CSV — any other configured format silently skips the batch
while still deleting the queue messages, i.e. silent data loss
(reference: spark-job/read.py:272-278).  This engine supports
csv / json / parquet / orc / avro-container / text and **fails
loudly** on anything else (documented semantic fix, SURVEY §2 S4).

Lineage columns (the reference imported ``input_file_name`` /
``current_timestamp`` but never used them — spark-job/read.py:11):
``with_lineage`` wires them up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED_FORMATS = ("csv", "json", "parquet", "orc", "avro", "text", "xml")


def read_batch(
    spark: SparkSession,
    files: Sequence[str] | str,
    fmt: str = "csv",
    options: dict[str, str] | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a batch of files (a micro-batch's worth) as one DataFrame.

    CSV parity with the reference (reference: spark-job/read.py:84-86):
    options such as ``sep``/``header``/``inferSchema`` pass straight
    through.  Passing an explicit ``schema`` skips the inference pass —
    the reference paid one extra full read per batch for inference
    (spark-job/job.json:24); at scale, always pass the contract schema.
    """
    fmt = (fmt or "csv").lower()
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(
            f"unsupported input format {fmt!r}; supported: {SUPPORTED_FORMATS}"
        )
    paths = [files] if isinstance(files, str) else list(files)
    if not paths:
        raise ValueError("read_batch requires at least one file")
    reader = spark.read.options(**(options or {}))
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "avro":
        try:
            return reader.format("avro").load(paths)
        except Exception as exc:  # AnalysisException: avro source not loaded
            raise RuntimeError(
                "the avro container format needs the spark-avro package on "
                "the session (--packages org.apache.spark:spark-avro_2.13); "
                "it is not bundled in this environment"
            ) from exc
    if fmt == "xml":
        # native since Spark 4.0; rowTag is mandatory — default it to
        # "row" so schemaless smoke reads work, overridable via options
        if "rowTag" not in (options or {}):
            reader = reader.option("rowTag", "row")
        return reader.format("xml").load(paths)
    return getattr(reader, fmt)(paths)


def with_lineage(df: DataFrame) -> DataFrame:
    """Attach ingest lineage columns (wires the reference's dormant
    imports, spark-job/read.py:11)."""
    return df.withColumn("_ingest_file", F.input_file_name()).withColumn(
        "_ingest_ts", F.current_timestamp()
    )

"""Batch file sources with multi-format dispatch.

The reference reads a per-poll list of files as one DataFrame but only
handles CSV — any other configured format silently skips the batch
while still deleting the queue messages, i.e. silent data loss
(reference: spark-job/read.py:272-278).  This engine supports
csv / json / parquet / orc / avro-container / text / xml and **fails
loudly** on anything else (documented semantic fix, SURVEY §2 S4).
It also fails loudly when a permissive parse (csv/json/xml) yields a
schema that is *only* the corrupt-record column — the "file isn't the
format you configured" case that would otherwise surface as an
unrelated unresolved-column error three operators downstream.

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
        # (Spark reader option keys are case-insensitive, so probe the
        # user's options the same way before injecting the default)
        opt_keys = {k.lower() for k in (options or {})}
        if "rowtag" not in opt_keys:
            reader = reader.option("rowTag", "row")
        return _reject_corrupt_only(reader.format("xml").load(paths), fmt, paths)
    if fmt == "parquet":
        # the one reader with a varargs signature (csv/json/orc/text
        # accept a list) — passing the list unexpanded lands it in the
        # reader's option map and throws an opaque JVM
        # ClassCastException at analysis time
        df = reader.parquet(*paths)
    else:
        df = getattr(reader, fmt)(paths)
    if fmt in ("csv", "json") and schema is None:
        df = _reject_corrupt_only(df, fmt, paths)
    return df


def _reject_corrupt_only(df: DataFrame, fmt: str, paths: Sequence[str]) -> DataFrame:
    """Fail loudly when a permissive parse produced ONLY the
    corrupt-record column — i.e. not one row of the batch matched the
    configured format.  Checking the inferred schema costs no extra
    Spark job and catches the misconfigured-format case up front
    instead of as an unrelated UNRESOLVED_COLUMN error downstream."""
    corrupt_col = df.sparkSession.conf.get(
        "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
    )
    if df.columns == [corrupt_col]:
        raise ValueError(
            f"batch parsed as {fmt!r} but produced only the corrupt-record "
            f"column {corrupt_col!r} — no row in {list(paths)[:3]}... matches "
            f"the configured format; check input_config.format"
        )
    return df


def with_lineage(df: DataFrame) -> DataFrame:
    """Attach ingest lineage columns (wires the reference's dormant
    imports, spark-job/read.py:11)."""
    return df.withColumn("_ingest_file", F.input_file_name()).withColumn(
        "_ingest_ts", F.current_timestamp()
    )

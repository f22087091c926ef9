"""A PySpark-native analytics/ingestion engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``soumilshah1995/s3-sqs-data-ingestion-demo`` (an S3→SQS→Spark→Iceberg
CDC ingestion job) as an idiomatic Spark engine:

- declarative job config (same JSON surface as the reference's ``job.json``)
- Avro-contract schemas (superset of the reference's converter,
  reference: spark-job/read.py:110-146)
- multi-format batch sources with fail-loud dispatch
  (reference: spark-job/read.py:272-278 silently skipped unknown formats)
- a parquet-backed snapshot table (``ManagedTable``) with append /
  overwrite / merge-upsert modes and partition-aware copy-on-write,
  standing in for the reference's Iceberg target
  (reference: spark-job/read.py:195-246)
- windowed dedup-by-recency merge semantics
  (reference: spark-job/mergeSQL.sql:14-21)
- Structured Streaming ingestion replacing the hand-rolled SQS poll loop
  (reference: spark-job/read.py:330-350)
- large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale.
"""

__version__ = "0.1.0"

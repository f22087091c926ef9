"""Streaming maintenance of the persisted retrieval indexes.

Both index families are built for continuous ingest — the BM25
inverted index (operators/search_index.py) absorbs batches as keyed
postings merges with tag-guarded additive stats, and the IVF ANN
index (operators/ann_index.py) assigns new vectors to fixed centroids
as keyed merges.  This module is the foreachBatch wiring: a
file-landing stream feeds either index, with the micro-batch id as
the idempotency tag so an at-least-once redelivery (crash between
index write and checkpoint commit) never double-counts stats or
duplicates rows.

Delivery analysis per index:
- search index: the postings merge is an idempotent upsert keyed on
  (term, doc_id); the stats append is tagged with the batch id and
  skipped when already committed — both tables end exactly-once.
- IVF index: the assignments merge is keyed on vec_id — a replayed
  batch upserts identical rows; no additive state exists, so no tag
  is needed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def _start(spark, landing_dir, schema, fmt, options, checkpoint_dir,
           available_now, poll_interval, sink) -> StreamingQuery:
    reader = spark.readStream.schema(schema).options(**(options or {}))
    stream = reader.format(fmt).load(landing_dir)
    writer = stream.writeStream.foreachBatch(sink).outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()


def start_streaming_search_index(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    index_path: str,
    checkpoint_dir: str,
    fmt: str = "json",
    options: dict[str, str] | None = None,
    available_now: bool = False,
    poll_interval: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Document stream → incremental BM25 index.  Exactly-once for
    both postings (keyed upsert) and additive stats (batch-id tag)."""
    from ..operators.search_index import append_to_search_index  # noqa: PLC0415

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_search_index(
            spark, index_path, batch_df,
            text_col=text_col, id_col=id_col,
            batch_tag=f"bm25-b{batch_id:020d}",
        )

    return _start(spark, landing_dir, schema, fmt, options, checkpoint_dir,
                  available_now, poll_interval, sink)


def start_streaming_ivf_index(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    index_path: str,
    checkpoint_dir: str,
    fmt: str = "json",
    options: dict[str, str] | None = None,
    available_now: bool = False,
    poll_interval: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Embedding stream → persisted IVF index (no-refit appends).
    The index must exist (``build_ivf_index`` bootstraps the
    centroids); replays are idempotent keyed upserts on vec_id."""
    from ..operators.ann_index import append_to_ivf_index  # noqa: PLC0415

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_ivf_index(
            spark, index_path, batch_df, id_col=id_col, vec_col=vec_col
        )

    return _start(spark, landing_dir, schema, fmt, options, checkpoint_dir,
                  available_now, poll_interval, sink)

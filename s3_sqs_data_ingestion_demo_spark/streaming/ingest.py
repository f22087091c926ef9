"""Structured Streaming ingestion — the idiomatic replacement for the
reference's hand-rolled poll loop.

reference: spark-job/read.py:330-350 (``while True`` → poll → read →
write → delete messages → sleep) becomes::

    spark.readStream.schema(s).options(**csv_opts).csv(landing_dir)
         .writeStream.foreachBatch(upsert)
         .trigger(processingTime=f"{poll_interval} seconds")
         .option("checkpointLocation", ckpt).start()

Delivery guarantee upgrades from the reference's at-least-once +
idempotent-merge (SURVEY §2.4 T2/T3) to checkpointed exactly-once file
tracking: the checkpoint WAL replaces SQS receipt handles, making the
reference's T5 commit-buffer data-loss bug structurally impossible.

Scale notes: ``maxFilesPerTrigger`` bounds micro-batch size (the
reference's ``batch_size=10`` messages, spark-job/read.py:30);
``foreachBatch`` + ``ManagedTable.merge`` gives partition-pruned COW
upserts per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..plans import apply_transform_query
from ..table import ManagedTable


def start_file_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    table: ManagedTable,
    fmt: str = "csv",
    options: dict[str, str] | None = None,
    mode: str = "merge",
    transform_query: str | None = None,
    checkpoint_dir: str | None = None,
    poll_interval: int | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Start a file-landing ingest stream writing into ``table``.

    Streaming file sources require an explicit schema — pass the Avro
    contract's StructType (deliberate upgrade over the reference's
    per-batch ``inferSchema``, SURVEY §1.3).
    ``available_now=True`` drains the backlog then stops (for tests
    and batch-style backfills).
    """
    opts = dict(options or {})
    if max_files_per_trigger:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    reader = spark.readStream.schema(schema).options(**opts)
    stream = reader.format(fmt).load(landing_dir)

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        df = apply_transform_query(batch_df.sparkSession, batch_df, transform_query)
        table.write(df, mode)

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()


def start_streaming_rollup(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    src_table: ManagedTable,
    rollup_table: ManagedTable,
    group_cols: list[str],
    sum_cols: list[str],
    fmt: str = "json",
    options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    poll_interval: int | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
    phase_times: dict | None = None,
) -> StreamingQuery:
    """Continuous aggregate: file-landing stream → append to the
    source ``ManagedTable`` → fold the appended delta into the rollup
    (operators/rollup.py) — per micro-batch, so the summary table
    trails the stream by one trigger at O(batch) maintenance cost.

    ``phase_times`` (optional, for benchmarking): per-trigger wall
    times are appended to ``append_per_trigger`` /
    ``refresh_per_trigger`` lists in the dict — a regression in the
    per-trigger constants is then visible from the bench artifact.

    Restart safety: the source append is stamped with the micro-batch
    id (``has_commit_tag`` probe), so a batch replayed after a crash
    between append and checkpoint skips the duplicate append and just
    re-runs the fold; the fold itself is idempotent via the rollup's
    persisted consume-watermark.  A retried batch therefore never
    double-counts on either table."""
    from ..operators.rollup import refresh_rollup  # noqa: PLC0415

    reader = spark.readStream.schema(schema).options(**(options or {}))
    stream = reader.format(fmt).load(landing_dir)

    # Only the FIRST batch of a run can be a replay (the checkpoint
    # never re-delivers a completed batch within a run; an in-run
    # failure stops the query).  So the O(history) tag scan runs once
    # per restart, and steady-state batches append at O(1).
    probe_done = {"done": False}

    def sink(batch_df, batch_id: int) -> None:
        import time as _time  # noqa: PLC0415

        if batch_df.isEmpty():
            return
        tag = f"rollup-src-b{batch_id:020d}"
        replayed = False
        if not probe_done["done"]:
            replayed = src_table.has_commit_tag(tag)
            probe_done["done"] = True
        # phase clock starts AFTER the once-per-run replay probe, and a
        # replayed (skipped) append contributes no sample — the lists
        # must pin the steady-state per-trigger constants, not probe or
        # replay noise
        t0 = _time.perf_counter()
        if not replayed:
            src_table.append(batch_df, tag=tag)
        t1 = _time.perf_counter()
        refresh_rollup(
            src_table,
            rollup_table,
            group_cols,
            sum_cols,
            min_cols=min_cols,
            max_cols=max_cols,
            distinct_cols=distinct_cols,
            sumsq_cols=sumsq_cols,
            hist_cols=hist_cols,
        )
        if phase_times is not None:
            t2 = _time.perf_counter()
            if not replayed:
                phase_times.setdefault("append_per_trigger", []).append(
                    round(t1 - t0, 3)
                )
            phase_times.setdefault("refresh_per_trigger", []).append(
                round(t2 - t1, 3)
            )

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()


def start_streaming_join_mv(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    src_table: ManagedTable,
    right_table: ManagedTable,
    mv_table: ManagedTable,
    on: tuple[str, str],
    fmt: str = "json",
    options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    poll_interval: int | None = None,
) -> StreamingQuery:
    """Continuous join materialization: file-landing stream -> append
    to the left ``ManagedTable`` -> affected-key re-join into the MV
    (operators/join_mv.py) — the streaming twin of
    ``start_streaming_rollup``.  Right-side changes another writer
    lands between triggers fold in on the next batch (the refresh
    consumes BOTH tables' change feeds).

    Restart safety mirrors the rollup stream: the left append is
    stamped with the micro-batch id, so a replayed batch skips the
    duplicate append; the MV refresh is idempotent by construction
    (affected-key recompute from current state — operators/join_mv.py)
    plus its own persisted consume cursors."""
    from ..operators.join_mv import refresh_join_mv  # noqa: PLC0415

    reader = spark.readStream.schema(schema).options(**(options or {}))
    stream = reader.format(fmt).load(landing_dir)
    probe_done = {"done": False}

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"joinmv-src-b{batch_id:020d}"
        replayed = False
        if not probe_done["done"]:
            replayed = src_table.has_commit_tag(tag)
            probe_done["done"] = True
        if not replayed:
            src_table.append(batch_df, tag=tag)
        refresh_join_mv(src_table, right_table, mv_table, on=on)

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()


def start_streaming_topk(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    src_table: ManagedTable,
    topk_table: ManagedTable,
    group_cols: list[str],
    order_col: str,
    k: int,
    id_cols: list[str],
    payload_cols: list[str] | None = None,
    descending: bool = True,
    fmt: str = "json",
    options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    poll_interval: int | None = None,
) -> StreamingQuery:
    """Continuous top-k: file-landing stream -> append to the source
    ``ManagedTable`` -> fold the appended rows into the top-k table
    (operators/topk_mv.py) — the streaming twin of
    ``start_streaming_rollup``.  Streamed batches are inserts, so
    every trigger takes the fold path (new rows compete with each
    group's current top-k; the base table is never read).

    Restart safety mirrors the rollup stream: the source append is
    stamped with the micro-batch id (once-per-run replay probe), and
    the top-k refresh is exactly-once via its window tag + persisted
    consume cursor."""
    from ..operators.topk_mv import refresh_topk_mv  # noqa: PLC0415

    reader = spark.readStream.schema(schema).options(**(options or {}))
    stream = reader.format(fmt).load(landing_dir)
    probe_done = {"done": False}

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"topk-src-b{batch_id:020d}"
        replayed = False
        if not probe_done["done"]:
            replayed = src_table.has_commit_tag(tag)
            probe_done["done"] = True
        if not replayed:
            src_table.append(batch_df, tag=tag)
        refresh_topk_mv(
            src_table,
            topk_table,
            group_cols,
            order_col,
            k,
            id_cols,
            payload_cols=payload_cols,
            descending=descending,
        )

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()


def start_streaming_replica_sync(
    spark: SparkSession,
    export_dir: str,
    target: ManagedTable,
    poll_interval: int | None = None,
    consumer_id: str | None = None,
    allow_partial_bootstrap: bool = False,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuous replication consumer: a trigger loop around
    ``sync_from_export`` (operators/cdc_export.py) keeping ``target``
    an exact mirror of the export's source — the streaming twin of
    ``job.run_replica_sync``, completing the consumer-side surface the
    same way ``start_streaming_cdc_export`` completes the producer's.

    The stream source is a 1-row-per-second ``rate`` clock: the export
    directory is not a Spark streaming source (windows are immutable
    renamed DIRECTORIES, not appended files), and the sync step needs
    no batch data — only a trigger.  ALL delivery state lives in the
    replica's own durable ``cdc-apply.cursor`` property, so the
    checkpoint (optional, clock offsets only) is irrelevant to
    exactly-once: kill the query anywhere and a restart re-tails from
    the cursor — re-delivered windows below it are filtered before the
    rank, an interrupted apply replays idempotently, and the cursor
    only advances after the merge commits (apply_changes's crash
    contract).  ``consumer_id`` registers progress for fan-out-safe
    producer retention, same as the batch loop.

    A quiet trigger costs one directory listing (the tail subsets
    window directories by name before Spark lists a file) plus a
    cursor no-op — cheap enough for a 1 s clock; set ``poll_interval``
    to the producer's batch cadence in production."""
    from ..operators.cdc_export import (  # noqa: PLC0415
        sync_from_export,
        validate_sync_preconditions,
    )

    # fail fast on a doomed consumer (pruned/mid-history bootstrap, or
    # a mispaired latest_wins replica) BEFORE the stream starts:
    # inside foreachBatch the refusal would kill the query on its
    # first trigger with a buried exception.  Same checks the sync
    # step itself re-runs per cycle — one shared implementation.
    validate_sync_preconditions(export_dir, target, allow_partial_bootstrap)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def sink(batch_df, batch_id: int) -> None:
        # the batch frame is just the clock tick — never read
        sync_from_export(
            spark,
            export_dir,
            target,
            consumer_id=consumer_id,
            allow_partial_bootstrap=allow_partial_bootstrap,
        )

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()


def start_streaming_cdc_export(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    src_table: ManagedTable,
    export_dir: str,
    mode: str = "merge",
    fmt: str = "json",
    options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    poll_interval: int | None = None,
    keep_last_windows: int = 0,
    coalesce_after: int = 0,
) -> StreamingQuery:
    """Continuous outbound CDC: file-landing stream → write into the
    source ``ManagedTable`` (``mode``: merge upserts on its keys,
    append for insert-only feeds) → publish the resulting change
    window to ``export_dir`` (operators/cdc_export.py) — the streaming
    twin of the declarative ``output_config.cdc_exports`` hook, so a
    downstream consumer's tail trails the stream by one trigger.

    Restart safety mirrors the rollup stream: the source write is
    stamped with the micro-batch id (once-per-run replay probe), and
    the exporter is replay-safe by its own contract — a re-exported
    window whose directory already exists skips, so a crash anywhere
    between the write and the checkpoint never double-publishes.
    ``keep_last_windows`` / ``coalesce_after`` apply the same
    listing-derived retention/binpack cadences as the declarative
    hook, once per trigger."""
    from ..operators.cdc_export import (  # noqa: PLC0415
        create_change_export,
        export_changes,
        export_exists,
        maintain_export_cadences,
        validate_export_cadences,
    )

    # a degenerate cadence pairing must refuse BEFORE the stream starts,
    # not on the first trigger (same fail-fast rationale as the mode
    # check below)
    validate_export_cadences(keep_last_windows, coalesce_after)
    if mode not in ("merge", "append"):
        # a typo'd mode silently appending a CDC upsert feed would
        # duplicate live rows AND misclassify the export's windows as
        # pure inserts — refuse before the stream starts
        raise ValueError(
            f"start_streaming_cdc_export mode must be 'merge' or "
            f"'append', got {mode!r}"
        )
    if not export_exists(export_dir):
        create_change_export(src_table, export_dir, consume_from=1)
    reader = spark.readStream.schema(schema).options(**(options or {}))
    stream = reader.format(fmt).load(landing_dir)
    probe_done = {"done": False}

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"cdcex-src-b{batch_id:020d}"
        replayed = False
        if not probe_done["done"]:
            replayed = src_table.has_commit_tag(tag)
            probe_done["done"] = True
        if not replayed:
            if mode == "merge":
                src_table.merge(batch_df, tag=tag)
            else:
                src_table.append(batch_df, tag=tag)
        export_changes(src_table, export_dir)
        maintain_export_cadences(
            spark, export_dir,
            keep_last_windows=keep_last_windows,
            coalesce_after=coalesce_after,
        )

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()

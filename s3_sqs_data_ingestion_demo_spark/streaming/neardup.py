"""Streaming near-duplicate detection: MinHash against a growing index.

The batch near-dup operators (operators/dedup.py) answer "which pairs
in THIS corpus are near-dups"; a streaming ingest pipeline needs
"which incoming documents duplicate ANYTHING seen so far".  The
Spark-native shape for that is not per-key operator state (signatures
don't shard by a join key a priori) but a **stream-static pattern**:
each micro-batch computes its shingle/signature base, equi-joins its
LSH band keys against the accumulated signature index table, verifies
candidates exactly, then appends its own signatures to the index —
the index is a plain parquet table, so it is shared, restartable, and
compactable like any other.

Incremental cost shape: per batch, banding touches |batch| × bands
keys; the index side of the join is pruned to colliding band keys
(hash equi-join, no scan-all-pairs); verification is exploded-count
over candidates only.  Band-key frequency capping bounds degenerate
hot buckets exactly like the batch operator.

Delivery: foreachBatch + checkpoint gives at-least-once PAIR appends
on failure/retry — pair emission is deduplicated by construction only
within a batch, so downstream consumers of ``pairs_path`` should read
with ``dropDuplicates(["doc_id_a", "doc_id_b"])`` (documented, same
contract as the reference's idempotent upserts, SURVEY §2.4 T3).
The INDEX append, by contrast, is exactly-once: each micro-batch
writes its signatures under a deterministic ``b<batch_id>`` subdir
with overwrite semantics, so a foreachBatch retry replaces its own
prior (possibly partial) output instead of double-appending —
duplicate index rows would double a doc's exploded shingles in every
future batch and permanently inflate jaccard.  As a second layer, ids
present in the current batch are excluded from the index read, so a
retry after a successful append (or a re-sent document) can never
join a doc against its own stale signatures.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    _minhash_sig_col,
    _shingle_base,
    _shingle_hash_col,
    band_keys,
)

_NUM_HASHES = 16
_BANDS = 4


def _index_schema(num_hashes: int) -> T.StructType:
    fields = [
        T.StructField("id", T.LongType()),
        T.StructField("shs", T.ArrayType(T.StringType())),
        T.StructField("n_sh", T.IntegerType()),
    ]
    fields += [T.StructField(f"h{s}", T.LongType()) for s in range(num_hashes)]
    return T.StructType(fields)


def _read_index(spark: SparkSession, path: str, num_hashes: int) -> DataFrame:
    # schema-explicit read so a not-yet-created index resolves to empty;
    # recursive so per-batch `b<id>` subdirs (and legacy top-level files)
    # are both picked up without partition-column inference
    return (
        spark.read.schema(_index_schema(num_hashes))
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def _batch_signatures(
    batch: DataFrame, text_col: str, id_col: str, n: int, num_hashes: int
) -> DataFrame:
    """The batch's index rows: (id, shs, n_sh, h0..hN), materialized
    once (localCheckpoint frees the plan from the source stream so the
    later index mutation can't rescan it)."""
    new = (
        _shingle_base(batch, text_col, id_col, n)
        .withColumn("xs", _shingle_hash_col("shs"))
        .select(
            "id", "shs", F.col("n_sh").cast("int").alias("n_sh"),
            *[_minhash_sig_col(s) for s in range(num_hashes)],
        )
    )
    return new.localCheckpoint(eager=True)


def process_near_dup_batch(
    batch: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = _NUM_HASHES,
    bands: int = _BANDS,
    threshold: float = 0.5,
    max_band_freq: int = 10_000,
    batch_id: int | None = None,
) -> DataFrame:
    """One micro-batch step: emit (doc_id_a, doc_id_b, jaccard) pairs
    where doc_id_b is IN THIS BATCH and doc_id_a is any earlier doc
    (or an earlier row of the same batch), then append the batch's
    signatures to the index.  Returns the verified pairs DataFrame
    (already materialized — the index append is a side effect that
    must happen after pair computation reads the PREVIOUS index).

    ``batch_id`` (set by the streaming sink) keys the index append to a
    deterministic subdir so a retried batch overwrites its own prior
    output instead of appending a second copy; ad-hoc batch callers may
    omit it and get a plain top-level append."""
    spark = batch.sparkSession
    os.makedirs(index_path, exist_ok=True)
    new = _batch_signatures(batch, text_col, id_col, n, num_hashes)
    old = _read_index(spark, index_path, num_hashes)
    pairs = _near_dup_pairs(new, old, num_hashes, bands, threshold, max_band_freq)
    if batch_id is None:
        new.write.mode("append").parquet(index_path)
    else:
        # exactly-once index write: deterministic per-batch subdir,
        # overwrite replaces any partial/duplicate output from a retry
        new.write.mode("overwrite").parquet(
            os.path.join(index_path, f"b{batch_id:020d}")
        )
    return pairs


def process_near_dup_batch_table(
    batch: DataFrame,
    table,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = _NUM_HASHES,
    bands: int = _BANDS,
    threshold: float = 0.5,
    max_band_freq: int = 10_000,
) -> DataFrame:
    """Table-backed variant: the signature index is a keyed MOR
    ``ManagedTable`` instead of a raw parquet directory — the
    "signature index a 100 TB deployment keeps as a table", with
    snapshot atomicity, time travel, change feeds, and foldable
    deltas.  Idempotency needs no batch_id here: the index append is
    ``table.merge`` keyed on id, so a retried batch's rows resolve to
    one row per doc at read time (O(batch) delta append per merge;
    ``compact()`` folds the deltas — see start_streaming_near_dup's
    ``compact_every``)."""
    new = _batch_signatures(batch, text_col, id_col, n, num_hashes)
    pairs = _near_dup_pairs(
        new, table.read(), num_hashes, bands, threshold, max_band_freq
    )
    table.merge(new)
    return pairs


def _near_dup_pairs(
    new: DataFrame,
    old: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_band_freq: int,
) -> DataFrame:
    """Core stream-static step: band ``new`` against ``old`` ∪ ``new``,
    cap hot band keys over the full population, verify candidates with
    exact exploded-count jaccard.  Returns pairs, materialized BEFORE
    the caller mutates the index."""
    # An id already in the index that reappears in this batch (retry
    # after a successful append, or a re-sent document) must not be
    # joined against its own stale signatures — the batch's row is
    # authoritative.
    old = old.join(new.select("id"), "id", "left_anti")

    sig_names = [f"h{s}" for s in range(num_hashes)]
    bk_new = band_keys(new.filter(F.col("n_sh") > 0).select("id", *sig_names),
                       num_hashes, bands)
    bk_old = band_keys(old.filter(F.col("n_sh") > 0).select("id", *sig_names),
                       num_hashes, bands)
    bk_all = bk_old.unionByName(bk_new)
    # hot-bucket cap over the FULL key population (old ∪ new), so a
    # degenerate key that grew hot over the stream's lifetime stops
    # generating O(bucket²) work
    hot = (
        bk_all.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > max_band_freq)
        .select("band", "key")
    )
    bk_all_ok = bk_all.join(hot, ["band", "key"], "left_anti")
    bk_new_ok = bk_new.join(hot, ["band", "key"], "left_anti")
    cand = (
        bk_new_ok.select("band", "key", F.col("id").alias("id_b"))
        .join(bk_all_ok.select("band", "key", F.col("id").alias("id_a")), ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    both = old.select("id", "shs", "n_sh").unionByName(new.select("id", "shs", "n_sh"))
    # semi-filter to candidate ids BEFORE exploding (candidate-sized
    # explode, not index-sized — same ordering as the batch operator)
    sh_a = both.join(cand.select(F.col("id_a").alias("id")), "id", "left_semi").select(
        "id", F.explode("shs").alias("shingle")
    )
    sh_b = both.join(cand.select(F.col("id_b").alias("id")), "id", "left_semi").select(
        "id", F.explode("shs").alias("shingle")
    )
    common = (
        cand.join(sh_a.withColumnRenamed("id", "id_a"), "id_a")
        .join(sh_b.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = both.select("id", "n_sh")
    raw = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    pairs = (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .filter(raw >= threshold)
        .select(
            F.col("id_a").alias("doc_id_a"),
            F.col("id_b").alias("doc_id_b"),
            F.round(raw, 4).alias("jaccard"),
        )
        .localCheckpoint(eager=True)  # materialize BEFORE mutating the index
    )
    return pairs


def start_streaming_near_dup(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    fmt: str = "json",
    options: dict[str, str] | None = None,
    available_now: bool = False,
    poll_interval: int | None = None,
    index_mode: str = "dir",
    compact_every: int = 0,
    **near_dup_kwargs,
) -> StreamingQuery:
    """File-landing stream → per-batch near-dup against the growing
    index → verified pairs appended to ``pairs_path``.

    ``index_mode``: ``"dir"`` keeps the index as a raw parquet
    directory with per-batch_id subdir writes; ``"table"`` keeps it as
    a keyed MOR ``ManagedTable`` at ``index_path`` — snapshotted,
    time-travelable, merge-idempotent — with ``compact_every`` folding
    the accumulated deltas every Nth table version so read cost stays
    bounded over the stream's lifetime."""
    if index_mode not in ("dir", "table"):
        raise ValueError(f"unknown index_mode: {index_mode!r}")
    reader = spark.readStream.schema(schema).options(**(options or {}))
    stream = reader.format(fmt).load(landing_dir)

    table = None
    if index_mode == "table":
        from ..table import ManagedTable  # noqa: PLC0415

        num_hashes = near_dup_kwargs.get("num_hashes", _NUM_HASHES)
        table = ManagedTable.create_if_absent(
            spark,
            index_path,
            _index_schema(num_hashes),
            key_cols=["id"],
            table_type="MOR",
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table is not None:
            pairs = process_near_dup_batch_table(
                batch_df, table, **near_dup_kwargs
            )
            if compact_every and table._current_version() % compact_every == 0:
                table.compact()
        else:
            pairs = process_near_dup_batch(
                batch_df, index_path, batch_id=batch_id, **near_dup_kwargs
            )
        pairs.write.mode("append").parquet(pairs_path)

    writer = stream.writeStream.foreachBatch(sink).outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    return writer.start()

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

Incremental cost shape: per batch, banding computes |batch| × bands
keys for the NEW documents only — the index's band keys are
**persisted with the signatures** (``bk0..bk{bands-1}`` columns,
index layout v2) so the stored side of the collision join is a
column-pruned parquet scan of ``(id, n_sh, bk*)`` with zero hash
recompute, semi-restricted to the batch's own keys before any
aggregation.  Per-batch *compute* is therefore O(batch + collisions);
the only O(index) term left is the narrow key-column scan itself,
which parquet min/max pruning (Z-order the table-backed index by
``bk0`` via ``compact(zorder_by=...)``) cuts further at scale.
Verification is exploded-count over candidates only.  Band-key
frequency capping bounds degenerate hot buckets exactly like the
batch operator: frequencies are counted only for keys that actually
collide with the batch (restricting first is exact — a key absent
from the batch generates no candidates regardless of its frequency,
and for colliding keys the restricted count equals the full-population
count).

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

ID-ordering contract: pairs are emitted canonically as
``doc_id_a < doc_id_b`` via least/greatest over the collision — one
side is always in the current batch, but the batch side may carry
EITHER the lower or the higher id, so out-of-order arrivals and
merge-mode updates (an existing id re-texted, pairing anew against
higher-id partners) emit their pairs too.  Ids still SHOULD trend
non-decreasing for the manifest-stats fast path
(``_entries_disjoint_on_id``) to engage, but that is a performance
contract, not a correctness one.
"""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    _minhash_sig_col,
    _shingle_base,
    _shingle_hash_col,
)

import logging

log = logging.getLogger(__name__)

_NUM_HASHES = 16
_BANDS = 4


def _index_schema(num_hashes: int, bands: int = _BANDS) -> T.StructType:
    """Index layout v2: signatures PLUS their precomputed LSH band keys
    (``bk0..bk{bands-1}``) so later batches never re-derive keys over
    the historical population.  A v1 index (no ``bk*`` columns) is not
    readable — rebuild it once by re-ingesting (fail-loud by schema)."""
    fields = [
        T.StructField("id", T.LongType()),
        T.StructField("shs", T.ArrayType(T.StringType())),
        T.StructField("n_sh", T.IntegerType()),
    ]
    fields += [T.StructField(f"h{s}", T.LongType()) for s in range(num_hashes)]
    fields += [T.StructField(f"bk{b}", T.StringType()) for b in range(bands)]
    return T.StructType(fields)


def _band_key_cols(num_hashes: int, bands: int) -> list:
    """One constant-width key column per band — the SAME construction
    as operators.dedup.band_keys (concat_ws over the band's signature
    rows), computed ONCE at write time and persisted."""
    rows = num_hashes // bands
    return [
        F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
            f"bk{b}"
        )
        for b in range(bands)
    ]


def _stored_band_keys(index: DataFrame, bands: int) -> DataFrame:
    """(id, band, key) rows from the PERSISTED key columns: a
    column-pruned scan of ``(id, n_sh, bk*)`` — no signature columns
    read, no hashing recomputed."""
    return (
        index.filter(F.col("n_sh") > 0)
        .select(
            "id",
            F.posexplode(F.array(*[F.col(f"bk{b}") for b in range(bands)])).alias(
                "band", "key"
            ),
        )
    )


def _read_index(
    spark: SparkSession, path: str, num_hashes: int, bands: int = _BANDS
) -> DataFrame:
    # schema-explicit read so a not-yet-created index resolves to empty;
    # recursive so per-batch `b<id>` subdirs (and legacy top-level files)
    # are both picked up without partition-column inference
    return (
        spark.read.schema(_index_schema(num_hashes, bands))
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def _batch_signatures(
    batch: DataFrame, text_col: str, id_col: str, n: int, num_hashes: int,
    bands: int = _BANDS,
) -> DataFrame:
    """The batch's index rows: (id, shs, n_sh, h0..hN, bk0..bkB),
    materialized once (localCheckpoint frees the plan from the source
    stream so the later index mutation can't rescan it)."""
    new = (
        _shingle_base(batch, text_col, id_col, n)
        .withColumn("xs", _shingle_hash_col("shs"))
        .select(
            "id", "shs", F.col("n_sh").cast("int").alias("n_sh"),
            *[_minhash_sig_col(s) for s in range(num_hashes)],
        )
        .select("*", *_band_key_cols(num_hashes, bands))
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
    timings: dict | None = None,
) -> DataFrame:
    """One micro-batch step: emit (doc_id_a, doc_id_b, jaccard) pairs
    — canonically ordered doc_id_a < doc_id_b, at least one side in
    this batch (for a monotone-id stream that side is doc_id_b, but a
    batch doc with a lower id than its index partner lands on the a
    side; do NOT read doc_id_b as "the newcomer") — then append the
    batch's signatures to the index.  Returns the verified pairs
    DataFrame (already materialized — the index append is a side effect that
    must happen after pair computation reads the PREVIOUS index).

    ``batch_id`` (set by the streaming sink) keys the index append to a
    deterministic subdir so a retried batch overwrites its own prior
    output instead of appending a second copy; ad-hoc batch callers may
    omit it and get a plain top-level append."""
    spark = batch.sparkSession
    os.makedirs(index_path, exist_ok=True)
    # NB: _batch_signatures materializes the batch's rows eagerly, so
    # pair generation, the index write, and any emptiness probe share
    # ONE computation of the shingle/minhash plan
    t0 = _time.perf_counter()
    new = _batch_signatures(batch, text_col, id_col, n, num_hashes, bands)
    t1 = _time.perf_counter()
    old = _read_index(spark, index_path, num_hashes, bands)
    pairs = _near_dup_pairs(new, old, num_hashes, bands, threshold, max_band_freq)
    t2 = _time.perf_counter()
    # trigger-bounded delta, shuffle-fan-out partitioning: coalesce the
    # WRITE copy so each batch lands a handful of files, not one per
    # shuffle partition (see process_near_dup_batch_table)
    if batch_id is None:
        new.coalesce(4).write.mode("append").parquet(index_path)
    else:
        # exactly-once index write: deterministic per-batch subdir,
        # overwrite replaces any partial/duplicate output from a retry
        new.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(index_path, f"b{batch_id:020d}")
        )
    _phase_add(timings, t0, t1, t2, _time.perf_counter())
    return pairs


def _phase_add(timings: dict | None, t0, t1, t2, t3) -> None:
    """Accumulate the batch step's phase wall times — both index modes
    share the phase names so the mode premium is decomposable from the
    bench artifact alone (signatures = shingle/minhash/band-key
    materialization; pairs = collision join + exact verification;
    index_write = dir append / table MOR merge commit)."""
    if timings is None:
        return
    for k, dt in (
        ("signatures", t1 - t0), ("pairs", t2 - t1), ("index_write", t3 - t2)
    ):
        timings[k] = round(timings.get(k, 0.0) + dt, 3)


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
    timings: dict | None = None,
) -> DataFrame:
    """Table-backed variant: the signature index is a keyed MOR
    ``ManagedTable`` instead of a raw parquet directory — the
    "signature index a 100 TB deployment keeps as a table", with
    snapshot atomicity, time travel, change feeds, and foldable
    deltas.  Idempotency needs no batch_id here: the index append is
    ``table.merge`` keyed on id, so a retried batch's rows resolve to
    one row per doc at read time (O(batch) delta append per merge;
    ``compact()`` folds the deltas — see start_streaming_near_dup's
    ``compact_every``).

    The index is read UNRESOLVED (``read_unresolved``): paying the MOR
    key-resolution window over the whole index every micro-batch would
    itself be an O(index)-per-batch scale-killer.  Duplicate rows from
    retried merges only add collision candidates (removed by
    ``distinct()``), and verification resolves latest-by-commit-seq on
    the candidate-sized slice."""
    # NB: _batch_signatures materializes eagerly — pair generation, the
    # merge's emptiness probe, and the index write share one computation
    t0 = _time.perf_counter()
    new = _batch_signatures(batch, text_col, id_col, n, num_hashes, bands)
    t1 = _time.perf_counter()
    # tombstones applied: a REMOVED document (remove_documents) must
    # stop generating pairs — unlike stale duplicates, a deleted doc's
    # signatures would pass exact verification, so the mask is
    # correctness, not just efficiency.  Free when nothing was deleted.
    disjoint = _entries_disjoint_on_id(table)
    # per-batch path PROVENANCE in the phase record: the bench artifact
    # must show which path each micro-batch took (fast vs fallback), so
    # a table-vs-dir premium is attributable from the artifact alone —
    # a fallback-heavy run explains a pairs-phase delta that a
    # fast-path run cannot have.
    if timings is not None:
        key = "batches_fast_path" if disjoint else "batches_seq_fallback"
        timings[key] = timings.get(key, 0) + 1
    if disjoint:
        # Duplicate-free fast path: every live entry's manifest id
        # range is pairwise disjoint (harvested driver-side from
        # parquet footers at commit time), so no id can have two live
        # rows — seq resolution would be a no-op.  Read WITHOUT the
        # per-row commit-seq expression and verify without the
        # per-pair recency window.  This is the steady state of a
        # monotone-id ingest stream (the module's documented ID
        # contract); a retried merge or a revived document overlaps
        # ranges and falls back to the seq path below.
        old = table.read_unresolved(with_seq=False, apply_tombstones=True)
        old_keys = None
    else:
        # Two projections of the same unresolved index: the band-key
        # side needs only (id, n_sh, bk*) — the per-row commit-seq
        # expression (input_file_name regexp + map probe) would ride
        # that scan for nothing — while the verification side needs
        # the seq to resolve duplicate ids (retried merges,
        # re-ingested docs) latest-wins.
        old = table.read_unresolved(with_seq=True, apply_tombstones=True)
        old_keys = table.read_unresolved(
            with_seq=False, apply_tombstones=True
        )
    # The signature merge OVERLAPS the eager pairs job (guide §2.6):
    # both consume the pinned batch frame, and the pairs input is
    # BOUND above — read_unresolved resolves the manifest's root dirs
    # at call time and a merge only ADDS a new version-keyed root, so
    # the already-planned scans can never see the merge's rows; the
    # disjointness classification was likewise taken pre-merge.  That
    # makes the overlap result-identical to the old serial order
    # (pairs-then-merge).  Both settle before return, so maintenance /
    # compaction (which DELETES folded roots) still runs strictly
    # after the pairs are physical.  Crash anywhere here and the
    # redelivered batch heals: the merge is a keyed idempotent upsert,
    # and pairs recompute with the batch's own ids anti-joined out of
    # the index side.
    #
    # Per-commit file count bounded by the table's
    # write.max-delta-files property (see _index table creation);
    # emptiness probe skipped — the sink gates on batch_df.isEmpty()
    # and a non-empty batch always yields signature rows.
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    merge_wall = [0.0]

    def _merge_sigs() -> None:
        m0 = _time.perf_counter()
        table.merge(new, assume_nonempty=True)
        merge_wall[0] = _time.perf_counter() - m0

    with ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="sig-merge"
    ) as pool:
        fut = pool.submit(_merge_sigs)
        pairs_err: Exception | None = None
        pairs = None
        try:
            pairs = _near_dup_pairs(
                new, old, num_hashes, bands, threshold, max_band_freq,
                old_keys=old_keys,
            )
        except Exception as e:  # noqa: BLE001
            pairs_err = e
        merge_err: Exception | None = None
        try:
            fut.result()
        except Exception as e:  # noqa: BLE001
            merge_err = e
    if pairs_err is not None:
        if merge_err is not None:
            log.warning(
                "signature merge also failed after a pairs failure: %s",
                merge_err,
            )
        raise pairs_err
    if merge_err is not None:
        raise merge_err
    t2 = _time.perf_counter()
    # phase convention under overlap: "pairs" is the main-thread wall
    # of the pairs job, "index_write" the merge thread's own wall —
    # they overlap, so their sum exceeds the step's elapsed by design
    # (same convention as the with_indexes entry's per-index phases)
    _phase_add(timings, t0, t1, t2, t2 + merge_wall[0])
    return pairs


def _entries_disjoint_on_id(table) -> bool:
    """True iff the live manifest entries' ``id`` stats prove
    pairwise-disjoint ranges — i.e. no id can have more than one live
    row, so MOR seq resolution is provably a no-op.  Delegates to the
    generic ``ManagedTable.entries_disjoint_on`` (shared with
    ``read_where_in``'s resolution-free fast path)."""
    return table.entries_disjoint_on("id")


def _near_dup_pairs(
    new: DataFrame,
    old: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_band_freq: int,
    old_keys: DataFrame | None = None,
) -> DataFrame:
    """One eager job per batch: candidate generation and verification
    compose into a single linear chain (cand → join a-side sigs → join
    b-side sigs → jaccard), so nothing re-evaluates and pairs
    materialize BEFORE the caller mutates the index.

    ``old_keys``: optional cheaper projection of the SAME index rows
    for the band-key (candidate) side only — the table-backed caller
    passes a seq-free read so the column-pruned key scan skips the
    per-row commit-seq expression; verification still uses ``old``."""
    # An id already in the index that reappears in this batch (retry
    # after a successful append, or a re-sent document) must not be
    # joined against its own stale signatures — the batch's row is
    # authoritative.
    batch_ids = new.select("id")
    old = old.join(batch_ids, "id", "left_anti")
    keys_side = (
        old if old_keys is None else old_keys.join(batch_ids, "id", "left_anti")
    )
    cand = _collision_candidates(new, keys_side, bands, max_band_freq)
    return _verify_candidates(new, old, cand, threshold).localCheckpoint(eager=True)


def _collision_candidates(
    new: DataFrame,
    old: DataFrame,
    bands: int,
    max_band_freq: int,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs: the batch's band keys joined
    against the index's PERSISTED band keys.  The signature columns
    (``h*``) of the index are NEVER read — the stored side is a
    column-pruned ``(id, n_sh, bk*)`` scan, so per-batch compute is
    O(batch + collisions) however large the index has grown."""
    bk_new = _stored_band_keys(new, bands)
    # Semi-restrict the stored keys to the batch's keys BEFORE any
    # aggregation: a micro-batch's key set is bounded, so it broadcasts
    # and the index side reduces to a column-pruned scan + hash probe —
    # no per-batch O(index) key recompute, no O(index) group-by.
    batch_keys = bk_new.select("band", "key").distinct()
    bk_old = _stored_band_keys(old, bands).join(
        F.broadcast(batch_keys), ["band", "key"], "left_semi"
    )
    bk_all = bk_old.unionByName(bk_new)
    # hot-bucket cap: for every key colliding with the batch, the
    # restricted count equals the full-population count, so a key that
    # grew hot over the stream's lifetime still stops generating
    # O(bucket²) work.  (On an unresolved table read, retried merges
    # can duplicate key rows, inflating freq — the cap then fires
    # EARLIER, never later: conservative.)
    hot = (
        bk_all.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > max_band_freq)
        .select("band", "key")
    )
    bk_all_ok = bk_all.join(hot, ["band", "key"], "left_anti")
    bk_new_ok = bk_new.join(hot, ["band", "key"], "left_anti")
    # Canonicalize as (least, greatest) rather than filtering
    # id_a < id_b with id_b pinned to the batch side: a batch doc with
    # an id BELOW its index partner (a merge-mode UPDATE re-texting an
    # old id, or an out-of-order arrival) must still emit its pair.
    # For monotone-id streams the two forms are identical; new-new
    # collisions arrive from both directions and collapse in distinct.
    return (
        bk_new_ok.select("band", "key", F.col("id").alias("id_n"))
        .join(bk_all_ok.select("band", "key", F.col("id").alias("id_o")), ["band", "key"])
        .filter(F.col("id_o") != F.col("id_n"))
        .select(
            F.least("id_o", "id_n").alias("id_a"),
            F.greatest("id_o", "id_n").alias("id_b"),
        )
        .distinct()
    )


def _verify_candidates(
    new: DataFrame,
    old: DataFrame,
    cand: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact jaccard over the candidate pairs only, as ONE linear join
    chain: cand ⋈ a-side sigs ⋈ b-side sigs → ``array_intersect``
    count.  Candidates are batch-bounded (micro-batch × bands, hot
    buckets capped), so AQE broadcasts the pair side of both joins —
    the index's signature columns are scanned (column-pruned) but
    never shuffled, and no intermediate needs materializing.  (The
    batch-corpus operator prefers exploded-count jaccard — at corpus
    scale the array payloads would ride every shuffle — but here the
    pair side never exceeds a micro-batch's collisions, so the
    vectorized per-pair intersect wins over 3 extra stages.)"""
    has_seq = "_sg_seq" in old.columns
    seq = (F.col("_sg_seq") if has_seq else F.lit(0)).alias("seq")
    # the batch's own rows are authoritative (max seq)
    sigs = old.select("id", "shs", "n_sh", seq).unionByName(
        new.select("id", "shs", "n_sh", F.lit(1 << 62).alias("seq"))
    )
    sigs_a = sigs.select(
        F.col("id").alias("id_a"), F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("n_a"), F.col("seq").alias("seq_a"),
    )
    sigs_b = sigs.select(
        F.col("id").alias("id_b"), F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("n_b"), F.col("seq").alias("seq_b"),
    )
    joined = cand.join(sigs_a, "id_a").join(sigs_b, "id_b")
    if has_seq:
        # unresolved table read: duplicate ids from retried/re-sent
        # merges resolve latest-by-commit-seq HERE, on the candidate-
        # sized slice, instead of a full-index key window every batch
        from pyspark.sql import Window  # noqa: PLC0415

        w = Window.partitionBy("id_a", "id_b").orderBy(
            F.col("seq_a").desc(), F.col("seq_b").desc()
        )
        joined = (
            joined.withColumn("_sg_rn", F.row_number().over(w))
            .filter(F.col("_sg_rn") == 1)
        )
    n_common = F.size(F.array_intersect("shs_a", "shs_b"))
    raw = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        joined.withColumn("n_common", n_common)
        .filter(raw >= threshold)
        .select(
            F.col("id_a").alias("doc_id_a"),
            F.col("id_b").alias("doc_id_b"),
            F.round(raw, 4).alias("jaccard"),
        )
    )


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
    async_maintenance: bool = False,
    phase_times: dict | None = None,
    **near_dup_kwargs,
) -> StreamingQuery:
    """File-landing stream → per-batch near-dup against the growing
    index → verified pairs appended to ``pairs_path``.

    ``index_mode``: ``"dir"`` keeps the index as a raw parquet
    directory with per-batch_id subdir writes; ``"table"`` keeps it as
    a keyed MOR ``ManagedTable`` at ``index_path`` — snapshotted,
    time-travelable, merge-idempotent — with ``compact_every`` folding
    the accumulated deltas every Nth table version so read cost stays
    bounded over the stream's lifetime.

    ``async_maintenance`` moves that compaction OFF the micro-batch
    critical path into a daemon thread — the production shape, where
    maintenance never adds latency to ingest.  Safe against the live
    writer because commits are version-anchored CAS: a compaction that
    loses the race to the next merge recomputes and retries
    (``ManagedTable.compact`` retries), and a merge that loses to the
    compaction re-commits its already-written delta root verbatim
    (``_commit_entry_with_retry``).  The in-flight thread handle is
    exposed as ``table._sg_maint_thread`` so batch jobs and tests can
    join it before tearing the table down."""
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
            # id stats ARE harvested (driver-side parquet-footer read,
            # no Spark job): they fund _entries_disjoint_on_id's proof
            # that seq resolution is a no-op, which removes the
            # per-row seq expression and per-pair recency window from
            # every batch of a monotone-id stream
            properties={
                # trigger-bounded signature deltas: bound per-commit
                # file count at the table layer
                "write.max-delta-files": "4",
            },
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table is not None:
            pairs = process_near_dup_batch_table(
                batch_df, table, timings=phase_times, **near_dup_kwargs
            )
            # cadence counts DATA commits since the last compaction —
            # raw version modulus would fire after N-1 merges (and at
            # N=2 after every merge, since each compact realigns parity)
            if compact_every and (
                table.data_commits_since_maintenance() >= compact_every
            ):
                if async_maintenance:
                    import threading  # noqa: PLC0415

                    # surface (don't swallow) the PREVIOUS compaction's
                    # terminal failure: a bare daemon thread dying on a
                    # CommitConflictError/IO error would silently stop
                    # all future compaction and let read cost grow
                    # unbounded.  The exception is stashed on the table
                    # and re-raised into the stream at the next trigger.
                    prev_exc = getattr(table, "_sg_maint_error", None)
                    if prev_exc is not None:
                        table._sg_maint_error = None
                        raise RuntimeError(
                            "async index compaction failed on a prior "
                            "trigger; raising into the stream so the "
                            "failure is visible (restart resumes from "
                            "the checkpoint)"
                        ) from prev_exc

                    def _compact_guarded(tbl=table):
                        try:
                            tbl.compact()
                        except Exception as exc:  # noqa: BLE001
                            tbl._sg_maint_error = exc

                    prev = getattr(table, "_sg_maint_thread", None)
                    if prev is None or not prev.is_alive():
                        th = threading.Thread(
                            target=_compact_guarded, daemon=True
                        )
                        table._sg_maint_thread = th
                        th.start()
                else:
                    tm0 = _time.perf_counter()
                    table.compact()
                    if phase_times is not None:
                        phase_times["maintenance"] = round(
                            phase_times.get("maintenance", 0.0)
                            + (_time.perf_counter() - tm0),
                            3,
                        )
        else:
            pairs = process_near_dup_batch(
                batch_df, index_path, batch_id=batch_id,
                timings=phase_times, **near_dup_kwargs
            )
        # the pairs relation is collision-sized (usually tiny): bound
        # its per-batch file count too
        tp0 = _time.perf_counter()
        pairs.coalesce(4).write.mode("append").parquet(pairs_path)
        if phase_times is not None:
            phase_times["pairs_write"] = round(
                phase_times.get("pairs_write", 0.0)
                + (_time.perf_counter() - tp0),
                3,
            )

    writer = stream.writeStream.foreachBatch(sink).outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_interval:
        writer = writer.trigger(processingTime=f"{poll_interval} seconds")
    query = writer.start()
    # expose the index table (and through it any in-flight async
    # maintenance thread, table._sg_maint_thread) so callers can join
    # maintenance before tearing the table down
    query._sg_index_table = table
    return query


def remove_documents(table, ids: DataFrame, id_col: str = "doc_id") -> int:
    """Remove documents from a TABLE-BACKED signature index (takedown /
    retention deletes): their keys land as an O(deletes) MOR tombstone
    delta, later batches stop pairing against them (the batch
    processors read with ``apply_tombstones=True``), and a re-ingested
    document revives normally because the merge stamps a newer commit
    seq.  ``compact()`` folds the tombstones away."""
    return table.delete_keys(ids.select(F.col(id_col).alias("id")))

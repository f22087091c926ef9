"""Job orchestration: config → session → source → transform → sink.

Re-expresses the reference's main loop (reference:
spark-job/read.py:298-350) as composable pieces.  The batch path
(``run_batch`` / ``run_sqs_loop``) keeps the reference's semantics with
the documented fixes; the streaming path lives in
``streaming/ingest.py``.
"""

from __future__ import annotations

import logging
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .config import JobConfig, load_text
from .operators.rollup import ChangeWindowCache
from .plans import apply_transform_query, execute_merge_into, is_merge_into
from .schema import avro_to_spark_schema
from .sources.files import read_batch, with_lineage
from .sources.sqs import SqsFileSource
from .table import ManagedTable

log = logging.getLogger(__name__)


def _norm_path(p: str) -> str:
    """Canonical path for the post-commit collision guards: two
    spellings of one location (trailing slash, relative vs absolute)
    must not defeat the serial fallback whose purpose is keeping one
    table from taking commits from two threads."""
    return os.path.abspath(p).rstrip("/")


def _run_units(
    units: list[tuple[str, "callable"]], pool_name: str, parallel: bool
) -> None:
    """Run named work units, from a thread pool when ``parallel`` —
    the ONE post-commit overlap contract (guide §2.6) every
    maintenance loop shares: units write only to their own tables and
    read immutable published snapshots, errors surface only after ALL
    units settle (completed units stay in their idempotent post-fold
    state for the batch redelivery that follows), and the first error
    wins with the rest logged."""
    if parallel and len(units) >= 2:
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(
            max_workers=len(units), thread_name_prefix=pool_name
        ) as pool:
            futs = [(name, pool.submit(fn)) for name, fn in units]
            first_err: Exception | None = None
            for name, fut in futs:
                try:
                    fut.result()
                except Exception as e:  # noqa: BLE001
                    if first_err is None:
                        first_err = e
                    else:
                        log.warning(
                            "additional %s unit failure (%s): %s",
                            pool_name, name, e,
                        )
        if first_err is not None:
            raise first_err
    else:
        for _, fn in units:
            fn()


def build_spark(config: JobConfig, app_name: str = "s3-sqs-ingestion-spark") -> SparkSession:
    from .session import build_session  # noqa: PLC0415

    protocol = "s3a" if (config.input_config.path or "").startswith(("s3:", "s3a:")) else "local"
    # the ingest path defaults to the scale profile (AQE advisory
    # sizing, scan-split sizing, skew-join splitting — see
    # session.INGEST_SCALE_PROFILE); any key in the job's ``spark``
    # map overrides it, same precedence as the reference's conf merge
    # (reference: spark-job/read.py:79-80)
    return build_session(
        app_name=app_name, conf=config.spark, protocol=protocol,
        profile="ingest-scale",
    )


def ensure_target(spark: SparkSession, config: JobConfig) -> ManagedTable:
    """Bootstrap the target table from the Avro contract if absent
    (reference: spark-job/read.py:199-228).  Declared rollup tables
    bootstrap HERE too — their DDL validates group/sum columns against
    the contract, and a config error must surface at startup, never
    mid-batch (the SQS poison-redelivery shape)."""
    out = config.output_config
    if ManagedTable.exists(out.table_path):
        table = ManagedTable.load(spark, out.table_path)
    else:
        if not out.schema:
            raise ValueError(
                "creating a new table requires output_config.schema (.avsc)"
            )
        schema = avro_to_spark_schema(load_text(out.schema))
        table = ManagedTable.create(
            spark,
            out.table_path,
            schema,
            partition_cols=out.partition,
            key_cols=out.key_columns,
            order_column=out.order_column,
            merge_policy=out.merge_policy,
            table_type=out.table_type,
            compression=out.compression,
            properties=out.table_properties,
            partition_transforms=out.partition_transforms,
        )
    _bootstrap_rollups(table, config)
    return table


def _bootstrap_rollups(table: ManagedTable, config: JobConfig) -> None:
    """Create any declared-but-absent rollup tables (shared by the
    producer and replica-consumer bootstrap paths).  consume_from=1:
    the first refresh folds the table's EXISTING content through the
    change feed, so a rollup declared on a populated table starts
    correct."""
    out = config.output_config
    if not out.rollups:
        return
    from .operators.rollup import create_rollup  # noqa: PLC0415

    for r in out.rollups:
        if not ManagedTable.exists(r.path):
            create_rollup(
                table,
                r.path,
                r.group_columns,
                r.sum_columns,
                consume_from=1,
                min_cols=r.min_columns,
                max_cols=r.max_columns,
                distinct_cols=r.distinct_columns,
                sumsq_cols=r.sumsq_columns,
                hist_cols=r.hist_columns,
            )


def ensure_replica_target(spark: SparkSession, config: JobConfig) -> ManagedTable:
    """Bootstrap the REPLICA table of a cdc_export consumer job
    (``input_config.type: "cdc_export"``).  The schema comes from the
    Avro contract when ``output_config.schema`` is given, else from
    the export's own anchor — a replica on another cluster needs no
    artifact beyond the export directory itself.  Declared rollups
    bootstrap here too, same rationale as ``ensure_target``."""
    from pyspark.sql import types as T  # noqa: PLC0415

    from .operators.cdc_export import _read_anchor  # noqa: PLC0415

    inp, out = config.input_config, config.output_config
    if ManagedTable.exists(out.table_path):
        table = ManagedTable.load(spark, out.table_path)
    else:
        if out.schema:
            schema = avro_to_spark_schema(load_text(out.schema))
        else:
            from .operators.cdc_export import export_exists  # noqa: PLC0415

            if not export_exists(inp.path or ""):
                # a raw FileNotFoundError on _anchor.json would not
                # name the real problem: the consumer started before
                # the producer provisioned the export (or the path is
                # a typo) — the module's loud-refusal standard applies
                raise ValueError(
                    f"cannot bootstrap replica {out.table_path}: "
                    f"input_config.path {inp.path!r} is not a "
                    "provisioned change export (no _anchor.json) — "
                    "start the producer job first (output_config."
                    "cdc_exports provisions lazily on its first "
                    "batch), or fix the path, or give the consumer "
                    "its own output_config.schema contract"
                )
            schema = T.StructType.fromJson(
                _read_anchor(inp.path or "")["schema"]
            )
        table = ManagedTable.create(
            spark,
            out.table_path,
            schema,
            partition_cols=out.partition,
            key_cols=out.key_columns,
            order_column=out.order_column,
            merge_policy=out.merge_policy,
            table_type=out.table_type,
            compression=out.compression,
            properties=out.table_properties,
            partition_transforms=out.partition_transforms,
        )
    _bootstrap_rollups(table, config)
    return table


def run_replica_sync(
    spark: SparkSession,
    config: JobConfig,
    max_cycles: int | None = None,
) -> int:
    """Replication-consumer loop: the declarative driver for
    ``sync_from_export`` (operators/cdc_export.py), mirroring
    ``run_sqs_loop``'s shape — one job JSON declares the whole
    consumer, the true downstream twin of the reference's declarative
    surface (spark-job/job.json:1-39).  Per cycle: tail the export
    from the replica's durable cursor, apply exactly-once, then
    refresh every declared derived family off the replica's own change
    feed — replica-local rollups, join MVs, top-k MVs, cascaded
    re-exports — and run the maintenance cadence.  Quiet cycles skip
    the refreshes, except the first of a run (crash recovery: a prior
    run may have died between the apply and its refreshes).
    ``max_cycles`` bounds the loop for tests; ``None`` runs forever.
    Crash-safe end to end: the apply's evolve→delete→merge→cursor
    contract plus every family's own version cursor make a replayed
    cycle a no-op.

    Scale shape: each cycle is O(new windows + affected groups) —
    the tail subsets window directories by name before Spark lists a
    file, and a quiet cycle costs one directory listing."""
    from .operators.cdc_export import (  # noqa: PLC0415
        _APPLY_KEY,
        sync_from_export,
    )

    inp = config.input_config
    if inp.type != "cdc_export":
        raise ValueError(
            f"run_replica_sync requires input_config.type='cdc_export',"
            f" got {inp.type!r}"
        )
    table = ensure_replica_target(spark, config)
    cycles = 0
    first_cycle = True
    while max_cycles is None or cycles < max_cycles:
        cycles += 1
        before = int(table.meta.properties.get(_APPLY_KEY, 0))
        cursor = sync_from_export(
            spark,
            inp.path or "",
            table,
            consumer_id=inp.consumer_id,
            allow_partial_bootstrap=inp.allow_partial_bootstrap,
        )
        if cursor > before or first_cycle:
            # quiet cycles skip the family refreshes — EXCEPT the
            # first of a run: a crash between a previous run's apply
            # (cursor durably advanced) and its refreshes would
            # otherwise leave the families stale for as long as the
            # producer stays quiet.  The refreshes are idempotent via
            # their own version cursors, so the recovery pass is a
            # cheap no-op when nothing was pending.
            _maintain_derived(spark, config, table)
        first_cycle = False
        if max_cycles is None or cycles < max_cycles:
            time.sleep(inp.poll_interval if cursor == before else 0)
    return cycles


def process_files(
    spark: SparkSession,
    config: JobConfig,
    files: list[str],
    lineage: bool = False,
    debug_show: bool = False,
    index_phases: dict | None = None,
) -> int:
    """One micro-batch: read files → optional transform/merge SQL →
    write in the configured mode (reference: spark-job/read.py:251-281).
    ``debug_show`` prints the batch (reference console sink S10,
    spark-job/read.py:275).  Returns the committed snapshot version."""
    inp, out = config.input_config, config.output_config
    schema = avro_to_spark_schema(load_text(inp.schema_file)) if inp.schema_file else None
    df = read_batch(spark, files, inp.format, inp.options, schema)
    if lineage:
        df = with_lineage(df)
    if debug_show:
        df.show()

    # CDC delete handling (output_config.cdc_delete_values): rows whose
    # op column carries a delete marker DELETE their keys instead of
    # upserting.  Per-key, the batch's LATEST action wins (a key
    # updated then deleted in one batch deletes; deleted then
    # re-inserted upserts) — real DMS semantics the reference lacked
    # (its merge upserts 'D' rows like any other).  Split BEFORE the
    # transform query, which drops the op column.
    deletes = None
    if (
        out.cdc_delete_values
        and out.cdc_op_column in df.columns
        and out.key_columns
    ):
        from pyspark.sql import functions as F  # noqa: PLC0415

        from .operators.merge import dedup_latest  # noqa: PLC0415

        latest = (
            dedup_latest(df, out.key_columns, out.order_column)
            if out.order_column and out.order_column in df.columns
            else df
        )
        is_del = F.col(out.cdc_op_column).isin(list(out.cdc_delete_values))
        deletes = latest.filter(is_del).select(*out.key_columns)
        # null/absent op markers upsert (kept), matching SQL semantics
        df = latest.filter(~F.coalesce(is_del, F.lit(False)))

    df = apply_transform_query(spark, df, inp.transform_query)
    if out.mode == "merge" and out.merge_query:
        text = load_text(out.merge_query)
        if is_merge_into(text):
            # the reference's verbatim MERGE INTO statement (reference:
            # spark-job/mergeSQL.sql) — translate onto ManagedTable.merge
            table = ensure_target(spark, config)
            if out.indexes:
                # the MERGE INTO's source SELECT reshapes the batch
                # before it lands — indexing the pre-merge frame would
                # build the index from different rows/columns than the
                # table.  Express the projection via transform_query
                # instead, which runs before this point.
                raise ValueError(
                    "output_config.indexes is not supported with a "
                    "verbatim MERGE INTO merge_query — move the "
                    "source projection into input_config."
                    "transform_query so the indexed frame matches "
                    "the table"
                )
            if out.audit.rules:
                # parse-time check covers readable merge SQL; an
                # S3-only file lands here — still before any write
                raise ValueError(
                    "output_config.audit is not supported with a "
                    "verbatim MERGE INTO merge_query — the MERGE "
                    "executes directly against the table, so there is "
                    "no staged snapshot to audit"
                )
            if out.schema_evolution:
                # same parse-time/S3-only split as the audit guard
                raise ValueError(
                    "output_config.schema_evolution is not supported "
                    "with a verbatim MERGE INTO merge_query — the "
                    "statement's fixed column list cannot see evolved "
                    "columns"
                )
            version = execute_merge_into(spark, table, df, text)
            if deletes is not None:
                version = table.delete_keys(deletes)
            # rollups/join MVs consume the TABLE's change feed,
            # so unlike indexes they stay coherent under the verbatim
            # MERGE
            return _maintain_derived(spark, config, table) or version
        df = apply_transform_query(spark, df, text)
    if len(out.indexes) >= 2:
        # ONE source materialization per batch: without it, the table
        # write and every declared index each re-run the full source
        # scan + CDC dedup (a json batch with N indexes is parsed N+1
        # times — measured ~1.5× the whole ingest cost at 3 indexes).
        # The frame is trigger-bounded by contract, so executor-local
        # storage holds it; downstream windows/joins then run over the
        # materialized rows instead of the raw files.  At ONE index the
        # checkpoint loses: it materializes every column (the table
        # write needs them all) to save a single re-scan — measured a
        # wash-to-slower, so the re-scan stays.
        df = df.localCheckpoint(eager=True)
        if deletes is not None:
            deletes = deletes.localCheckpoint(eager=True)
    table = ensure_target(spark, config)
    evo_prior_schema = None
    if out.schema_evolution:
        # Evolve BEFORE the write: new batch columns become nullable
        # table columns, lossless widenings (int→bigint, float→double)
        # widen the contract — both metadata-only, no file rewrites
        # (old files null-fill / promote at read).  Idempotent, so a
        # replayed batch (crash between sink write and source commit)
        # finds nothing to change.  Runs AFTER the transform query —
        # what evolves is the frame the table actually lands.
        # OPERATIONAL columns are excluded: a CDC op marker (consumed
        # by the delete split above) and harness-injected lineage
        # columns are not batch data — without the exclusion the first
        # batch would permanently add them to the contract.
        evo_schema = df.schema
        op_cols = set()
        if out.cdc_delete_values:
            op_cols.add(out.cdc_op_column)
        if lineage:
            op_cols.update(("_ingest_file", "_ingest_ts"))
        if op_cols:
            evo_schema = StructType(
                [f for f in evo_schema.fields if f.name not in op_cols]
            )
        evo_prior_schema = table.meta.schema_json
        actions = table.evolve_schema(evo_schema)
        if not actions:
            evo_prior_schema = None
        for a in actions:
            log.info("schema evolution (%s): %s", out.table_path, a)
    if out.audit.rules:
        import hashlib  # noqa: PLC0415

        batch_tag = hashlib.md5(
            "\n".join(sorted(files)).encode()
        ).hexdigest()
        try:
            version, accepted = _audited_write(
                spark, config, table, df, batch_tag=batch_tag
            )
        except Exception:
            # on_fail='fail' re-raises from INSIDE _audited_write, so
            # the rejected-batch rollback below would never run and the
            # batch's evolved columns would stay in the contract —
            # inconsistent with the drop/quarantine policies.  Roll
            # back here too (idempotent re-evolution on redelivery
            # makes this safe for non-audit failures as well).
            if evo_prior_schema is not None:
                table.meta.schema_json = evo_prior_schema
                table._persist_meta()
                log.warning(
                    "schema evolution rolled back with the failed "
                    "batch (%s)", out.table_path,
                )
            raise
        if not accepted:
            # the WHOLE batch is rejected: no deletes, no index folds,
            # no maintenance cadence tick — the table (and everything
            # derived from it) saw nothing.  That includes THIS batch's
            # schema evolution: a rejected batch must not leave its
            # (possibly garbage) columns in the contract.  Rolling the
            # metadata back is safe — no data landed under the evolved
            # schema (the staged delta was discarded; quarantine copies
            # were read before this point) and metadata ops are
            # single-writer by contract.
            if evo_prior_schema is not None:
                table.meta.schema_json = evo_prior_schema
                table._persist_meta()
                log.warning(
                    "schema evolution rolled back with the rejected "
                    "batch (%s)", out.table_path,
                )
            return version
    else:
        version = table.write(df, out.mode)
    if deletes is not None:
        version = table.delete_keys(deletes)
    # Index folds and derived-family refreshes are independent (folds
    # consume the BATCH into index tables; families consume the
    # TABLE's published change feed into their own MVs), so they
    # overlap from driver threads too — the table and delete commits
    # above happened-before both.  Same contract as within each pool:
    # errors surface after both settle, and the batch redelivery that
    # follows re-runs either side idempotently (tag-guarded folds,
    # version-cursor refreshes).  Serial when any declared index path
    # collides with a family target (one table must not take commits
    # from two threads).
    fam_declared = bool(
        out.rollups or out.join_mvs or out.topk_mvs or out.cdc_exports
    )
    # collision surface: family WRITE targets and family READ
    # dependencies (a join MV whose right table is one of this job's
    # index tables must see the index fold land first, exactly as the
    # serial order guaranteed) — paths normalized so two spellings of
    # one location can't defeat the serial fallback
    fam_paths = (
        {_norm_path(r.path) for r in out.rollups}
        | {_norm_path(j.path) for j in out.join_mvs}
        | {_norm_path(j.right_table) for j in out.join_mvs}
        | {_norm_path(tk.path) for tk in out.topk_mvs}
        | {_norm_path(e.path) for e in out.cdc_exports}
    )
    if (
        out.indexes
        and fam_declared
        and not ({_norm_path(ix.path) for ix in out.indexes} & fam_paths)
    ):
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="post-commit"
        ) as pool:
            f_ix = pool.submit(
                _maintain_indexes, spark, config, df, files, deletes,
                phases_out=index_phases,
            )
            f_fam = pool.submit(_maintain_derived, spark, config, table)
            ix_err: Exception | None = None
            maintained = None
            try:
                f_ix.result()
            except Exception as e:  # noqa: BLE001
                ix_err = e
            try:
                maintained = f_fam.result()
            except Exception as e:  # noqa: BLE001
                if ix_err is not None:
                    log.warning(
                        "additional derived-maintenance failure after an "
                        "index-fold failure: %s", e,
                    )
                else:
                    raise
        if ix_err is not None:
            raise ix_err
        return maintained or version
    _maintain_indexes(spark, config, df, files, deletes,
                      phases_out=index_phases)
    return _maintain_derived(spark, config, table) or version


def _maintain_derived(
    spark: SparkSession, config: JobConfig, table: ManagedTable
) -> int | None:
    """Refresh every declared feed-driven family off ``table``'s
    change feed, then run the table-maintenance cadence — the ONE
    sequence every write path ends with (batch ingest, the verbatim
    MERGE INTO path, and the replica-sync loop).  Family refreshes run
    BEFORE the compaction cadence: the feed splits windows at
    maintenance commits anyway, but consuming first keeps this cycle's
    refresh on the cheapest same-manifest path.  One ChangeWindowCache
    per call: every family consuming the feed at the same cursor
    shares ONE pinned window frame instead of re-deriving it per
    family (operators/rollup.ChangeWindowCache) — valid because the
    table gains no commits between these refreshes.  Returns the
    post-maintenance version when the cadence ran, else None.

    Independent families overlap from driver threads (the same
    back-fill pattern as ``_maintain_indexes``): each family commits
    only to its OWN derived tables and reads immutable published
    snapshots of the source, so with 4 declared families the serial
    critical path (~sum of four refresh+merge cycles, each leaving
    most of local[N] idle on its commit constants) collapses to
    ~max().  Parallel only when every write target is distinct AND no
    family's target doubles as another family's read dependency (a
    join MV whose right table is this job's own rollup must see the
    rollup's fold first, exactly as the serial order guaranteed);
    errors surface after ALL families settle — every refresh is
    version-cursor idempotent, so the redelivery that follows re-runs
    completed families harmlessly.  The shared ChangeWindowCache is
    lock-serialized on population, so the window frame is still
    derived and pinned exactly once.

    The shared cache exists to AMORTIZE the window pin across
    consumers, so it is only built when ≥2 declared families consume
    the feed — with one consumer the eager ``localCheckpoint`` is a
    pure extra job per batch (~0.4 s measured on the single-family
    incremental-rollup entries), and each family's no-cache fallback
    already makes the locally-optimal choice (rollups: no pin, single
    grouped pass; top-k: pins itself, it double-consumes; join MVs:
    lazy per-segment reads)."""
    out = config.output_config
    n_feed_consumers = (
        len(out.rollups) + len(out.join_mvs) + len(out.topk_mvs)
    )
    cache = ChangeWindowCache() if n_feed_consumers >= 2 else None
    families = []
    if out.rollups:
        families.append(
            ("rollups", lambda: _maintain_rollups(spark, config, table, cache))
        )
    if out.join_mvs:
        families.append(
            ("join_mvs",
             lambda: _maintain_join_mvs(spark, config, table, cache))
        )
    if out.topk_mvs:
        families.append(
            ("topk_mvs",
             lambda: _maintain_topk_mvs(spark, config, table, cache))
        )
    if out.cdc_exports:
        families.append(
            ("cdc_exports", lambda: _maintain_cdc_exports(spark, config, table))
        )
    from .operators.rollup import companion_path  # noqa: PLC0415

    # paths normalized (trailing slash / relative spellings must not
    # defeat the serial fallback); rollup COMPANION tables are write
    # targets too — a pathological config naming one as another
    # family's path or read dependency must stay serial
    targets = (
        [_norm_path(r.path) for r in out.rollups]
        + [
            _norm_path(companion_path(r.path, c))
            for r in out.rollups
            for c in r.distinct_columns
        ]
        + [_norm_path(j.path) for j in out.join_mvs]
        + [_norm_path(tk.path) for tk in out.topk_mvs]
        + [_norm_path(e.path) for e in out.cdc_exports]
    )
    reads = {_norm_path(table.path)} | {
        _norm_path(j.right_table) for j in out.join_mvs
    }
    _run_units(
        families,
        "derived-family",
        parallel=(
            len(set(targets)) == len(targets)
            and not (set(targets) & reads)
        ),
    )
    return _maybe_maintain(table, config)


def _maintain_cdc_exports(
    spark: SparkSession, config: JobConfig, table: ManagedTable
) -> None:
    """Publish every declared outbound CDC export
    (``output_config.cdc_exports``) from the target table's change
    feed (operators/cdc_export.py) — the declarative form of the
    export connector, so a downstream consumer can be fed by the same
    job spec that maintains every other derived surface (the
    reference's whole surface is one declarative job file,
    spark-job/job.json).  Provisioned lazily on the first batch with
    ``consume_from=1`` (pre-existing table content exports as
    inserts); replay-safe by the exporter's own contract (a
    redelivered batch's window is already published and skips).

    Cadences (derived from the directory listing — stateless; mutually
    exclusive, validated at parse time): ``keep_last_windows`` prunes
    all but the most recent N windows after each export — capped at
    the slowest REGISTERED consumer cursor (``_consumers/``), so
    replicas that sync with a ``consumer_id`` are never pruned past;
    ``coalesce_after`` binpacks all but the newest window into one
    once more than N are retained."""
    out = config.output_config
    if not out.cdc_exports:
        return
    from .operators.cdc_export import (  # noqa: PLC0415
        create_change_export,
        export_changes,
        export_exists,
        maintain_export_cadences,
    )

    def _one(e):
        def run():
            if not export_exists(e.path):
                create_change_export(table, e.path, consume_from=1)
            export_changes(table, e.path)
            maintain_export_cadences(
                spark, e.path,
                keep_last_windows=e.keep_last_windows,
                coalesce_after=e.coalesce_after,
            )
        return run

    # N declared exports each publish to their OWN directory from the
    # same immutable feed — overlap them (guide §2.6) under the usual
    # distinct-target guard
    paths = [_norm_path(e.path) for e in out.cdc_exports]
    _run_units(
        [(e.path, _one(e)) for e in out.cdc_exports],
        "cdc-export",
        parallel=len(set(paths)) == len(paths),
    )


def _maintain_rollups(
    spark: SparkSession,
    config: JobConfig,
    table: ManagedTable,
    window_cache: "ChangeWindowCache | None" = None,
) -> None:
    """Refresh every declared summary table (``output_config.rollups``)
    from the target table's change feed — O(batch window + affected
    groups) per batch, version-cursor idempotent (a refresh that
    crashed before advancing its cursor re-consumes the same window;
    a redelivered merge of identical rows nets to zero)."""
    out = config.output_config
    if not out.rollups:
        return
    from .operators.rollup import refresh_rollup  # noqa: PLC0415

    from .operators.rollup import companion_path  # noqa: PLC0415

    def _one(r):
        def run():
            dst = ManagedTable.load(spark, r.path)
            refresh_rollup(
                table,
                dst,
                r.group_columns,
                r.sum_columns,
                min_cols=r.min_columns,
                max_cols=r.max_columns,
                distinct_cols=r.distinct_columns,
                sumsq_cols=r.sumsq_columns,
                hist_cols=r.hist_columns,
                window_cache=window_cache,
            )
            # fold accumulated MOR deltas at cadence: without it every
            # refresh's keyed merge adds delta files whose read-time
            # resolution the NEXT refresh (and every rollup reader) pays
            if r.maintenance_every:
                if dst.data_commits_since_maintenance() >= r.maintenance_every:
                    dst.compact()
                    # history past the tag-replay window funds nothing
                    # here: the fold-tag probe stops at the previous
                    # fold's tag, and the rollup consumes the SOURCE's
                    # feed, never its own — same reasoning as the
                    # search-index expiry
                    dst.expire_snapshots(keep_last=32)
                # companions run their OWN cadence, not nested inside the
                # rollup's: a high-churn distinct column accumulates
                # deltas (one keyed merge per batch) even across batches
                # where the rollup itself stayed quiet
                for c in r.distinct_columns:
                    comp = ManagedTable.load(spark, companion_path(r.path, c))
                    if comp.data_commits_since_maintenance() >= r.maintenance_every:
                        comp.compact()
                        comp.expire_snapshots(keep_last=32)
        return run

    # N declared rollups each fold into their OWN summary table (and
    # its companions) from the same immutable feed — overlap them
    # (guide §2.6) when every write target, companions included, is
    # distinct
    targets = [
        p
        for r in out.rollups
        for p in (
            [_norm_path(r.path)]
            + [
                _norm_path(companion_path(r.path, c))
                for c in r.distinct_columns
            ]
        )
    ]
    _run_units(
        [(r.path, _one(r)) for r in out.rollups],
        "rollup-refresh",
        parallel=len(set(targets)) == len(targets),
    )


def _maintain_join_mvs(
    spark: SparkSession,
    config: JobConfig,
    table: ManagedTable,
    window_cache: "ChangeWindowCache | None" = None,
) -> None:
    """Refresh every declared join materialization
    (``output_config.join_mvs``): TARGET ⋈ right_table maintained by
    affected-key recompute from BOTH tables' change feeds
    (operators/join_mv.py) — so a batch upserted into the target AND
    any dimension changes another job landed since the last batch fold
    in together.  The MV is created lazily on the first batch (the
    right table must already exist — fail loudly otherwise, the same
    poison-redelivery trade as rollup group-column validation:
    surfaced at the first batch, not parse time, because the dimension
    may be provisioned by a different job)."""
    out = config.output_config
    if not out.join_mvs:
        return
    from .operators.join_mv import (  # noqa: PLC0415
        create_join_mv,
        refresh_join_mv,
    )

    def _one(j):
        def run():
            right = ManagedTable.load(spark, j.right_table)
            if ManagedTable.exists(j.path):
                mv = ManagedTable.load(spark, j.path)
            else:
                mv = create_join_mv(
                    table, right, j.path, on=j.on,
                    left_cols=j.left_columns or None,
                    right_cols=j.right_columns or None,
                    consume_from=(1, 1),
                )
            refresh_join_mv(
                table, right, mv, on=j.on, window_cache=window_cache
            )
            if j.maintenance_every and (
                mv.data_commits_since_maintenance() >= j.maintenance_every
            ):
                mv.compact()
                # the MV consumes its SOURCES' feeds and carries no
                # tags — only recent history matters (crash diagnostics)
                mv.expire_snapshots(keep_last=32)
        return run

    # N declared MVs each write their OWN table — overlap them (guide
    # §2.6) when targets are distinct AND no MV's target doubles as
    # another MV's right-table read (that MV must see the fold land
    # first, exactly as the serial order guaranteed)
    paths = [_norm_path(j.path) for j in out.join_mvs]
    rights = {_norm_path(j.right_table) for j in out.join_mvs}
    _run_units(
        [(j.path, _one(j)) for j in out.join_mvs],
        "join-mv-refresh",
        parallel=(
            len(set(paths)) == len(paths) and not (set(paths) & rights)
        ),
    )


def _maintain_topk_mvs(
    spark: SparkSession,
    config: JobConfig,
    table: ManagedTable,
    window_cache: "ChangeWindowCache | None" = None,
) -> None:
    """Refresh every declared top-k materialization
    (``output_config.topk_mvs``) from the target table's change feed
    (operators/topk_mv.py) — insert-only batches fold against the
    groups' current top-k; batches with retractions rescan only the
    touched groups.  Created lazily on the first batch with
    consume_from=1 so pre-existing table content bootstraps in."""
    out = config.output_config
    if not out.topk_mvs:
        return
    from .operators.topk_mv import (  # noqa: PLC0415
        create_topk_mv,
        refresh_topk_mv,
    )

    def _one(tk):
        def run():
            ids = tk.id_columns or [
                c for c in out.key_columns if c not in tk.group_columns
            ]
            kw = dict(
                group_cols=tk.group_columns,
                order_col=tk.order_column,
                k=tk.k,
                id_cols=ids,
                payload_cols=tk.payload_columns or None,
                descending=tk.descending,
            )
            if ManagedTable.exists(tk.path):
                mv = ManagedTable.load(spark, tk.path)
            else:
                mv = create_topk_mv(table, tk.path, consume_from=1, **kw)
            refresh_topk_mv(table, mv, window_cache=window_cache, **kw)
            if tk.maintenance_every and (
                mv.data_commits_since_maintenance() >= tk.maintenance_every
            ):
                mv.compact()
                # keep the tag-replay window's witnesses, like rollups
                mv.expire_snapshots(keep_last=32)
        return run

    # N declared top-k MVs each write their OWN table — overlap them
    # (guide §2.6) under the distinct-target guard
    paths = [_norm_path(tk.path) for tk in out.topk_mvs]
    _run_units(
        [(tk.path, _one(tk)) for tk in out.topk_mvs],
        "topk-refresh",
        parallel=len(set(paths)) == len(paths),
    )


def _audited_write(
    spark: SparkSession,
    config: JobConfig,
    table: ManagedTable,
    df: DataFrame,
    batch_tag: str | None = None,
) -> tuple[int, bool]:
    """Write-audit-publish for one batch (``output_config.audit``):
    stage → constraint gate → publish, with the configured rejection
    policy.  Returns (version, accepted).

    ``batch_tag`` (the source-file digest) makes the quarantine append
    exactly-once under redelivery: a crash after the quarantine landed
    but before the stage was discarded replays the batch, hits the tag
    guard, and skips the duplicate forensic row.  The crashed run's
    stage itself is left behind (its id is unknowable on replay) —
    ``list_staged`` surfaces it for age-based cleanup."""
    from .table import AuditFailedError  # noqa: PLC0415

    out = config.output_config
    aud = out.audit
    sid = table.stage(df, mode=out.mode)
    refs = {
        name: spark.read.parquet(path) for name, path in aud.refs.items()
    }
    try:
        v = table.publish_staged(
            sid, rules=aud.rules, refs=refs or None, audit_what=aud.view
        )
        return v, True
    except AuditFailedError as e:
        failed = "; ".join(
            f"{r['rule_id']}={r['n_violations']}"
            for r in e.report
            if r["n_violations"]
        )
        try:
            if aud.on_fail == "quarantine":
                # land the offending batch (the staged delta — post-
                # transform, pre-publish) in the side table, annotated
                # with what fired; append BEFORE discarding the stage,
                # which still owns the parquet being read
                from pyspark.sql import functions as F  # noqa: PLC0415
                from pyspark.sql import types as T  # noqa: PLC0415

                qdf = table.read_staged(sid, what="delta").withColumn(
                    "_audit_failures", F.lit(failed)
                )
                qschema = T.StructType(
                    list(table.meta.schema.fields)
                    + [T.StructField("_audit_failures", T.StringType(), True)]
                )
                qt = ManagedTable.create_if_absent(
                    spark, aud.quarantine_path, qschema,
                    compression=table.meta.compression,
                )
                # the quarantine contract follows the TARGET's: a batch
                # whose evolution added/widened columns must not have
                # them silently dropped (or ANSI-cast narrower, which
                # can throw mid-append) by a schema pinned at the side
                # table's first creation
                qt.evolve_schema(qschema)
                qtag = (
                    f"audit-quarantine-{batch_tag}" if batch_tag else None
                )
                if qtag is None or not qt.has_commit_tag(
                    qtag, max_scan=64
                ):
                    qt.append(qdf, tag=qtag)
        finally:
            # a quarantine failure must not leak the staged snapshot —
            # its data roots are GC-protected while the doc lives
            table.discard_staged(sid)
        if aud.on_fail == "fail":
            raise
        log.warning(
            "audit rejected batch (%s): %s — %s",
            aud.on_fail, failed, "quarantined" if aud.on_fail == "quarantine"
            else "dropped",
        )
        return table._current_version(), False


def _maintain_indexes(
    spark, config: JobConfig, df, files: list[str], deletes=None,
    phases_out: dict | None = None,
) -> None:
    """Fold the batch into every declared secondary index
    (``output_config.indexes``), MODE-AWARE so the index tracks the
    table instead of diverging from it:

    - ``append``: plain incremental index append.
    - ``merge``: remove-then-append (``replace=True``) — an updated
      document's old postings are tombstoned first, so terms its new
      version dropped never linger, and the additive stats count each
      live doc once.
    - ``overwrite``: the index rebuilds from scratch (bm25: postings
      overwritten + stats reset; ivf: fresh centroids + assignments).
    - CDC deletes propagate: the deleted keys are un-indexed in the
      same batch step that removes them from the table.

    The batch tag is the md5 of the sorted source-file list, so a
    REPLAYED batch (crash between sink write and source commit) hits
    the search index's tag guard and never double-counts its additive
    stats; ivf appends are keyed upserts needing no tag."""
    if not config.output_config.indexes:
        return
    import hashlib  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    mode = config.output_config.mode
    out = config.output_config
    tag = hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()
    if mode == "merge":
        # table.merge dedups the batch by recency internally — the
        # indexed frame must see the SAME one-row-per-key batch, or a
        # batch carrying two versions of a key would double-count the
        # doc in the additive stats and write conflicting postings.
        # OutputConfig validates at parse time that merge-mode indexes
        # configure order_column, so the deterministic dedup_latest
        # rule is shared with table.merge; the dropDuplicates fallback
        # only fires when the order column is configured but absent
        # from this batch's frame (table.merge then keeps duplicate
        # rows at one commit seq — the index at least counts each doc
        # once).
        from .operators.merge import dedup_latest  # noqa: PLC0415

        keys = list(out.key_columns)
        if keys and out.order_column and out.order_column in df.columns:
            df = dedup_latest(df, keys, out.order_column)
        elif keys:
            df = df.dropDuplicates(keys)
    import time as _time  # noqa: PLC0415

    def _fold_one(ix) -> float:
        _ix_t0 = _time.perf_counter()
        if ix.type == "bm25":
            from .operators.search_index import (  # noqa: PLC0415
                append_to_search_index,
                rebuild_search_index,
                remove_documents_bulk,
            )

            if mode == "overwrite":
                rebuild_search_index(
                    spark, ix.path, df,
                    text_col=ix.text_column, id_col=ix.id_column,
                )
            else:
                append_to_search_index(
                    spark, ix.path, df,
                    text_col=ix.text_column, id_col=ix.id_column,
                    batch_tag=f"job-{tag}",
                    replace=(mode == "merge"),
                )
            if deletes is not None:
                remove_documents_bulk(
                    spark, ix.path, deletes.select(ix.id_column),
                    id_col=ix.id_column,
                )
            if ix.maintenance_every:
                from .operators.search_index import (  # noqa: PLC0415
                    compact_search_index,
                    load_search_index,
                )

                pt, _ = load_search_index(spark, ix.path)
                if (
                    pt.data_commits_since_maintenance()
                    >= ix.maintenance_every
                ):
                    compact_search_index(spark, ix.path)
        elif ix.type == "ivf":
            from .operators.ann_index import (  # noqa: PLC0415
                append_to_ivf_index,
                build_ivf_index,
            )
            from .table import ManagedTable  # noqa: PLC0415

            if mode == "overwrite" or not ManagedTable.exists(
                os.path.join(ix.path, "assignments")
            ):
                # fresh fit: bootstrap AND full-overwrite rebuilds
                build_ivf_index(
                    spark, ix.path, df, k=ix.ivf_cells,
                    id_col=ix.id_column, vec_col=ix.vector_column,
                )
            else:
                # keyed upsert — merge-mode updates replace in place
                append_to_ivf_index(
                    spark, ix.path, df,
                    id_col=ix.id_column, vec_col=ix.vector_column,
                )
                if ix.maintenance_every:
                    from .operators.ann_index import (  # noqa: PLC0415
                        load_ivf_index,
                        max_cell_share,
                        rebuild_ivf_index,
                    )

                    _, at = load_ivf_index(spark, ix.path)
                    if (
                        at.data_commits_since_maintenance()
                        >= ix.maintenance_every
                    ):
                        # drift-triggered REFIT: when the largest cell
                        # outgrows the configured share, centroids no
                        # longer partition the corpus and probe pruning
                        # degrades — rebuild from the stored vectors;
                        # otherwise plain cell-clustered compaction
                        # (which restores read_where_in's fast path)
                        if ix.rebuild_max_cell_share and (
                            max_cell_share(spark, ix.path)
                            > ix.rebuild_max_cell_share
                        ):
                            rebuild_ivf_index(spark, ix.path)
                            _, at = load_ivf_index(spark, ix.path)
                        at.compact(cluster_by=["cell_id"])
            if deletes is not None:
                from .operators.ann_index import load_ivf_index  # noqa: PLC0415

                _, at = load_ivf_index(spark, ix.path)
                at.delete_keys(
                    deletes.select(
                        F.col(ix.id_column).cast("long").alias("vec_id")
                    )
                )
        else:  # "minhash" — validated at config parse
            _maintain_minhash_index(spark, ix, df, mode, deletes)
        return _time.perf_counter() - _ix_t0

    ixs = list(config.output_config.indexes)
    # Independent index folds overlap: each targets its OWN table
    # (disjoint snapshot state), and Spark schedules jobs submitted
    # from separate driver threads concurrently — with 3 declared
    # indexes the serial critical path was ~the sum of three folds.
    # Parallel only when every path is distinct (two declared indexes
    # sharing a path would race their table commits); errors surface
    # after ALL folds settle — completed folds are tag/keyed-upsert
    # idempotent, so the batch redelivery that follows re-runs them
    # harmlessly.
    elapsed: dict[int, float] = {}
    if len(ixs) >= 2 and len({ix.path for ix in ixs}) == len(ixs):
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(
            max_workers=len(ixs), thread_name_prefix="index-fold"
        ) as pool:
            futs = [pool.submit(_fold_one, ix) for ix in ixs]
            first_err: Exception | None = None
            for i, fut in enumerate(futs):
                try:
                    elapsed[i] = fut.result()
                except Exception as e:  # noqa: BLE001
                    if first_err is None:
                        first_err = e
                    else:
                        log.warning(
                            "additional index fold failure (%s): %s",
                            ixs[i].path, e,
                        )
        if first_err is not None:
            raise first_err
    else:
        for i, ix in enumerate(ixs):
            elapsed[i] = _fold_one(ix)
    if phases_out is not None:
        for i, dt in elapsed.items():
            k = f"index_{ixs[i].type}"
            phases_out[k] = round(phases_out.get(k, 0.0) + dt, 3)


_PAIRS_SCHEMA_DDL = (
    "doc_id_a long, doc_id_b long, jaccard double"
)


def _maintain_minhash_index(spark, ix, df, mode: str, deletes) -> None:
    """Fold one ingested batch into a declared ``minhash`` near-dup
    index: the MinHash-LSH signature table of streaming/neardup.py,
    maintained from the BATCH ingest path instead of a stream, plus an
    optional keyed pairs-log table — the ingest-time duplicate alarm.

    Mode mapping (why it differs from bm25's):

    - ``append``/``merge``: one ``table.merge`` keyed on id.  Unlike
      BM25 postings — keyed (term, doc_id), where a shrunken document
      leaves stale term rows unless removed first — the signature
      index holds exactly ONE row per doc, so a merge-mode update
      replaces the signature wholesale and no remove-then-append
      dance is needed.
    - ``overwrite``: the signature table is truncated and the full
      frame re-processed against the now-empty index, so the emitted
      pairs are the corpus SELF-dedup (within-frame band collisions
      are generated by design: candidates join new ∪ old keys).
    - CDC deletes tombstone the victims' signatures in the same batch
      step (``remove_documents``): a deleted doc must stop pairing —
      its signatures would still pass exact verification.

    Replay safety needs no batch tag: the signature merge is a keyed
    upsert (idempotent), and the pairs log is itself a keyed MOR table
    on the canonical (doc_id_a < doc_id_b) pair, so a redelivered
    batch's recomputed pairs resolve to one row per pair at read time.
    The log records DETECTION events — a pair's jaccard reflects the
    texts at detection; it is not rewritten when a member is later
    updated or deleted (consumers join against live docs).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    from .streaming.neardup import (  # noqa: PLC0415
        _NUM_HASHES,
        _index_schema,
        process_near_dup_batch_table,
        remove_documents,
    )
    from .table import ManagedTable  # noqa: PLC0415

    table = ManagedTable.create_if_absent(
        spark,
        ix.path,
        _index_schema(_NUM_HASHES),
        key_cols=["id"],
        table_type="MOR",
        properties={"write.max-delta-files": "4"},
    )
    pt = None
    if ix.pairs_path:
        pt = ManagedTable.create_if_absent(
            spark,
            ix.pairs_path,
            T.StructType.fromDDL(_PAIRS_SCHEMA_DDL),
            key_cols=["doc_id_a", "doc_id_b"],
            table_type="MOR",
            # trigger-bounded pair deltas: same file-count bound as the
            # signature table, folded at the same cadence below
            properties={"write.max-delta-files": "4"},
        )
    if mode == "overwrite":
        # rebuild: empty index, then one batch-vs-empty process below —
        # the pairs that come back are the corpus self-dedup
        table.overwrite(
            spark.createDataFrame([], _index_schema(_NUM_HASHES))
        )
    # deletes apply BEFORE pair generation: a doc deleted in THIS batch
    # must not pair either (its signature would still pass exact
    # verification) — the CDC split guarantees a deleted key is never
    # in df, so tombstoning first loses nothing
    if deletes is not None:
        remove_documents(
            table,
            deletes.select(
                F.col(ix.id_column).cast("long").alias(ix.id_column)
            ),
            id_col=ix.id_column,
        )
    # all-deletes CDC batches (and header-only files) arrive EMPTY:
    # processing one would commit a rowless, stats-less delta that
    # flips every later disjointness proof to the slow path — and
    # there is nothing to index anyway.  (With >=2 indexes df is
    # already localCheckpointed, so the probe is a cached lookup.)
    if not df.isEmpty():
        if pt is None:
            # signature-only maintenance: no pair emission requested,
            # so candidate generation + verification are skipped
            # entirely — just the keyed signature upsert (ad-hoc
            # consumers query the table directly)
            from .streaming.neardup import (  # noqa: PLC0415
                _batch_signatures,
            )

            table.merge(
                _batch_signatures(
                    df, ix.text_column, ix.id_column, 3, _NUM_HASHES
                )
            )
        else:
            pairs = process_near_dup_batch_table(
                df, table,
                text_col=ix.text_column, id_col=ix.id_column,
                threshold=ix.minhash_threshold,
            )
            if mode == "overwrite":
                pt.overwrite(pairs)
            else:
                pt.merge(pairs)
    if ix.maintenance_every and (
        table.data_commits_since_maintenance() >= ix.maintenance_every
    ):
        # fold merge deltas + tombstones; band-key pruning at scale
        # comes from _collision_candidates' broadcast semi-restrict,
        # not file skipping, so no cluster_by is needed here
        table.compact()
        if pt is not None:
            # the pairs log accumulates one keyed delta per detecting
            # batch — fold it at the same cadence so replay-dedup
            # resolution stays bounded over the ingest's lifetime
            pt.compact()


def forget_keys(spark, config: JobConfig, ids) -> int:
    """Takedown / right-to-be-forgotten: remove the given key values
    from the target table AND every declared secondary index in one
    call — the compliance flow a lakehouse deployment runs when a
    document must disappear, not just stop being served.

    ``ids``: a DataFrame carrying the table's key column(s) (extra
    columns ignored).  Per surface:

    - table: ``delete_keys`` — MOR keyed tombstone delta, O(ids).
    - bm25 index: ``remove_documents_bulk`` — posting tombstones plus
      ONE tag-guarded negative stats row (idempotent under re-runs).
    - ivf index: assignments ``delete_keys`` on vec_id.
    - minhash index: ``remove_documents`` signature tombstones, AND
      the pairs log is SCRUBBED — any logged pair referencing a
      forgotten doc is tombstoned, because a takedown usually demands
      that references disappear too, not only the document row (the
      normal delete path deliberately leaves the detection log
      intact; see _maintain_minhash_index).
    - declared CDC exports (``output_config.cdc_exports``): the
      takedown's delete window is PUBLISHED first — so tailing
      replicas receive the removal — then every retained window is
      scrubbed (``scrub_export_windows``): the forgotten keys'
      insert/pre/post rows are dropped and their delete rows' payloads
      nulled, leaving no forgotten payload anywhere under the export
      directory while window names, stamps, and all other rows stay
      identical.  NOTE the propagation boundary: the delete window
      propagates LIVE state, not history — a replica synced BEFORE
      the takedown holds the rows until it tails that window, and a
      replica that never tails again (or was decommissioned) needs its
      own ``forget_keys`` run.

    Everything lands as keyed MOR tombstones / tagged appends, so a
    crashed or re-run forget converges (re-deletes are no-ops, the
    stats decrement is tag-guarded, the export scrub journals each
    window swap).  Cost is O(ids + matching pairs + hit export
    windows), never an O(table) rewrite on MOR surfaces; ``compact()``
    at the next maintenance folds the tombstones away.  Re-ingesting a
    forgotten id later revives it everywhere (newer commit seq), which
    is the documented semantic of every removal path here.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    out = config.output_config
    keys = list(out.key_columns)
    if not keys:
        raise ValueError("forget_keys requires output_config.key_columns")
    table = ManagedTable.load(spark, out.table_path)
    version = table.delete_keys(ids.select(*keys))
    for ix in out.indexes:
        vids = ids.select(
            F.col(ix.id_column).cast("long").alias(ix.id_column)
        )
        if ix.type == "bm25":
            from .operators.search_index import (  # noqa: PLC0415
                remove_documents_bulk,
            )

            remove_documents_bulk(spark, ix.path, vids, id_col=ix.id_column)
        elif ix.type == "ivf":
            from .operators.ann_index import load_ivf_index  # noqa: PLC0415

            _, at = load_ivf_index(spark, ix.path)
            at.delete_keys(
                vids.select(F.col(ix.id_column).alias("vec_id"))
            )
        else:  # minhash
            from .streaming.neardup import remove_documents  # noqa: PLC0415

            mh = ManagedTable.load(spark, ix.path)
            remove_documents(mh, vids, id_col=ix.id_column)
            if ix.pairs_path and ManagedTable.exists(ix.pairs_path):
                pt = ManagedTable.load(spark, ix.pairs_path)
                # pairs referencing a forgotten doc: the a-side filter
                # rides the manifest stats on the key column doc_id_a;
                # the b-side pays a scan of the (bounded, compacted)
                # pairs log — a takedown is not a hot path
                idl = vids.select(
                    F.col(ix.id_column).cast("long").alias("_fid")
                )
                hit = (
                    pt.read()
                    .join(
                        F.broadcast(idl),
                        (F.col("doc_id_a") == F.col("_fid"))
                        | (F.col("doc_id_b") == F.col("_fid")),
                        "left_semi",
                    )
                    .select("doc_id_a", "doc_id_b")
                )
                pt.delete_keys(hit)
    if out.cdc_exports:
        from .operators.cdc_export import (  # noqa: PLC0415
            _recover_forget,
            export_changes,
            export_exists,
            scrub_export_windows,
        )

        for e in out.cdc_exports:
            if export_exists(e.path):
                # forget_keys IS the scrub launcher (single-maintainer
                # scrub role), so a PRIOR run's crashed window swap is
                # recovered here FIRST — export_changes below is a
                # reader-path cursor probe that would otherwise refuse
                # on the broken chain, deadlocking the documented
                # "re-run forget_keys" remedy on itself
                _recover_forget(e.path)
                # publish the takedown's delete window BEFORE the scrub
                # (tailing replicas must receive the removal); the
                # scrub then nulls the fresh delete rows' pre-image
                # payloads along with all retained history
                export_changes(table, e.path)
                scrub_export_windows(spark, e.path, ids.select(*keys), keys)
    return version


def _maybe_maintain(table: ManagedTable, config: JobConfig) -> int | None:
    """Inline declarative maintenance (output_config.maintenance):
    compact — optionally Z-order-clustered — every Nth committed
    version, then optionally expire old snapshots.  Returns the new
    current version when maintenance ran, else None.

    This is what keeps a forever-running CDC ingest readable at scale
    without an external scheduler: bounded file counts, tight footer
    stats on the clustered columns, bounded snapshot history."""
    m = config.output_config.maintenance
    if not m.compact_every:
        return None
    # count data commits since the last compact (not raw versions —
    # maintenance commits advance the version too, skewing the modulus)
    if table.data_commits_since_maintenance() < m.compact_every:
        return None
    done = None
    nothing_small = False
    if config.output_config.mode == "append" and not (
        m.zorder_by or m.target_partitions
    ):
        # append-only cadence: binpack only the small roots —
        # O(small files), never the O(table) full rewrite
        if table.binpack_eligible():
            done = table.compact_small(
                max_entry_bytes=m.compact_small_bytes
            )
            # eligible but nothing small to fold: file counts are
            # already bounded — a full O(table) rewrite would be pure
            # waste, so skip the compact (but NOT the snapshot expiry
            # below: skipping it too would leave history growing
            # unboundedly for as long as no file dips under the
            # threshold, since no maintenance commit ever lands to
            # reset the cadence counter).  In that state the cadence
            # check re-fires every batch — deliberate: the re-probe is
            # an O(manifest entries) stat pass and the expiry a glob
            # over <= keep_last retained snapshots, both driver-cheap
            # and bounded, while the alternative (a no-op maintenance
            # marker commit) would split every consumer's change
            # window for nothing
            nothing_small = done is None
        # ineligible shapes (partitioned layout, overlapping keys,
        # pending deltas) keep the full compact below
    if done is None and not nothing_small:
        table.compact(
            target_partitions=m.target_partitions,
            zorder_by=m.zorder_by or None,
        )
    if m.expire_keep_last:
        table.expire_snapshots(keep_last=m.expire_keep_last)
    if nothing_small and not m.expire_keep_last:
        return None
    return table._current_version()


def run_sqs_loop(
    spark: SparkSession,
    config: JobConfig,
    source: SqsFileSource | None = None,
    max_polls: int | None = None,
) -> int:
    """Queue-notification ingest loop (reference:
    spark-job/read.py:330-350), with the T5 per-batch commit fix.
    ``max_polls`` bounds the loop for tests; ``None`` runs forever."""
    inp = config.input_config
    if source is None:
        source = SqsFileSource(inp.queue_url or "", batch_size=inp.batch_size)
    polls = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        batch = source.poll()
        if batch.files:
            try:
                process_files(spark, config, batch.files)
            except Exception:
                log.exception("batch failed; not committing %d messages", len(batch.receipt_handles))
                continue  # messages redeliver after visibility timeout
            if inp.commit_checkpoint:
                source.commit(batch)
        elif batch.receipt_handles:
            # Poison/noise messages (s3:TestEvent, malformed bodies,
            # non-S3 notifications) parse to zero file URIs.  Nothing
            # was processed, so deleting them is safe — without this
            # they redeliver forever after every visibility timeout.
            log.warning(
                "committing %d messages that yielded no file URIs",
                len(batch.receipt_handles),
            )
            if inp.commit_checkpoint:
                source.commit(batch)
        if max_polls is None or polls < max_polls:
            time.sleep(inp.poll_interval if batch.files == [] else 0)
    return polls

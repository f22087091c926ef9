"""The replication consumer as a declarable, streamable surface
(VERDICT r11 #1): ``input_config.type: "cdc_export"`` +
``job.run_replica_sync`` (the batch loop) and
``streaming.start_streaming_replica_sync`` (the trigger-clock twin) —
one job JSON now declares BOTH halves of a replication pipeline, the
consumer-side mirror of the reference's declarative job file
(spark-job/job.json:1-39).

Pinned: an end-to-end producer-job → export → consumer-job sync across
insert/upsert/delete CDC batches; replica-local derived families
(rollups) maintained off the replica's own change feed; kill/restart
of the streaming twin proving the replica cursor (not the stream
checkpoint) makes re-delivery exactly-once; parse-time validation of
the consumer job spec."""

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
    _APPLY_KEY,
    create_change_export,
    export_changes,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("Op", T.StringType()),
    ]
)


def _write_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("id\tgrp\tv\tseq\tOp\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def _producer_cfg(tmp):
    return JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {
                    "header": "true", "sep": "\t", "inferSchema": "true",
                },
            },
            "output_config": {
                "table_path": f"{tmp}/tbl",
                "mode": "merge",
                "table_type": "MOR",
                "key_columns": ["id"],
                "order_column": "seq",
                "cdc_delete_values": ["D"],
                "cdc_exports": [{"path": f"{tmp}/export"}],
            },
        }
    )


def _consumer_cfg(tmp, **extra):
    out = dict(
        {
            "table_path": f"{tmp}/replica",
            "table_type": "MOR",
            "key_columns": ["id"],
            "order_column": "seq",
        },
        **extra.pop("output_extra", {}),
    )
    inp = dict(
        {"type": "cdc_export", "path": f"{tmp}/export", "poll_interval": 0},
        **extra,
    )
    return JobConfig.from_dict(
        {"input_config": inp, "output_config": out}
    )


def _mk_table(spark, tmp):
    return ManagedTable.create(
        spark, f"{tmp}/tbl", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )


def _state(tbl):
    return sorted(
        (r.id, r.grp, r.v)
        for r in tbl.read().select("id", "grp", "v").collect()
    )


def test_job_driven_two_table_sync(spark, tmp_path):
    """Producer job (cdc_exports declared) feeds a consumer job
    (type=cdc_export) — the replica tracks the source across
    insert / upsert / CDC-delete batches, its schema bootstrapped
    from the export anchor (no .avsc on the consumer side)."""
    d = str(tmp_path)
    _mk_table(spark, d)
    pcfg, ccfg = _producer_cfg(d), _consumer_cfg(d)
    batches = [
        [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I"), (3, "b", 7, 1, "I")],
        [(1, "b", 99, 2, "U"), (4, "c", 4, 2, "I")],
        [(2, "a", 5, 3, "D")],
    ]
    for i, rows in enumerate(batches):
        b = f"{d}/b{i}.csv"
        _write_csv(b, rows)
        J.process_files(spark, pcfg, [b])
        J.run_replica_sync(spark, ccfg, max_cycles=1)
        src = ManagedTable.load(spark, f"{d}/tbl")
        rep = ManagedTable.load(spark, f"{d}/replica")
        assert _state(rep) == _state(src)
    # the replica schema came from the anchor: the producer's contract
    # (Op never lands — the CDC split consumes it)
    assert rep.meta.schema.fieldNames() == [
        f.name for f in SCHEMA.fields
    ]
    # a quiet cycle advances nothing
    v = rep._current_version()
    J.run_replica_sync(spark, ccfg, max_cycles=1)
    assert ManagedTable.load(spark, f"{d}/replica")._current_version() == v


def test_replica_job_maintains_local_rollup(spark, tmp_path):
    """Derived families compose on the consumer side: a rollup
    declared on the REPLICA job is maintained off the replica's own
    change feed, matching a recomputation over the replica."""
    d = str(tmp_path)
    _mk_table(spark, d)
    pcfg = _producer_cfg(d)
    ccfg = _consumer_cfg(
        d,
        output_extra={
            "rollups": [
                {
                    "path": f"{d}/rep_rollup",
                    "group_columns": ["grp"],
                    "sum_columns": ["v"],
                }
            ]
        },
    )
    batches = [
        [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I"), (3, "b", 7, 1, "I")],
        [(1, "b", 99, 2, "U")],
        [(3, "b", 7, 3, "D")],
    ]
    for i, rows in enumerate(batches):
        b = f"{d}/b{i}.csv"
        _write_csv(b, rows)
        J.process_files(spark, pcfg, [b])
        J.run_replica_sync(spark, ccfg, max_cycles=1)
    rep = ManagedTable.load(spark, f"{d}/replica")
    ru = ManagedTable.load(spark, f"{d}/rep_rollup")
    got = {
        r.grp: (r.n_rows, r.sum_v)
        for r in ru.read().collect()
        if r.n_rows > 0
    }
    expect = {
        r.grp: (r.n, r.s)
        for r in rep.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == expect


def test_cascading_replication_two_hops(spark, tmp_path):
    """Fan-out composes into CHAINS: a consumer job may itself declare
    cdc_exports, so its replica re-exports every applied change and a
    second-tier consumer mirrors the first — source -> replica1 ->
    replica2 across insert / upsert / delete cycles, each hop driven
    by the same declarative spec (the cascade VERDICT r11 #1 predicted
    'for free'; this pins it)."""
    d = str(tmp_path)
    _mk_table(spark, d)
    pcfg = _producer_cfg(d)
    c1 = _consumer_cfg(
        d, output_extra={"cdc_exports": [{"path": f"{d}/export2"}]}
    )
    c2 = JobConfig.from_dict(
        {
            "input_config": {
                "type": "cdc_export", "path": f"{d}/export2",
                "poll_interval": 0,
            },
            "output_config": {
                "table_path": f"{d}/replica2",
                "table_type": "MOR",
                "key_columns": ["id"],
                "order_column": "seq",
            },
        }
    )
    batches = [
        [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I")],
        [(1, "b", 99, 2, "U"), (3, "c", 7, 2, "I")],
        [(2, "a", 5, 3, "D")],
    ]
    for i, rows in enumerate(batches):
        b = f"{d}/c{i}.csv"
        _write_csv(b, rows)
        J.process_files(spark, pcfg, [b])
        J.run_replica_sync(spark, c1, max_cycles=1)
        J.run_replica_sync(spark, c2, max_cycles=1)
        src = ManagedTable.load(spark, f"{d}/tbl")
        r2 = ManagedTable.load(spark, f"{d}/replica2")
        assert _state(r2) == _state(src), f"hop-2 diverged at batch {i}"
    assert _state(ManagedTable.load(spark, f"{d}/replica")) == _state(src)


def test_run_replica_sync_first_cycle_recovers_stale_families(
    spark, tmp_path
):
    """Review finding (r12): a crash between the apply (cursor durably
    advanced) and the family refreshes must not leave replica-local
    rollups stale for as long as the producer stays quiet — the first
    cycle of a run refreshes unconditionally (idempotent via the
    families' own cursors)."""
    from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
        sync_from_export,
    )

    d = str(tmp_path)
    _mk_table(spark, d)
    pcfg = _producer_cfg(d)
    ccfg = _consumer_cfg(
        d,
        output_extra={
            "rollups": [
                {
                    "path": f"{d}/rep_rollup",
                    "group_columns": ["grp"],
                    "sum_columns": ["v"],
                }
            ]
        },
    )
    _write_csv(f"{d}/b0.csv", [(1, "a", 10, 1, "I"), (2, "b", 5, 1, "I")])
    J.process_files(spark, pcfg, [f"{d}/b0.csv"])
    # bootstrap the replica + rollup tables, then simulate the crash:
    # apply a window DIRECTLY (cursor advances) with no family refresh
    J.run_replica_sync(spark, ccfg, max_cycles=1)
    _write_csv(f"{d}/b1.csv", [(3, "a", 7, 2, "I")])
    J.process_files(spark, pcfg, [f"{d}/b1.csv"])
    rep = ManagedTable.load(spark, f"{d}/replica")
    sync_from_export(spark, f"{d}/export", rep)  # the "crashed" cycle
    stale = {
        r.grp: r.sum_v
        for r in ManagedTable.load(spark, f"{d}/rep_rollup").read().collect()
    }
    assert stale == {"a": 10.0, "b": 5.0}  # rollup missed the window
    # restart: the producer is QUIET, yet the first cycle must heal
    J.run_replica_sync(spark, ccfg, max_cycles=1)
    got = {
        r.grp: r.sum_v
        for r in ManagedTable.load(spark, f"{d}/rep_rollup").read().collect()
    }
    assert got == {"a": 17.0, "b": 5.0}


def test_replica_job_missing_export_is_loud(spark, tmp_path):
    ccfg = _consumer_cfg(str(tmp_path))
    with pytest.raises(ValueError, match="not a provisioned change export"):
        J.run_replica_sync(spark, ccfg, max_cycles=1)


def test_streaming_replica_sync_fails_fast_on_mispaired_policy(
    spark, tmp_path
):
    """Review finding (r12): the pre-start fail-fast must include the
    policy-pairing check, not just the bootstrap refusals — a
    mispaired latest_wins replica would otherwise die with a buried
    first-trigger exception."""
    from s3_sqs_data_ingestion_demo_spark.streaming import (
        start_streaming_replica_sync,
    )

    d = str(tmp_path)
    src = ManagedTable.create(  # unconditional source
        spark, f"{d}/src", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    rep = ManagedTable.create(
        spark, f"{d}/rep", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR", merge_policy="latest_wins",
    )
    ex = f"{d}/export"
    create_change_export(src, ex)
    with pytest.raises(ValueError, match="latest_wins replica"):
        start_streaming_replica_sync(spark, ex, rep)


def test_consumer_job_config_validation():
    base = {
        "input_config": {"type": "cdc_export", "path": "/e"},
        "output_config": {"table_path": "/r", "key_columns": ["id"]},
    }
    JobConfig.from_dict(base)  # minimal valid spec
    with pytest.raises(ValueError, match="requires path"):
        JobConfig.from_dict(
            {
                "input_config": {"type": "cdc_export"},
                "output_config": {"table_path": "/r", "key_columns": ["id"]},
            }
        )
    with pytest.raises(ValueError, match="key_columns"):
        JobConfig.from_dict(
            {
                "input_config": {"type": "cdc_export", "path": "/e"},
                "output_config": {"table_path": "/r"},
            }
        )
    with pytest.raises(ValueError, match="mode"):
        JobConfig.from_dict(
            {
                "input_config": {"type": "cdc_export", "path": "/e"},
                "output_config": {
                    "table_path": "/r",
                    "mode": "append",
                    "key_columns": ["id"],
                },
            }
        )
    for bad in (
        {"input_config": {"transform_query": "SELECT 1"}},
        {"input_config": {"schema_file": "/s.avsc"}},
        {"input_config": {"queue_url": "q"}},
        {"input_config": {"options": {"header": "true"}}},
        {"output_config": {"cdc_delete_values": ["D"]}},
        {"output_config": {"schema_evolution": True}},
        {
            "output_config": {
                "indexes": [{"type": "bm25", "path": "/ix"}],
                "order_column": "seq",
            }
        },
    ):
        doc = {
            "input_config": dict(
                {"type": "cdc_export", "path": "/e"},
                **bad.get("input_config", {}),
            ),
            "output_config": dict(
                {"table_path": "/r", "key_columns": ["id"]},
                **bad.get("output_config", {}),
            ),
        }
        with pytest.raises(ValueError, match="not supported on a cdc_export"):
            JobConfig.from_dict(doc)
    # families on a COW replica refuse (mode != 'merge' is refused
    # outright above, so only the default-mode path remains reachable)
    with pytest.raises(ValueError, match="table_type='MOR'"):
        JobConfig.from_dict(
            {
                "input_config": {"type": "cdc_export", "path": "/e"},
                "output_config": {
                    "table_path": "/r",
                    "key_columns": ["id"],
                    "rollups": [
                        {"path": "/ru", "group_columns": ["g"]}
                    ],
                },
            }
        )
    with pytest.raises(ValueError, match="run_replica_sync requires"):
        J.run_replica_sync(
            None,
            JobConfig.from_dict(
                {"input_config": {}, "output_config": {"table_path": "/x"}}
            ),
        )


STREAM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, STREAM_SCHEMA)


def _await_sync(rep, cursor, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        fresh = ManagedTable.load(rep.spark, rep.path)
        if int(fresh.meta.properties.get(_APPLY_KEY, 0)) >= cursor:
            return fresh
        time.sleep(0.5)
    raise AssertionError(f"replica never reached cursor {cursor}")


def test_streaming_replica_sync_kill_restart_exactly_once(
    spark, tmp_path
):
    """The streaming twin: a rate-clock trigger loop around
    sync_from_export.  Kill the query mid-pipeline, publish more
    source windows, restart WITHOUT a checkpoint — the replica's
    durable cursor alone makes re-delivery exactly-once (the already-
    applied prefix adds zero new replica commits on restart)."""
    from s3_sqs_data_ingestion_demo_spark.streaming import (
        start_streaming_replica_sync,
    )

    d = str(tmp_path)
    src = ManagedTable.create(
        spark, f"{d}/src", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    rep = ManagedTable.create(
        spark, f"{d}/rep", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    ex = f"{d}/export"
    create_change_export(src, ex)
    src.append(_rows(spark, [(1, "a", 1, 1), (2, "a", 2, 1)]))
    c1 = export_changes(src, ex)[1]
    q = start_streaming_replica_sync(
        spark, ex, rep, poll_interval=1, consumer_id="stream-rep"
    )
    try:
        rep = _await_sync(rep, c1)
    finally:
        q.stop()  # the kill
    assert sorted((r.id, r.v) for r in rep.read().collect()) == [
        (1, 1), (2, 2),
    ]
    v_after_first = rep._current_version()
    # while the consumer is down: an upsert and a delete window land
    src.merge(_rows(spark, [(1, "b", 10, 2), (3, "c", 3, 2)]))
    export_changes(src, ex)
    src.delete_keys(spark.createDataFrame([(2,)], "id int"))
    c3 = export_changes(src, ex)[1]
    # restart — no checkpoint dir was ever set; the cursor is the state
    q2 = start_streaming_replica_sync(
        spark, ex, rep, poll_interval=1, consumer_id="stream-rep"
    )
    try:
        rep = _await_sync(rep, c3)
        assert sorted((r.id, r.v) for r in rep.read().collect()) == [
            (1, 10), (3, 3),
        ]
        # exactly-once accounting: catching up on the two pending
        # windows costs one apply (delete+merge+cursor commits), and a
        # further quiet trigger adds NOTHING
        v_caught_up = rep._current_version()
        time.sleep(2.5)  # at least one more quiet trigger
        fresh = ManagedTable.load(spark, rep.path)
        assert fresh._current_version() == v_caught_up
        assert v_caught_up > v_after_first
    finally:
        q2.stop()
    # the consumer registered its cursor for fan-out-safe retention
    import json

    with open(os.path.join(ex, "_consumers", "stream-rep.json")) as fh:
        assert int(json.load(fh)["cursor"]) == c3


def test_streaming_replica_sync_fails_fast_on_partial_bootstrap(
    spark, tmp_path
):
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        ExpiredCursorError,
    )
    from s3_sqs_data_ingestion_demo_spark.streaming import (
        start_streaming_replica_sync,
    )

    d = str(tmp_path)
    src = ManagedTable.create(
        spark, f"{d}/src", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    src.append(_rows(spark, [(1, "a", 1, 1)]))  # pre-provision row
    ex = f"{d}/export"
    create_change_export(src, ex)  # anchored mid-history
    rep = ManagedTable.create(
        spark, f"{d}/rep", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    with pytest.raises(ExpiredCursorError, match="PARTIAL"):
        start_streaming_replica_sync(spark, ex, rep)

"""Declarative + streaming CDC export (output_config.cdc_exports /
streaming.start_streaming_cdc_export): the outbound connector driven
by the same job spec that maintains every other derived surface.

Pinned here: lazy provisioning with bootstrap (pre-declaration table
content exports as inserts), round-trip (replay of the export ==
final table state) across insert/upsert/delete batches, redelivery
(a replayed batch never double-publishes), the listing-derived
retention and binpack cadences, config validation, and the streaming
twin's exactly-once restarts."""

import os

import pytest
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.operators.cdc_export import (
    list_export_windows,
    read_change_export,
    replay_to_state,
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


def _cfg(tmp, **export_extra):
    return JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {
                    "header": "true",
                    "sep": "\t",
                    "inferSchema": "true",
                },
            },
            "output_config": {
                "table_path": f"{tmp}/tbl",
                "mode": "merge",
                "table_type": "MOR",
                "key_columns": ["id"],
                "order_column": "seq",
                "cdc_delete_values": ["D"],
                "cdc_exports": [dict({"path": f"{tmp}/export"},
                                     **export_extra)],
            },
        }
    )


def _mk_table(spark, tmp):
    return ManagedTable.create(
        spark, f"{tmp}/tbl", SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )


def _state(df):
    return sorted(
        (r.id, r.grp, r.v) for r in df.select("id", "grp", "v").collect()
    )


def test_declared_export_roundtrips_cdc_batches(spark, tmp_path):
    d = str(tmp_path)
    t = _mk_table(spark, d)
    # pre-declaration content must bootstrap into the export as inserts
    t.append(
        spark.createDataFrame([(100, "z", 1, 1, "I")], SCHEMA)
    )
    cfg = _cfg(d)
    b1, b2, b3 = f"{d}/b1.csv", f"{d}/b2.csv", f"{d}/b3.csv"
    _write_csv(b1, [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I")])
    _write_csv(b2, [(1, "b", 99, 2, "U"), (3, "c", 7, 2, "I")])
    _write_csv(b3, [(2, "a", 5, 3, "D")])
    J.process_files(spark, cfg, [b1])
    assert len(list_export_windows(f"{d}/export")) == 1
    J.process_files(spark, cfg, [b2])
    J.process_files(spark, cfg, [b3])
    tbl = ManagedTable.load(spark, f"{d}/tbl")
    replayed = replay_to_state(
        read_change_export(spark, f"{d}/export"), ["id"]
    )
    assert _state(replayed) == _state(tbl.read())
    assert (100, "z", 1) in _state(replayed)  # the bootstrap row

    # redelivered batch: the table merge nets to zero NEW changes only
    # if versions advance — either way the export must keep the
    # round-trip invariant (a replayed window that already exists is
    # skipped, new windows export whatever the redelivery committed)
    J.process_files(spark, cfg, [b2])
    replayed = replay_to_state(
        read_change_export(spark, f"{d}/export"), ["id"]
    )
    assert _state(replayed) == _state(tbl.read())


def test_export_retention_cadence(spark, tmp_path):
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d, keep_last_windows=2)
    for i in range(5):
        b = f"{d}/b{i}.csv"
        _write_csv(b, [(i, "a", i, 1, "I")])
        J.process_files(spark, cfg, [b])
    ws = list_export_windows(f"{d}/export")
    assert len(ws) == 2
    # the retained tail still reads coherently from any in-range cursor
    tail = read_change_export(spark, f"{d}/export", since=ws[0][1])
    assert tail.count() == 1
    # a full read over the pruned export serves only the suffix — and
    # an expired consumer cursor raises rather than serving a gap
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        ExpiredCursorError,
    )

    with pytest.raises(ExpiredCursorError):
        read_change_export(spark, f"{d}/export", since=1)


def test_export_coalesce_cadence(spark, tmp_path):
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d, coalesce_after=2)
    for i in range(5):
        b = f"{d}/b{i}.csv"
        _write_csv(b, [(i, "a", i, 1, "I"), (0, "b", 99, 2 + i, "U")])
        J.process_files(spark, cfg, [b])
    ws = list_export_windows(f"{d}/export")
    # every batch beyond the threshold binpacks all-but-newest: the
    # listing never exceeds coalesce_after + 1 directories
    assert len(ws) <= 3
    tbl = ManagedTable.load(spark, f"{d}/tbl")
    replayed = replay_to_state(
        read_change_export(spark, f"{d}/export"), ["id"]
    )
    assert _state(replayed) == _state(tbl.read())


def test_cdc_export_config_validation():
    with pytest.raises(ValueError, match="need a path"):
        JobConfig.from_dict(
            {
                "input_config": {},
                "output_config": {
                    "table_path": "/x",
                    "cdc_exports": [{"keep_last_windows": 1}],
                },
            }
        )
    with pytest.raises(ValueError, match="keep_last_windows"):
        JobConfig.from_dict(
            {
                "input_config": {},
                "output_config": {
                    "table_path": "/x",
                    "cdc_exports": [{"path": "/e", "keep_last_windows": -1}],
                },
            }
        )
    with pytest.raises(ValueError, match="coalesce_after"):
        JobConfig.from_dict(
            {
                "input_config": {},
                "output_config": {
                    "table_path": "/x",
                    "cdc_exports": [{"path": "/e", "coalesce_after": -2}],
                },
            }
        )


STREAM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _write_stream_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("id,grp,v,seq\n")
        for r in rows:
            fh.write(",".join(map(str, r)) + "\n")


def test_streaming_cdc_export_roundtrip_and_restart(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.streaming import (
        start_streaming_cdc_export,
    )

    d = str(tmp_path)
    land = f"{d}/landing"
    os.makedirs(land)
    src = ManagedTable.create(
        spark, f"{d}/src", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    ex = f"{d}/export"

    def drain():
        q = start_streaming_cdc_export(
            spark, land, STREAM_SCHEMA, src, ex,
            fmt="csv", options={"header": "true"},
            checkpoint_dir=f"{d}/ckpt", available_now=True,
        )
        if not q.awaitTermination(120):
            q.stop()
            raise AssertionError("availableNow trigger timed out")

    _write_stream_csv(f"{land}/f1.csv", [(1, "a", 1, 1), (2, "b", 2, 1)])
    drain()
    assert len(list_export_windows(ex)) >= 1
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert _state(replayed) == _state(src.read())

    # restart with the same checkpoint: f1 must not re-publish; the
    # upsert in f2 must flow through as a change
    _write_stream_csv(f"{land}/f2.csv", [(1, "a", 10, 2), (3, "c", 3, 1)])
    drain()
    replayed = replay_to_state(read_change_export(spark, ex), ["id"])
    assert _state(replayed) == _state(src.read())
    assert (1, "a", 10) in _state(replayed)

    # drain with nothing new: the export gains no data windows
    before = list_export_windows(ex)
    drain()
    assert list_export_windows(ex) == before


def test_streaming_cdc_export_cadences(spark, tmp_path):
    """The streaming twin applies the same listing-derived retention
    cadence per trigger as the declarative batch hook (shared
    maintain_export_cadences)."""
    from s3_sqs_data_ingestion_demo_spark.streaming import (
        start_streaming_cdc_export,
    )

    d = str(tmp_path)
    land = f"{d}/landing"
    os.makedirs(land)
    src = ManagedTable.create(
        spark, f"{d}/src", STREAM_SCHEMA, key_cols=["id"],
        order_column="seq", table_type="MOR",
    )
    ex = f"{d}/export"

    def drain():
        q = start_streaming_cdc_export(
            spark, land, STREAM_SCHEMA, src, ex,
            fmt="csv", options={"header": "true"},
            checkpoint_dir=f"{d}/ckpt", available_now=True,
            keep_last_windows=2,
        )
        if not q.awaitTermination(120):
            q.stop()
            raise AssertionError("availableNow trigger timed out")

    for i in range(4):
        _write_stream_csv(f"{land}/f{i}.csv", [(i, "a", i, 1)])
        drain()
    ws = list_export_windows(ex)
    assert len(ws) <= 2
    # the retained tail still replays coherently against live state
    tail = read_change_export(spark, ex, since=ws[0][1])
    assert tail.count() >= 1

"""Declarative rollup maintenance (output_config.rollups): every
ingested batch refreshes the declared summary tables from the TARGET
TABLE'S change feed — coherent under upserts, CDC deletes, and
redelivery, because the rollup consumes committed table state, never
the raw batch frame."""

import os

import pytest
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable


def _write_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("id\tgrp\tv\tseq\tOp\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def _cfg(tmp, **out_extra):
    out = {
        "table_path": f"{tmp}/tbl",
        "mode": "merge",
        "table_type": "MOR",
        "key_columns": ["id"],
        "order_column": "seq",
        "cdc_delete_values": ["D"],
        "rollups": [
            {
                "path": f"{tmp}/roll",
                "group_columns": ["grp"],
                "sum_columns": ["v"],
            }
        ],
    }
    out.update(out_extra)
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
            "output_config": out,
        }
    )


SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("Op", T.StringType()),
    ]
)


def _mk_table(spark, tmp):
    return ManagedTable.create(
        spark,
        f"{tmp}/tbl",
        SCHEMA,
        key_cols=["id"],
        order_column="seq",
        table_type="MOR",
    )


def _roll(spark, tmp):
    t = ManagedTable.load(spark, f"{tmp}/roll")
    return {r.grp: (r.n_rows, r.sum_v) for r in t.read().collect()}


def test_job_rollup_tracks_upserts_deletes_and_redelivery(spark, tmp_path):
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d)
    b1, b2, b3 = f"{d}/b1.csv", f"{d}/b2.csv", f"{d}/b3.csv"
    _write_csv(b1, [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I"),
                    (3, "b", 1, 1, "I")])
    _write_csv(b2, [(1, "a", 99, 2, "U"),      # in-group update
                    (3, "a", 1, 2, "U"),       # group move b -> a
                    (4, "c", 7, 2, "I")])      # insert
    _write_csv(b3, [(2, "a", 5, 3, "D")])      # CDC delete
    J.process_files(spark, cfg, [b1])
    assert _roll(spark, d) == {"a": (2, 15.0), "b": (1, 1.0)}
    J.process_files(spark, cfg, [b2])
    assert _roll(spark, d) == {"a": (3, 105.0), "c": (1, 7.0)}
    J.process_files(spark, cfg, [b3])
    assert _roll(spark, d) == {"a": (2, 100.0), "c": (1, 7.0)}
    # redelivered update batch: identical rows net to zero in the feed
    # (and the delete of id=2 is NOT undone — b2 never contained it)
    J.process_files(spark, cfg, [b2])
    assert _roll(spark, d) == {"a": (2, 100.0), "c": (1, 7.0)}


def test_job_rollup_bootstraps_from_existing_table_content(spark, tmp_path):
    d = str(tmp_path)
    t = _mk_table(spark, d)
    # pre-existing content ingested BEFORE the rollup was declared
    t.append(
        spark.createDataFrame([(1, "a", 10, 1, "I"), (2, "b", 5, 1, "I")],
                              SCHEMA)
    )
    cfg = _cfg(d)
    b = f"{d}/b.csv"
    _write_csv(b, [(3, "a", 2, 2, "I")])
    J.process_files(spark, cfg, [b])
    # first refresh folded the pre-existing rows too (consume_from=1)
    assert _roll(spark, d) == {"a": (2, 12.0), "b": (1, 5.0)}


def test_job_rollup_min_max_columns(spark, tmp_path):
    """Declared min_columns/max_columns flow through DDL and refresh:
    the delete of a group's stored minimum forces the rescan path
    inside the declarative job loop."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(
        d,
        rollups=[
            {
                "path": f"{d}/roll",
                "group_columns": ["grp"],
                "sum_columns": ["v"],
                "min_columns": ["v"],
                "max_columns": ["v"],
            }
        ],
    )
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_csv(b1, [(1, "a", 10, 1, "I"), (2, "a", 3, 1, "I"),
                    (3, "b", 5, 1, "I")])
    _write_csv(b2, [(2, "a", 3, 2, "D")])  # delete the stored min of a
    J.process_files(spark, cfg, [b1])
    t = ManagedTable.load(spark, f"{d}/roll")
    st = {r.grp: (r.n_rows, r.min_v, r.max_v) for r in t.read().collect()}
    assert st == {"a": (2, 3, 10), "b": (1, 5, 5)}
    J.process_files(spark, cfg, [b2])
    st = {r.grp: (r.n_rows, r.min_v, r.max_v) for r in t.read().collect()}
    assert st == {"a": (1, 10, 10), "b": (1, 5, 5)}


def test_job_rollup_distinct_columns(spark, tmp_path):
    """Declared distinct_columns provision the companion table and
    keep COUNT(DISTINCT) exact through a delete that removes one of
    two holders of a value (count keeps) and the sole holder of
    another (count drops)."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(
        d,
        rollups=[
            {
                "path": f"{d}/roll",
                "group_columns": ["grp"],
                "sum_columns": [],
                "distinct_columns": ["v"],
            }
        ],
    )
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_csv(b1, [(1, "a", 7, 1, "I"), (2, "a", 7, 1, "I"),
                    (3, "a", 9, 1, "I")])
    _write_csv(b2, [(1, "a", 7, 2, "D"), (3, "a", 9, 2, "D")])
    J.process_files(spark, cfg, [b1])
    t = ManagedTable.load(spark, f"{d}/roll")
    st = {r.grp: (r.n_rows, r.n_distinct_v) for r in t.read().collect()}
    assert st == {"a": (3, 2)}
    J.process_files(spark, cfg, [b2])
    st = {r.grp: (r.n_rows, r.n_distinct_v) for r in t.read().collect()}
    assert st == {"a": (1, 1)}


def test_job_rollup_maintenance_compacts_and_stays_exact(spark, tmp_path):
    """maintenance_every folds the rollup's (and companion's)
    accumulated MOR deltas; refreshes keep landing exactly across the
    compaction commits (tag probes and the source feed are
    unaffected — compaction is content-neutral)."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(
        d,
        rollups=[
            {
                "path": f"{d}/roll",
                "group_columns": ["grp"],
                "sum_columns": ["v"],
                "distinct_columns": ["v"],
                "maintenance_every": 1,
            }
        ],
    )
    batches = []
    for i, rows in enumerate(
        [
            [(1, "a", 7, 1, "I"), (2, "a", 9, 1, "I")],
            [(3, "b", 7, 2, "I"), (1, "a", 8, 2, "U")],
            [(2, "a", 9, 3, "D")],
        ]
    ):
        p = f"{d}/b{i}.csv"
        _write_csv(p, rows)
        batches.append(p)
    for b in batches:
        J.process_files(spark, cfg, [b])
    t = ManagedTable.load(spark, f"{d}/roll")
    st = {r.grp: (r.n_rows, r.sum_v, r.n_distinct_v)
          for r in t.read().collect()}
    assert st == {"a": (1, 8.0, 1), "b": (1, 7.0, 1)}
    # compaction actually ran on the rollup (maintenance commits exist)
    kinds = [t._snapshot_kind(v) for v in t.history()]
    assert "maintenance" in kinds
    with pytest.raises(ValueError, match="maintenance_every"):
        _cfg(d, rollups=[{"path": f"{d}/r", "group_columns": ["g"],
                          "maintenance_every": -1}])


def test_rollup_config_validates_at_parse_time(tmp_path):
    with pytest.raises(ValueError, match="need a path"):
        _cfg(str(tmp_path), rollups=[{"group_columns": ["grp"]}])
    with pytest.raises(ValueError, match="group_columns"):
        _cfg(str(tmp_path), rollups=[{"path": f"{tmp_path}/r"}])


def test_rollup_ddl_errors_surface_at_bootstrap_not_mid_batch(
    spark, tmp_path
):
    """A group column missing from the table schema must fail in
    ensure_target (startup), the poison-redelivery-safe place."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d, rollups=[{
        "path": f"{d}/roll",
        "group_columns": ["nope"],
        "sum_columns": ["v"],
    }])
    with pytest.raises(ValueError, match="missing from source schema"):
        J.ensure_target(spark, cfg)


def test_job_rollup_hist_columns(spark, tmp_path):
    """Declared hist_columns flow through DDL and refresh: additive
    bin counts track an update (group move) and a CDC delete exactly,
    and the spec validates at config parse time."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(
        d,
        rollups=[
            {
                "path": f"{d}/roll",
                "group_columns": ["grp"],
                "sum_columns": [],
                "hist_columns": {"v": [0, 100, 10]},
            }
        ],
    )
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_csv(b1, [(1, "a", 5, 1, "I"), (2, "a", 15, 1, "I"),
                    (3, "b", 95, 1, "I")])
    # update: move id=2 into b with an out-of-range value (overflow);
    # delete id=1
    _write_csv(b2, [(2, "b", 120, 2, "U"), (1, "a", 5, 2, "D")])
    J.process_files(spark, cfg, [b1])
    t = ManagedTable.load(spark, f"{d}/roll")
    st = {r.grp: list(r.hist_v) for r in t.read().collect()}
    assert st["a"][1] == 1 and st["a"][2] == 1 and sum(st["a"]) == 2
    assert st["b"][10] == 1 and sum(st["b"]) == 1
    J.process_files(spark, cfg, [b2])
    st = {r.grp: list(r.hist_v) for r in t.read().collect()}
    # group a emptied (id=2 moved out, id=1 deleted) → swept from the
    # rollup; b keeps its original row plus the moved-in overflow value
    assert set(st) == {"b"}
    assert st["b"][10] == 1 and st["b"][11] == 1 and sum(st["b"]) == 2


def test_hist_config_validates_at_parse_time(tmp_path):
    d = str(tmp_path)
    with pytest.raises(ValueError, match="hist_columns"):
        _cfg(
            d,
            rollups=[
                {
                    "path": f"{d}/roll",
                    "group_columns": ["grp"],
                    "hist_columns": {"v": [100, 0, 10]},  # hi < lo
                }
            ],
        )
    with pytest.raises(ValueError, match="hist_columns"):
        _cfg(
            d,
            rollups=[
                {
                    "path": f"{d}/roll",
                    "group_columns": ["grp"],
                    "hist_columns": {"v": [0, 100]},  # not a triple
                }
            ],
        )

"""Declarative top-k maintenance (output_config.topk_mvs): every
ingested batch refreshes the declared top-k tables from the TARGET
TABLE'S change feed — coherent under upserts, CDC deletes, and
redelivery, same contract as rollups/join MVs."""

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


def _cfg(tmp, **mv_extra):
    mv = {
        "path": f"{tmp}/topk",
        "group_columns": ["grp"],
        "order_column": "v",
        "k": 2,
    }
    mv.update(mv_extra)
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
                "topk_mvs": [mv],
            },
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


def _topk(spark, tmp):
    t = ManagedTable.load(spark, f"{tmp}/topk")
    return sorted((r.grp, r.id, r.v) for r in t.read().collect())


def test_job_topk_tracks_upserts_deletes_and_redelivery(spark, tmp_path):
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d)
    b1, b2, b3 = f"{d}/b1.csv", f"{d}/b2.csv", f"{d}/b3.csv"
    _write_csv(b1, [(1, "a", 10, 1, "I"), (2, "a", 5, 1, "I"),
                    (3, "a", 7, 1, "I"), (4, "b", 1, 1, "I")])
    _write_csv(b2, [(2, "a", 99, 2, "U"),       # climbs into top-2
                    (5, "b", 3, 2, "I")])       # fills b's top-2
    # delete a's runner-up (id=1 is NOT in b2, so a later b2
    # redelivery cannot resurrect it)
    _write_csv(b3, [(1, "a", 10, 3, "D")])
    J.process_files(spark, cfg, [b1])
    assert _topk(spark, d) == [("a", 1, 10), ("a", 3, 7), ("b", 4, 1)]
    J.process_files(spark, cfg, [b2])
    assert _topk(spark, d) == [("a", 1, 10), ("a", 2, 99),
                               ("b", 4, 1), ("b", 5, 3)]
    J.process_files(spark, cfg, [b3])
    assert _topk(spark, d) == [("a", 2, 99), ("a", 3, 7),
                               ("b", 4, 1), ("b", 5, 3)]
    # redelivered batch: identical rows net to zero in the feed
    J.process_files(spark, cfg, [b2])
    assert _topk(spark, d) == [("a", 2, 99), ("a", 3, 7),
                               ("b", 4, 1), ("b", 5, 3)]


def test_job_topk_bootstraps_existing_content(spark, tmp_path):
    d = str(tmp_path)
    t = _mk_table(spark, d)
    t.append(
        spark.createDataFrame(
            [(1, "a", 10, 1, "I"), (2, "a", 20, 1, "I"), (3, "a", 5, 1, "I")],
            SCHEMA,
        )
    )
    cfg = _cfg(d)
    b = f"{d}/b.csv"
    _write_csv(b, [(4, "a", 15, 2, "I")])
    J.process_files(spark, cfg, [b])
    # pre-existing rows competed too (consume_from=1)
    assert _topk(spark, d) == [("a", 2, 20), ("a", 4, 15)]


def test_topk_config_validates_at_parse_time(tmp_path):
    d = str(tmp_path)
    with pytest.raises(ValueError, match="k >= 1"):
        _cfg(d, k=0)
    with pytest.raises(ValueError, match="order_column"):
        _cfg(d, order_column="")
    cfg = JobConfig.from_dict(
        {
            "input_config": {"format": "csv"},
            "output_config": {
                "table_path": f"{d}/tbl",
                "mode": "merge",
                "table_type": "MOR",
                "key_columns": ["id"],
                "cdc_delete_values": ["D"],
                "topk_mvs": [
                    {
                        "path": f"{d}/topk",
                        "group_columns": ["grp"],
                        "order_column": "v",
                        "k": 3,
                    }
                ],
            },
        }
    )
    assert cfg.output_config.topk_mvs[0].k == 3
    # COW + rewriting writes refused, same as rollups
    with pytest.raises(ValueError, match="rewriting"):
        JobConfig.from_dict(
            {
                "input_config": {"format": "csv"},
                "output_config": {
                    "table_path": f"{d}/tbl2",
                    "mode": "merge",
                    "table_type": "COW",
                    "key_columns": ["id"],
                    "topk_mvs": [
                        {
                            "path": f"{d}/topk2",
                            "group_columns": ["grp"],
                            "order_column": "v",
                            "k": 3,
                        }
                    ],
                },
            }
        )


def test_topk_empty_id_derivation_refused_at_parse_time(tmp_path):
    d = str(tmp_path)
    with pytest.raises(ValueError, match="id_columns"):
        JobConfig.from_dict(
            {
                "input_config": {"format": "csv"},
                "output_config": {
                    "table_path": f"{d}/tbl",
                    "mode": "merge",
                    "table_type": "MOR",
                    "key_columns": ["grp"],  # all keys are group cols
                    "topk_mvs": [
                        {
                            "path": f"{d}/topk",
                            "group_columns": ["grp"],
                            "order_column": "v",
                            "k": 2,
                        }
                    ],
                },
            }
        )
    with pytest.raises(ValueError, match="duplicate group"):
        JobConfig.from_dict(
            {
                "input_config": {"format": "csv"},
                "output_config": {
                    "table_path": f"{d}/tbl",
                    "mode": "merge",
                    "table_type": "MOR",
                    "key_columns": ["id"],
                    "topk_mvs": [
                        {
                            "path": f"{d}/topk",
                            "group_columns": ["grp"],
                            "order_column": "v",
                            "k": 2,
                            "id_columns": ["grp", "id"],
                        }
                    ],
                },
            }
        )


def test_topk_maintenance_compacts_and_stays_exact(spark, tmp_path):
    """maintenance_every folds the MV's accumulated MOR deltas;
    refreshes keep landing exactly across the compaction commits (the
    change feed splits windows at maintenance commits, and the tag
    probe stops at the previous fold's tag)."""
    d = str(tmp_path)
    _mk_table(spark, d)
    cfg = _cfg(d, maintenance_every=1)
    for i in range(4):
        b = f"{d}/m{i}.csv"
        _write_csv(b, [(100 + i, "a", 50 + i, i + 1, "I")])
        J.process_files(spark, cfg, [b])
    mv = ManagedTable.load(spark, f"{d}/topk")
    assert _topk(spark, d) == [("a", 102, 52), ("a", 103, 53)]
    # cadence actually fired: no pending delta entries remain
    kinds = {e.get("kind") for e in mv._manifest_at(mv._current_version())}
    assert "delta" not in kinds

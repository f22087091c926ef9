"""Declarative join-MV maintenance (output_config.join_mvs): every
ingested batch refreshes TARGET ⋈ right_table from both tables'
change feeds — coherent under upserts, CDC deletes, redelivery, and
out-of-band dimension changes, because the MV consumes committed
table state, never the raw batch frame."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("cust", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)
DIM = T.StructType(
    [
        T.StructField("c_id", T.IntegerType()),
        T.StructField("seg", T.StringType()),
    ]
)


def _write_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("id\tcust\tv\tseq\tOp\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


def _cfg(tmp):
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
                "join_mvs": [
                    {
                        "path": f"{tmp}/mv",
                        "right_table": f"{tmp}/dim",
                        "on": ["cust", "c_id"],
                    }
                ],
            },
        }
    )


@pytest.fixture
def setup(spark, tmp_path):
    d = str(tmp_path)
    ManagedTable.create(spark, f"{d}/tbl", SCHEMA, key_cols=["id"],
                        order_column="seq", table_type="MOR")
    dim = ManagedTable.create(spark, f"{d}/dim", DIM, key_cols=["c_id"],
                              table_type="MOR")
    dim.append(spark.createDataFrame(
        [Row(c_id=1, seg="A"), Row(c_id=2, seg="B")], DIM))
    return d, dim


def _mv(spark, d):
    return {
        (r.id, r.cust, r.v, r.seg)
        for r in ManagedTable.load(spark, f"{d}/mv").read().collect()
    }


def test_declared_mv_tracks_upserts_deletes_and_dim_changes(spark, setup):
    d, dim = setup
    cfg = _cfg(d)
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_csv(b1, [(10, 1, 100, 1, "I"), (11, 2, 110, 1, "I"),
                    (12, 9, 120, 1, "I")])  # 12 dangles (no c_id 9)
    J.process_files(spark, cfg, [b1])
    assert _mv(spark, d) == {(10, 1, 100, "A"), (11, 2, 110, "B")}

    # out-of-band dimension change between batches folds in with the
    # next batch (the MV consumes the dim's change feed too), and a
    # key move + CDC delete land in the same batch
    dim.append(spark.createDataFrame([Row(c_id=9, seg="Z")], DIM))
    _write_csv(b2, [(10, 2, 101, 2, "U"), (11, 2, 0, 2, "D")])
    J.process_files(spark, cfg, [b2])
    assert _mv(spark, d) == {(10, 2, 101, "B"), (12, 9, 120, "Z")}

    # redelivered batch: MV unchanged (recompute is idempotent)
    J.process_files(spark, cfg, [b2])
    assert _mv(spark, d) == {(10, 2, 101, "B"), (12, 9, 120, "Z")}


def test_join_mv_maintenance_compacts_and_stays_exact(spark, setup):
    """maintenance_every folds the MV's accumulated keyed-merge deltas
    at cadence; refreshes keep landing exactly across the compaction
    commits."""
    d, dim = setup
    cfg = _cfg(d)
    cfg.output_config.join_mvs[0].maintenance_every = 1
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_csv(b1, [(1, 1, 10, 1, "I"), (2, 2, 5, 1, "I")])
    _write_csv(b2, [(1, 2, 11, 2, "U")])
    J.process_files(spark, cfg, [b1])
    J.process_files(spark, cfg, [b2])
    assert _mv(spark, d) == {(1, 2, 11, "B"), (2, 2, 5, "B")}
    mv = ManagedTable.load(spark, f"{d}/mv")
    assert "maintenance" in [mv._snapshot_kind(v) for v in mv.history()]


def test_missing_right_table_fails_loudly_on_first_batch(spark, tmp_path):
    d = str(tmp_path)
    ManagedTable.create(spark, f"{d}/tbl", SCHEMA, key_cols=["id"],
                        order_column="seq", table_type="MOR")
    cfg = _cfg(d)  # right table never created
    b = f"{d}/b.csv"
    _write_csv(b, [(1, 1, 10, 1, "I")])
    with pytest.raises(FileNotFoundError):
        J.process_files(spark, cfg, [b])


def test_join_mv_config_validation():
    with pytest.raises(ValueError, match="need a path"):
        JobConfig.from_dict({"output_config": {
            "key_columns": ["id"], "table_type": "MOR", "mode": "append",
            "join_mvs": [{"right_table": "/x", "on": ["a", "b"]}]}})
    with pytest.raises(ValueError, match="right_table"):
        JobConfig.from_dict({"output_config": {
            "key_columns": ["id"], "table_type": "MOR", "mode": "append",
            "join_mvs": [{"path": "/mv", "on": ["a", "b"]}]}})
    with pytest.raises(ValueError, match="on:"):
        JobConfig.from_dict({"output_config": {
            "key_columns": ["id"], "table_type": "MOR", "mode": "append",
            "join_mvs": [{"path": "/mv", "right_table": "/x",
                          "on": ["a"]}]}})
    with pytest.raises(ValueError, match="key_columns"):
        JobConfig.from_dict({"output_config": {
            "table_type": "MOR", "mode": "append",
            "join_mvs": [{"path": "/mv", "right_table": "/x",
                          "on": ["a", "b"]}]}})
    with pytest.raises(ValueError, match="requires.*MOR"):
        JobConfig.from_dict({"output_config": {
            "key_columns": ["id"], "table_type": "COW", "mode": "merge",
            "join_mvs": [{"path": "/mv", "right_table": "/x",
                          "on": ["a", "b"]}]}})

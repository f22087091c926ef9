"""Hidden partitioning (Iceberg partition transforms) on ManagedTable:
day/month/hour/bucket/truncate transforms derive storage-only partition
columns; predicates on the SOURCE column prune the hive dirs the user
never sees."""

import datetime as dt
import glob
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import (
    ManagedTable,
    parse_transform,
    transform_expr,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _day(d):
    return dt.datetime(2024, 1, d, 12, 0, 0)


def test_parse_transform_specs():
    assert parse_transform("day(ts)") == ("day", None, "ts")
    assert parse_transform("bucket(16, id)") == ("bucket", 16, "id")
    assert parse_transform("truncate(4,name)") == ("truncate", 4, "name")
    for bad in ("year(ts)", "day(16, ts)", "bucket(ts)", "bucket(0, id)", "x"):
        with pytest.raises(ValueError):
            parse_transform(bad)


def test_create_validates_transforms(spark, tmp_path):
    with pytest.raises(ValueError, match="collides"):
        ManagedTable.create(
            spark, str(tmp_path / "a"), SCHEMA, partition_cols=["ts"],
            partition_transforms={"ts": "day(ts)"},
        )
    with pytest.raises(ValueError, match="not in schema"):
        ManagedTable.create(
            spark, str(tmp_path / "b"), SCHEMA, partition_cols=["p"],
            partition_transforms={"p": "day(nope)"},
        )
    with pytest.raises(ValueError, match="partition_cols"):
        ManagedTable.create(
            spark, str(tmp_path / "c"), SCHEMA, partition_cols=[],
            partition_transforms={"p": "day(ts)"},
        )


def test_day_transform_layout_and_schema_hiding(spark, tmp_path):
    t = ManagedTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(_rows(spark, [
        (1, _day(1), "a", 10), (2, _day(2), "b", 20), (3, _day(3), "c", 30),
    ]))
    # storage IS day-partitioned...
    dirs = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(t.path, "data", "*", "ts_day=*"))
    }
    assert dirs == {"ts_day=2024-01-01", "ts_day=2024-01-02", "ts_day=2024-01-03"}
    # ...but the logical schema never shows the derived column
    assert t.read().columns == ["id", "ts", "name", "v"]
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]


def test_day_range_prunes_dirs(spark, tmp_path):
    t = ManagedTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(_rows(spark, [(d, _day(d), "x", d) for d in range(1, 11)]))
    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5, 23, 59)
    out = t.read_where("ts", lo, hi)
    assert sorted(r.id for r in out.collect()) == [3, 4, 5]
    # the entry's parts were subset to the 3 touched days
    [entry] = t._read_manifest()
    pruned = t._prune_entry_parts(entry, "ts", lo, hi)
    assert sorted(pruned["parts"]) == [
        "ts_day=2024-01-03", "ts_day=2024-01-04", "ts_day=2024-01-05",
    ]
    # a disjoint range prunes the whole entry
    assert t._prune_entry_parts(
        entry, "ts", dt.datetime(2025, 1, 1), dt.datetime(2025, 2, 1)
    ) is None


def test_bucket_point_lookup_prunes_to_one_dir(spark, tmp_path):
    t = ManagedTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        partition_cols=["id_bucket"],
        partition_transforms={"id_bucket": "bucket(8, id)"},
    )
    t.append(_rows(spark, [(i, _day(1), "x", i) for i in range(50)]))
    out = t.read_where("id", 7, 7)
    assert [r.id for r in out.collect()] == [7]
    [entry] = t._read_manifest()
    pruned = t._prune_entry_parts(entry, "id", 7, 7)
    assert len(pruned["parts"]) == 1
    # the surviving dir is the JVM hash bucket of 7
    b = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(7).cast("long")), F.lit(8))
            .cast("int").alias("b")
        )
        .collect()[0]["b"]
    )
    assert pruned["parts"] == [f"id_bucket={b}"]
    # a RANGE on a bucket transform cannot prune (hash is not monotone)
    assert t._prune_entry_parts(entry, "id", 3, 9)["parts"] == entry["parts"]


def test_truncate_string_prefix_pruning(spark, tmp_path):
    t = ManagedTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        partition_cols=["name_pfx"],
        partition_transforms={"name_pfx": "truncate(2, name)"},
    )
    t.append(_rows(spark, [
        (1, _day(1), "alpha", 1), (2, _day(1), "alto", 2),
        (3, _day(1), "beta", 3), (4, _day(1), "gamma", 4),
    ]))
    out = t.read_where("name", "al", "az")
    assert sorted(r.name for r in out.collect()) == ["alpha", "alto"]
    [entry] = t._read_manifest()
    pruned = t._prune_entry_parts(entry, "name", "al", "az")
    assert pruned["parts"] == ["name_pfx=al"]


def test_merge_rewrites_only_touched_days(spark, tmp_path):
    """Partition-pruned COW merge composes with hidden partitioning:
    a CDC batch touching one day carries every other day's dirs over
    by reference (same root, no rewrite)."""
    t = ManagedTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
        key_cols=["id"],
    )
    t.merge(_rows(spark, [(d, _day(d), "old", d) for d in range(1, 6)]))
    [e1] = t._read_manifest()
    t.merge(_rows(spark, [(3, _day(3), "new", 33)]))
    entries = t._read_manifest()
    assert len(entries) == 2
    kept = next(e for e in entries if e["root"] == e1["root"])
    new = next(e for e in entries if e["root"] != e1["root"])
    assert "ts_day=2024-01-03" not in kept["parts"]
    assert len(kept["parts"]) == 4  # untouched days carried by reference
    assert new["parts"] == ["ts_day=2024-01-03"]
    got = {r.id: r.name for r in t.read().collect()}
    assert got == {1: "old", 2: "old", 3: "new", 4: "old", 5: "old"}


def test_mor_tombstone_null_dir_survives_pruning(spark, tmp_path):
    """A MOR tombstone nulls its non-key columns, so it lands in the
    null partition dir; range pruning on ``ts`` must keep it or the
    deleted key would resurface."""
    t = ManagedTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
        key_cols=["id"], table_type="MOR",
    )
    t.merge(_rows(spark, [(d, _day(d), "x", d) for d in range(1, 4)]))
    t.delete_keys(spark.createDataFrame([(2,)], "id long"))
    out = t.read_where("ts", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 4))
    assert sorted(r.id for r in out.collect()) == [1, 3]


def test_delete_where_cow_prunes_hidden_partitions(spark, tmp_path):
    t = ManagedTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(_rows(spark, [(d, _day(d), "x", d) for d in range(1, 6)]))
    [e1] = t._read_manifest()
    t.delete_where(F.col("id") == 3)
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 4, 5]
    # only day 3 was rewritten; the other dirs carried over by reference
    kept = next(e for e in t._read_manifest() if e["root"] == e1["root"])
    assert "ts_day=2024-01-03" not in kept["parts"]
    assert len(kept["parts"]) == 4


def test_pre_transform_meta_loads(spark, tmp_path):
    """Tables created before the partition_transforms field must load
    (the field defaults empty)."""
    t = ManagedTable.create(spark, str(tmp_path / "t"), SCHEMA)
    meta_path = os.path.join(t.path, "_meta.json")
    with open(meta_path, encoding="utf-8") as fh:
        doc = json.load(fh)
    doc.pop("partition_transforms")
    with open(meta_path, "w", encoding="utf-8") as fh:
        json.dump(doc, fh)
    t2 = ManagedTable.load(spark, t.path)
    assert t2.meta.partition_transforms == {}
    t2.append(_rows(spark, [(1, _day(1), "a", 1)]))
    assert t2.read().count() == 1


def test_job_config_passthrough(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark import job as J
    from s3_sqs_data_ingestion_demo_spark.config import JobConfig

    d = str(tmp_path)
    avsc = {
        "type": "record", "name": "ev", "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": ["null", {"type": "long",
             "logicalType": "timestamp-micros"}], "default": None},
            {"name": "v", "type": ["null", "long"], "default": None},
        ],
    }
    with open(f"{d}/c.avsc", "w") as fh:
        json.dump(avsc, fh)
    with open(f"{d}/b.csv", "w") as fh:
        fh.write("id\tts\tv\n1\t2024-01-01 10:00:00\t5\n2\t2024-01-02 10:00:00\t6\n")
    cfg = JobConfig.from_dict({
        "input_config": {
            "format": "csv",
            "options": {"header": "true", "sep": "\t", "inferSchema": "true"},
        },
        "output_config": {
            "table_path": f"{d}/tbl", "mode": "append",
            "schema": f"{d}/c.avsc",
            "partition": ["ts_day"],
            "partition_transforms": {"ts_day": "day(ts)"},
        },
    })
    J.process_files(spark, cfg, [f"{d}/b.csv"])
    dirs = {
        os.path.basename(p)
        for p in glob.glob(f"{d}/tbl/data/*/ts_day=*")
    }
    assert dirs == {"ts_day=2024-01-01", "ts_day=2024-01-02"}
    t = ManagedTable.load(spark, f"{d}/tbl")
    assert t.read().columns == ["id", "ts", "v"]


def test_transform_expr_truncate_numeric(spark):
    df = spark.createDataFrame([(7,), (13,), (-3,)], "x long").select(
        transform_expr("truncate(5, x)", T.LongType()).alias("t")
    )
    assert [r.t for r in df.collect()] == [5, 10, -5]

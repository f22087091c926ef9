"""Partial small-file compaction (table.py compact_small): binpack
ONLY the small append entries — maintenance cost O(small files), the
routine cadence move where compact()'s full rewrite would be O(table).
Safety gates: refuses pending deltas/tombstones (resolution order
derives from entry recency), refuses keyed tables whose entries are
not provably disjoint on the key, refuses partitioned layouts."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _mk(spark, tmp, keys=("id",)):
    return ManagedTable.create(
        spark,
        os.path.join(str(tmp), "t"),
        SCHEMA,
        key_cols=list(keys),
        order_column="seq" if keys else None,
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, v=v, seq=s) for i, v, s in rows], SCHEMA
    )


def _roots(t):
    return [e["root"] for e in t._read_manifest()]


def test_binpacks_small_disjoint_entries(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # four small disjoint-key appends + one "large" (still small, but
    # excluded via the byte threshold below)
    for lo in (0, 10, 20, 30):
        t.append(_rows(spark, [(lo + i, 1, 1) for i in range(5)]))
    t.append(_rows(spark, [(100 + i, 1, 1) for i in range(50)]))
    big_root = _roots(t)[-1]
    big_bytes = t._entry_bytes(t._read_manifest()[-1])
    before = {(r.id, r.v) for r in t.read().collect()}

    v = t.compact_small(max_entry_bytes=big_bytes)  # big entry excluded
    assert v is not None
    after_entries = t._read_manifest()
    assert len(after_entries) == 2  # consolidated + the big one
    assert big_root in _roots(t)  # untouched, not rewritten
    assert {(r.id, r.v) for r in t.read().collect()} == before
    assert t._snapshot_kind(v) == "maintenance"
    assert t.count_rows() == len(before)  # stats reharvested
    # nothing left to do: a second call is a no-op
    assert t.compact_small(max_entry_bytes=big_bytes) is None


def test_refuses_overlapping_keys_and_pending_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [(1, 1, 1), (2, 1, 1)]))
    t.append(_rows(spark, [(2, 9, 2), (3, 1, 1)]))  # key 2 overlaps
    assert t.compact_small() is None  # disjointness unprovable
    t2 = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t2"), SCHEMA,
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    t2.append(_rows(spark, [(1, 1, 1)]))
    t2.append(_rows(spark, [(10, 1, 1)]))
    t2.merge(_rows(spark, [(1, 5, 2)]))  # pending MOR delta
    assert t2.compact_small() is None
    t2.compact()  # the full rewrite folds the delta...
    t2.append(_rows(spark, [(20, 1, 1)]))
    assert t2.compact_small() is not None  # ...and binpack works again
    assert {(r.id, r.v) for r in t2.read().collect()} == {
        (1, 5), (10, 1), (20, 1),
    }


def test_keyless_table_always_eligible(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "nk"), SCHEMA, key_cols=[]
    )
    # duplicate rows across entries: multiset must be preserved
    t.append(_rows(spark, [(1, 1, 1)]))
    t.append(_rows(spark, [(1, 1, 1), (2, 1, 1)]))
    v = t.compact_small()
    assert v is not None
    assert t.read().count() == 3
    assert (
        t.read().filter(F.col("id") == 1).count() == 2
    )  # duplicates survive


def test_append_job_cadence_prefers_binpack(spark, tmp_path):
    """Declarative maintenance on an append-mode job takes the partial
    binpack, not the O(table) full rewrite: the large root must
    survive the maintenance commit untouched."""
    from s3_sqs_data_ingestion_demo_spark import job as J
    from s3_sqs_data_ingestion_demo_spark.config import JobConfig

    d = str(tmp_path)
    t = ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("v", T.IntegerType()),
                T.StructField("seq", T.IntegerType()),
            ]
        ),
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    # pre-existing LARGE root, excluded from binpack via the declared
    # compact_small_bytes threshold — it must survive the maintenance
    # commit untouched (a full compact would rewrite it away)
    t.append(_rows(spark, [(100 + i, 1, 1) for i in range(50)]))
    big_root = t._read_manifest()[-1]["root"]
    big_bytes = t._entry_bytes(t._read_manifest()[-1])
    cfg = JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {"header": "true", "sep": "\t",
                            "inferSchema": "true"},
            },
            "output_config": {
                "table_path": f"{d}/tbl",
                "mode": "append",
                "table_type": "MOR",
                "key_columns": ["id"],
                "order_column": "seq",
                "maintenance": {
                    "compact_every": 2,
                    "compact_small_bytes": big_bytes,
                },
            },
        }
    )
    for i, rows in enumerate([[(1, 1, 1)], [(2, 1, 1)], [(3, 1, 1)]]):
        p = f"{d}/b{i}.csv"
        with open(p, "w") as fh:
            fh.write("id\tv\tseq\n")
            for r in rows:
                fh.write("\t".join(str(x) for x in r) + "\n")
        J.process_files(spark, cfg, [p])
    kinds = [t._snapshot_kind(v) for v in t.history()]
    assert "maintenance" in kinds
    assert big_root in [e["root"] for e in t._read_manifest()]
    assert t.read().count() == 53


def test_change_feed_skips_the_binpack_window(spark, tmp_path):
    """compact_small commits maintenance — a rollup refreshed across
    it must fold nothing for that window (content-neutral)."""
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        create_rollup,
        refresh_rollup,
    )

    t = _mk(spark, tmp_path)
    dst = create_rollup(
        t, os.path.join(str(tmp_path), "r"), ["v"], [], consume_from=1
    )
    t.append(_rows(spark, [(1, 7, 1)]))
    t.append(_rows(spark, [(2, 7, 1)]))
    refresh_rollup(t, dst, ["v"], [])
    assert {r.v: r.n_rows for r in dst.read().collect()} == {7: 2}
    assert t.compact_small() is not None
    refresh_rollup(t, dst, ["v"], [])  # maintenance-only window
    assert {r.v: r.n_rows for r in dst.read().collect()} == {7: 2}


def test_expiry_still_runs_when_nothing_small(spark, tmp_path):
    """When binpack is eligible but finds nothing small, maintenance
    must still expire snapshots — otherwise history grows unboundedly
    for as long as every file stays above the threshold (the cadence
    counter only resets on a maintenance commit, which never lands in
    that state)."""
    from s3_sqs_data_ingestion_demo_spark import job as J
    from s3_sqs_data_ingestion_demo_spark.config import JobConfig

    d = str(tmp_path)
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("v", T.IntegerType()),
                T.StructField("seq", T.IntegerType()),
            ]
        ),
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    cfg = JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {"header": "true", "sep": "\t",
                            "inferSchema": "true"},
            },
            "output_config": {
                "table_path": f"{d}/tbl",
                "mode": "append",
                "table_type": "MOR",
                "key_columns": ["id"],
                "order_column": "seq",
                "maintenance": {
                    "compact_every": 2,
                    # threshold 1 byte: nothing ever counts as small
                    "compact_small_bytes": 1,
                    "expire_keep_last": 3,
                },
            },
        }
    )
    for i in range(8):
        p = f"{d}/b{i}.csv"
        with open(p, "w") as fh:
            fh.write("id\tv\tseq\n")
            fh.write(f"{i}\t1\t1\n")
        J.process_files(spark, cfg, [p])
    t = ManagedTable.load(spark, f"{d}/tbl")
    # no compact ever ran (nothing small), but history stayed bounded
    assert all(t._snapshot_kind(v) != "maintenance" for v in t.history())
    assert len(t.history()) <= 4  # keep_last=3 plus the newest commit
    assert t.read().count() == 8

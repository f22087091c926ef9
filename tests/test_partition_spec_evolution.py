"""Partition-spec evolution (``ManagedTable.set_partition_spec``):
future writes land under the new layout, old entries keep theirs —
nothing is rewritten.  Reads prune each entry by the spec it was
written under; partition-pruned COW fast paths detect mixed specs and
degrade to the full rewrite (which migrates the layout, as does
``compact()``).

Also pins a pre-existing metadata bug this work exposed: a
parts-subset entry carried the ORIGINAL ``__rows`` stat, overcounting
the metadata-only ``count_rows()``.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("v", T.DoubleType(), True),
    T.StructField("seq", T.LongType(), True),
])


def _rows(days, ids, seq=1):
    return [
        (i, dt.datetime(2024, 1, d, 12, 0, 0), float(i), seq)
        for d in days
        for i in ids
    ]


def _mk(spark, path, **kw):
    return ManagedTable.create(spark, str(path) + "/t", SCHEMA, **kw)


def test_evolve_day_to_month_reads_and_prunes_both_generations(spark, tmp_path):
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(spark.createDataFrame(_rows([1, 2, 15], [1, 2]), SCHEMA))
    assert t.set_partition_spec(
        partition_cols=["ts_month"],
        partition_transforms={"ts_month": "month(ts)"},
    ) == 1
    t.append(spark.createDataFrame(_rows([3, 20], [11, 12]), SCHEMA))

    # full read serves both layouts
    assert t.read().count() == 10
    # entries carry their spec ids
    specs = sorted(int(e.get("spec", 0)) for e in t._read_manifest())
    assert specs == [0, 1]

    # range read: Jan 1-3 — correct rows from both generations
    got = t.read_where(
        "ts", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3, 23, 59)
    )
    assert got.count() == 6  # days 1,2 (old spec) + day 3 (new spec)

    # pruning honored PER SPEC: the old entry's day dirs are subset to
    # the in-range days (day=15 pruned); the new entry keeps only the
    # January month dir (it has just one, so it survives whole)
    old_e = next(e for e in t._read_manifest() if not e.get("spec"))
    pruned = t._prune_entry_parts(
        old_e, "ts", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3, 23, 59)
    )
    assert len(pruned["parts"]) == 2  # day=01, day=02; day=15 skipped


def test_old_spec_pruning_survives_layout_migration_rewrite(spark, tmp_path):
    """compact() folds every entry into the CURRENT spec: old dirs
    disappear, and subsequent pruned reads ride the new layout."""
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(spark.createDataFrame(_rows([1, 15], [1, 2]), SCHEMA))
    t.set_partition_spec(
        partition_cols=["ts_month"],
        partition_transforms={"ts_month": "month(ts)"},
    )
    t.compact()
    entries = [
        e for e in t._read_manifest() if e.get("kind") != "tombstone"
    ]
    assert len(entries) == 1 and int(entries[0].get("spec", 0)) == 1
    assert all("ts_month=" in p for p in entries[0]["parts"])
    assert t.read().count() == 4


def test_mixed_spec_cow_merge_degrades_to_full_rewrite_and_migrates(
    spark, tmp_path
):
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
        key_cols=["id"], order_column="seq",
    )
    t.append(spark.createDataFrame(
        _rows([1], [1, 2]) + _rows([2], [3, 4]), SCHEMA
    ))
    t.set_partition_spec(
        partition_cols=["ts_month"],
        partition_transforms={"ts_month": "month(ts)"},
    )
    # upsert id=1/day=1 under the NEW spec: the pruned path's current-
    # spec dir strings could never match the old entry's day dirs, so
    # the merge must take the full rewrite (else id=1 would duplicate)
    t.merge(spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), 99.0, 2)], SCHEMA
    ))
    out = t.read()
    assert out.count() == 4
    assert out.filter(F.col("id") == 1).collect()[0].v == 99.0
    # the full rewrite migrated every entry to the current spec —
    # the next merge takes the pruned path again
    assert all(
        int(e.get("spec", 0)) == 1
        for e in t._read_manifest()
        if e.get("kind") != "tombstone"
    )


def test_mixed_spec_cow_delete_where_is_exact(spark, tmp_path):
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(spark.createDataFrame(_rows([1, 2], [1, 2]), SCHEMA))
    t.set_partition_spec(
        partition_cols=["ts_month"],
        partition_transforms={"ts_month": "month(ts)"},
    )
    t.append(spark.createDataFrame(_rows([3], [3]), SCHEMA))
    # victims live in an OLD-spec entry: the pruned path would miss them
    t.delete_where(F.col("id") == 1)
    assert sorted(r.id for r in t.read().collect()) == [2, 2, 3]


def test_mor_merge_across_spec_evolution_resolves(spark, tmp_path):
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
        key_cols=["id"], order_column="seq", table_type="MOR",
    )
    t.append(spark.createDataFrame(_rows([1], [1, 2]), SCHEMA))
    t.set_partition_spec()  # evolve to UNPARTITIONED
    t.merge(spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), 42.0, 2)], SCHEMA
    ))
    out = {r.id: r.v for r in t.read().collect()}
    assert out == {1: 42.0, 2: 2.0}
    # the old partitioned entry still has hive dirs → the unresolved
    # single-scan fast path must NOT engage (per-entry basePath union)
    assert t.read_unresolved().count() == 3


def test_set_partition_spec_validates(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not in schema"):
        t.set_partition_spec(partition_cols=["nope"])
    with pytest.raises(ValueError, match="source column"):
        t.set_partition_spec(
            partition_cols=["d"], partition_transforms={"d": "day(nope)"}
        )
    with pytest.raises(ValueError, match="collides"):
        t.set_partition_spec(
            partition_cols=["v"], partition_transforms={"v": "day(ts)"}
        )


def test_files_relation_reports_spec_ids(spark, tmp_path):
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(spark.createDataFrame(_rows([1], [1]), SCHEMA))
    t.set_partition_spec(
        partition_cols=["ts_month"],
        partition_transforms={"ts_month": "month(ts)"},
    )
    t.append(spark.createDataFrame(_rows([2], [2]), SCHEMA))
    assert {r.spec_id for r in t.files().collect()} == {0, 1}


def test_add_column_refused_for_live_superseded_spec_dir_name(
    spark, tmp_path
):
    """A new logical column matching an OLD spec's hidden dir name
    would be populated from directory values on old entries (partition
    discovery) instead of null-filling — refused while those entries
    live, allowed once compact() migrates them away."""
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    t.append(spark.createDataFrame(_rows([1], [1]), SCHEMA))
    t.set_partition_spec(
        partition_cols=["ts_month"],
        partition_transforms={"ts_month": "month(ts)"},
    )
    with pytest.raises(ValueError, match="partition column"):
        t.add_columns([T.StructField("ts_day", T.StringType(), True)])
    t.compact()  # migrates the old entry to the month layout
    t.add_columns([T.StructField("ts_day", T.StringType(), True)])
    assert t.read().filter(F.col("ts_day").isNotNull()).count() == 0


def test_widen_refused_for_live_superseded_bucket_spec(spark, tmp_path):
    """Old bucket entries prune by the hash of the NARROW type until a
    compaction migrates them — widening underneath would make point
    reads silently miss rows."""
    schema = T.StructType([
        T.StructField("id", T.IntegerType(), True),
        T.StructField("v", T.DoubleType(), True),
    ])
    t = ManagedTable.create(
        spark, str(tmp_path) + "/t", schema,
        partition_cols=["id_b"],
        partition_transforms={"id_b": "bucket(4, id)"},
    )
    t.append(spark.createDataFrame([(i, float(i)) for i in range(8)], schema))
    t.set_partition_spec()  # unpartitioned going forward
    with pytest.raises(ValueError, match="bucket"):
        t.widen_column("id", T.LongType())
    t.compact()
    t.widen_column("id", T.LongType())
    assert dict(t.read().dtypes)["id"] == "bigint"
    assert sorted(r.id for r in t.read_where("id", 3, 3).collect()) == [3]


def test_read_where_in_mixed_layout_roots(spark, tmp_path):
    """The single multi-root fast path cannot mix partitioned and bare
    roots (conflicting partition discovery) — after an evolution to
    unpartitioned it must take the per-entry path."""
    schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("v", T.DoubleType(), True),
    ])
    t = ManagedTable.create(
        spark, str(tmp_path) + "/t", schema,
        partition_cols=["id_b"],
        partition_transforms={"id_b": "bucket(2, id)"},
        key_cols=["id"],
    )
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], schema))
    t.set_partition_spec()
    t.append(spark.createDataFrame([(10, 10.0), (11, 11.0)], schema))
    got = sorted(r.id for r in t.read_where_in("id", [2, 10]).collect())
    assert got == [2, 10]


def test_count_rows_exact_after_pruned_merge(spark, tmp_path):
    """Regression: the COW pruned merge carried the whole-entry
    ``__rows`` stat into its parts-subset kept entry, so the
    metadata-only count_rows() overcounted (4 for a 3-row table)."""
    t = _mk(
        spark, tmp_path,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
        key_cols=["id"], order_column="seq",
    )
    t.append(spark.createDataFrame(_rows([1, 2], [1]), SCHEMA)
             .unionByName(spark.createDataFrame(_rows([2], [3]), SCHEMA)))
    t.merge(spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), 9.0, 2)], SCHEMA
    ))
    assert t.count_rows() == t.read().count() == 3

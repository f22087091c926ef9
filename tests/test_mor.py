"""Merge-on-read table mode: delta appends, read-time resolution,
compaction folding, time travel."""

import os

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from tests.test_table import SCHEMA, df_of


def make_mor(spark, tmp_path, policy="unconditional"):
    return ManagedTable.create(
        spark, os.path.join(str(tmp_path), "mor"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
        merge_policy=policy, table_type="MOR",
    )


def rows_of(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_mor_merge_appends_delta_and_resolves(spark, tmp_path):
    t = make_mor(spark, tmp_path)
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    t.merge(df_of(spark, [(1, "a", 10.0, 2), (3, "c", 3.0, 1)]))
    # manifest keeps the base untouched + one delta entry
    kinds = [e.get("kind", "base") for e in t._read_manifest()]
    assert kinds.count("delta") == 1
    assert rows_of(t) == [(1, "a", 10.0, 2), (2, "b", 2.0, 1), (3, "c", 3.0, 1)]


def test_mor_multiple_deltas_latest_commit_wins(spark, tmp_path):
    t = make_mor(spark, tmp_path)
    t.merge(df_of(spark, [(1, "a", 1.0, 1)]))
    t.merge(df_of(spark, [(1, "a", 2.0, 5)]))
    t.merge(df_of(spark, [(1, "a", 3.0, 3)]))  # later commit, older ts
    # unconditional policy: commit order wins (reference semantics)
    assert rows_of(t) == [(1, "a", 3.0, 3)]


def test_mor_latest_wins_policy_uses_order_column(spark, tmp_path):
    t = make_mor(spark, tmp_path, policy="latest_wins")
    t.merge(df_of(spark, [(1, "a", 1.0, 10)]))
    t.merge(df_of(spark, [(1, "a", 99.0, 5)]))  # stale ts in later commit
    assert rows_of(t) == [(1, "a", 1.0, 10)]


def test_mor_compact_folds_deltas_into_base(spark, tmp_path):
    t = make_mor(spark, tmp_path)
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    t.merge(df_of(spark, [(1, "a", 2.0, 2), (2, "b", 2.0, 1)]))
    before = rows_of(t)
    t.compact()
    manifest = t._read_manifest()
    assert len(manifest) == 1 and manifest[0].get("kind", "base") == "base"
    assert rows_of(t) == before


def test_mor_time_travel_resolves_historic_snapshot(spark, tmp_path):
    t = make_mor(spark, tmp_path)
    t.merge(df_of(spark, [(1, "a", 1.0, 1)]))
    v = t._current_version()
    t.merge(df_of(spark, [(1, "a", 2.0, 2)]))
    assert sorted(tuple(r) for r in t.read_version(v).collect()) == [(1, "a", 1.0, 1)]
    assert rows_of(t) == [(1, "a", 2.0, 2)]

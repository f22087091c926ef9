"""Incremental change reads (ManagedTable.read_changes).

Append-only and MOR tables serve change feeds file-level (only the
new entries are read — asserted on the physical plan, which must not
contain an Except); COW merges fall back to a row diff with the
documented semantics.
"""

import os

import pytest

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from tests.test_mor import make_mor
from tests.test_table import SCHEMA, df_of


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_changes_are_new_batch_only_file_level(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    v1 = t._current_version()
    t.append(df_of(spark, [(3, "c", 3.0, 1)]))
    ch = t.read_changes(v1)
    assert rows(ch) == [(3, "c", 3.0, 1)]
    # file-level path: no row-diff operator in the plan
    assert "Except" not in ch._jdf.queryExecution().executedPlan().toString()


def test_mor_changes_resolve_window_upserts(spark, tmp_path):
    t = make_mor(spark, tmp_path)
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    v1 = t._current_version()
    t.merge(df_of(spark, [(1, "a", 10.0, 2), (3, "c", 3.0, 1)]))
    t.merge(df_of(spark, [(1, "a", 20.0, 3)]))
    ch = t.read_changes(v1)
    # key 1 upserted twice in the window -> latest state once;
    # untouched key 2 absent
    assert rows(ch) == [(1, "a", 20.0, 3), (3, "c", 3.0, 1)]
    assert "Except" not in ch._jdf.queryExecution().executedPlan().toString()


def test_cow_merge_changes_fall_back_to_row_diff(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "cow"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    v1 = t._current_version()
    t.merge(df_of(spark, [(1, "a", 10.0, 2), (3, "c", 3.0, 1)]))
    ch = t.read_changes(v1)
    # updated row's new state + insert; unchanged row 2 cancels out
    assert rows(ch) == [(1, "a", 10.0, 2), (3, "c", 3.0, 1)]


def test_changes_bounds_and_identity(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "b"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    v = t._current_version()
    assert t.read_changes(v, v).count() == 0
    with pytest.raises(ValueError):
        t.read_changes(v + 1, v)


def test_changes_between_explicit_versions(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "w"), SCHEMA,
        partition_cols=["part"], key_cols=["id"], order_column="ts",
    )
    t.append(df_of(spark, [(1, "a", 1.0, 1)]))
    v1 = t._current_version()
    t.append(df_of(spark, [(2, "b", 2.0, 1)]))
    v2 = t._current_version()
    t.append(df_of(spark, [(3, "c", 3.0, 1)]))
    assert rows(t.read_changes(v1, v2)) == [(2, "b", 2.0, 1)]

"""read_changes_cdf: the net-effect change feed with row images, and
the retraction-aware rollup refresh built on it.

Window classification contract (Delta-CDF shape, windowed net effect):
insert / update_preimage / update_postimage / delete; byte-identical
upserts emit nothing; delete+reinsert inside one window nets to an
update; content-neutral rewrites (compaction) emit nothing.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _mk(spark, path, **kw):
    defaults = dict(
        key_cols=["k"],
        table_type="MOR",
        order_column="seq",
        merge_policy="latest_wins",
    )
    defaults.update(kw)
    return ManagedTable.create(spark, path, SCHEMA, **defaults)


def _rows(df):
    return sorted(
        (r["k"], r["v"], r["seq"], r["_change_type"]) for r in df.collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    return _mk(spark, os.path.join(str(tmp_path), "t"))


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_append_window_is_pure_inserts(spark, table):
    v0 = table._current_version()
    table.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    cdf = table.read_changes_cdf(v0)
    assert _rows(cdf) == [(1, "a", 1, "insert"), (2, "b", 1, "insert")]


def test_merge_window_classifies_updates_inserts_and_noops(spark, table):
    table.append(_df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]))
    v1 = table._current_version()
    # update k=2, byte-identical re-upsert k=3 (must vanish), insert k=4
    table.merge(_df(spark, [(2, "B", 2), (3, "c", 1), (4, "d", 2)]))
    assert _rows(table.read_changes_cdf(v1)) == [
        (2, "B", 2, "update_postimage"),
        (2, "b", 1, "update_preimage"),
        (4, "d", 2, "insert"),
    ]


def test_delete_window_emits_preimages(spark, table):
    table.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    v1 = table._current_version()
    table.delete_keys(spark.createDataFrame([(1,)], "k long"))
    assert _rows(table.read_changes_cdf(v1)) == [(1, "a", 1, "delete")]


def test_delete_of_absent_key_emits_nothing(spark, table):
    table.append(_df(spark, [(1, "a", 1)]))
    v1 = table._current_version()
    table.delete_keys(spark.createDataFrame([(99,)], "k long"))
    assert table.read_changes_cdf(v1).count() == 0


def test_delete_then_reinsert_nets_to_update(spark, table):
    table.append(_df(spark, [(1, "a", 1)]))
    v1 = table._current_version()
    table.delete_keys(spark.createDataFrame([(1,)], "k long"))
    table.merge(_df(spark, [(1, "a2", 3)]))
    assert _rows(table.read_changes_cdf(v1)) == [
        (1, "a", 1, "update_preimage"),
        (1, "a2", 3, "update_postimage"),
    ]


def test_upsert_then_delete_nets_to_delete_with_original_preimage(
    spark, table
):
    table.append(_df(spark, [(1, "a", 1)]))
    v1 = table._current_version()
    table.merge(_df(spark, [(1, "a2", 2)]))
    table.delete_keys(spark.createDataFrame([(1,)], "k long"))
    # net effect vs v1: the key is gone; the pre-image is v1's state
    assert _rows(table.read_changes_cdf(v1)) == [(1, "a", 1, "delete")]


def test_multi_upsert_window_emits_one_pre_post_pair(spark, table):
    table.append(_df(spark, [(1, "a", 1)]))
    v1 = table._current_version()
    table.merge(_df(spark, [(1, "b", 2)]))
    table.merge(_df(spark, [(1, "c", 3)]))
    assert _rows(table.read_changes_cdf(v1)) == [
        (1, "a", 1, "update_preimage"),
        (1, "c", 3, "update_postimage"),
    ]


def test_compaction_only_window_is_empty(spark, table):
    table.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    table.merge(_df(spark, [(2, "B", 2)]))
    v = table._current_version()
    table.compact()
    cdf = table.read_changes_cdf(v)
    assert cdf.count() == 0


def test_overwrite_window_full_diff(spark, table):
    table.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    v1 = table._current_version()
    table.overwrite(_df(spark, [(2, "B", 2), (3, "c", 1)]))
    assert _rows(table.read_changes_cdf(v1)) == [
        (1, "a", 1, "delete"),
        (2, "B", 2, "update_postimage"),
        (2, "b", 1, "update_preimage"),
        (3, "c", 1, "insert"),
    ]


def test_keyless_table_diffs_as_multiset(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "nk"), SCHEMA, key_cols=[]
    )
    t.append(_df(spark, [(1, "a", 1), (1, "a", 1), (2, "b", 1)]))
    v1 = t._current_version()
    t.overwrite(_df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]))
    # one duplicate of (1,a) removed, (3,c) added
    assert _rows(t.read_changes_cdf(v1)) == [
        (1, "a", 1, "delete"),
        (3, "c", 1, "insert"),
    ]


def test_empty_and_invalid_windows(spark, table):
    v = table._current_version()
    assert table.read_changes_cdf(v, v).count() == 0
    with pytest.raises(ValueError, match="newer"):
        table.read_changes_cdf(v + 1, v)
    out_cols = table.read_changes_cdf(v, v).columns
    assert out_cols == ["k", "v", "seq", "_change_type"]


def test_pre_image_read_prunes_base_entries_by_key_stats(
    spark, tmp_path, monkeypatch
):
    """The 100 TB shape claim: the base-state read touches only entries
    whose key stats intersect the window's affected keys — an old
    entry in a disjoint key range is never opened."""
    t = _mk(spark, os.path.join(str(tmp_path), "p"))
    t.append(_df(spark, [(i, "lo", 1) for i in range(1, 6)]))
    t.append(_df(spark, [(i, "hi", 1) for i in range(1000, 1006)]))
    v = t._current_version()
    t.merge(_df(spark, [(1002, "HI", 2)]))

    read_roots = []
    orig = ManagedTable._read_entry

    def spy(self, entry):
        read_roots.append(entry["root"])
        return orig(self, entry)

    monkeypatch.setattr(ManagedTable, "_read_entry", spy)
    changes = _rows(t.read_changes_cdf(v))
    assert changes == [
        (1002, "HI", 2, "update_postimage"),
        (1002, "hi", 1, "update_preimage"),
    ]
    lo_root = t._manifest_at(v)[0]["root"]
    assert lo_root not in read_roots, (
        "the low-range base entry must be stats-pruned out of the "
        "pre/post-image reads"
    )

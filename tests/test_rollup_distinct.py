"""Exact COUNT(DISTINCT) rollup maintenance (operators/rollup.py
distinct_cols): two-level IVM through a companion per-(group, value)
counts table.  The companion's value-counts are additive (fold
exactly-once under the window tag on ITS table); the rollup's
distinct count is read back absolute from the post-fold companion, so
it is correct on every side of a crash.  Each test compares against a
full COUNT(DISTINCT) re-aggregation of the source's final state."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    _STATE_KEY,
    companion_path,
    create_rollup,
    refresh_rollup,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _mk(spark, tmp):
    src = ManagedTable.create(
        spark,
        f"{tmp}/src",
        SCHEMA,
        key_cols=["id"],
        order_column="seq",
        table_type="MOR",
    )
    dst = create_rollup(
        src,
        f"{tmp}/roll",
        ["grp"],
        ["v"],
        consume_from=1,
        distinct_cols=["v"],
    )
    return src, dst


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v, seq=s) for i, g, v, s in rows], SCHEMA
    )


def _refresh(src, dst):
    return refresh_rollup(src, dst, ["grp"], ["v"], distinct_cols=["v"])


def _state(dst):
    return {
        r.grp: (r.n_rows, r.sum_v, r.n_distinct_v)
        for r in dst.read().collect()
    }


def _oracle(src):
    return {
        r.grp: (r.n, float(r.s), r.d)
        for r in src.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.countDistinct("v").alias("d"),
        )
        .collect()
    }


def test_companion_table_provisioned(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    comp = ManagedTable.load(spark, companion_path(f"{tmp_path}/roll", "v"))
    assert comp.meta.key_cols == ["grp", "v"]


def test_duplicate_values_count_once(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(
        _rows(spark, [(1, "a", 7, 1), (2, "a", 7, 1), (3, "a", 9, 1),
                      (4, "b", 7, 1)])
    )
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)
    assert _state(dst)["a"] == (3, 23.0, 2)


def test_delete_one_of_two_duplicates_keeps_distinct(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 7, 1), (2, "a", 7, 1), (3, "a", 9, 1)]))
    _refresh(src, dst)
    # removing ONE holder of value 7 must NOT drop the distinct count —
    # only the companion knows another row still carries 7
    src.delete_keys(spark.createDataFrame([Row(id=1)]))
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)
    assert _state(dst)["a"] == (2, 16.0, 2)
    # removing the second holder finally retires the value
    src.delete_keys(spark.createDataFrame([Row(id=2)]))
    _refresh(src, dst)
    assert _state(dst)["a"] == (1, 9.0, 1)


def test_update_moves_value_between_groups(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 7, 1), (2, "b", 5, 1)]))
    _refresh(src, dst)
    src.merge(_rows(spark, [(1, "b", 7, 2)]))
    _refresh(src, dst)
    st = _state(dst)
    assert st == _oracle(src)
    assert "a" not in st  # group emptied
    assert st["b"] == (2, 12.0, 2)


def test_null_values_do_not_count(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(
        spark.createDataFrame(
            [Row(id=1, grp="a", v=None, seq=1), Row(id=2, grp="a", v=4, seq=1)],
            SCHEMA,
        )
    )
    _refresh(src, dst)
    assert _state(dst)["a"] == (2, 4.0, 1)


def test_crash_between_companion_and_rollup_fold(spark, tmp_path, monkeypatch):
    """Crash AFTER the companion's tagged merge but BEFORE the rollup
    merge: the replay must skip the companion fold (its tag is live)
    yet still run the rollup fold — and land exactly."""
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 7, 1), (2, "a", 7, 1), (3, "b", 5, 1)]))
    _refresh(src, dst)
    src.delete_keys(spark.createDataFrame([Row(id=1)]))

    orig = ManagedTable.merge
    armed = {"crashed": False}
    roll_path = f"{tmp_path}/roll"

    def crashing(self, df, *a, **kw):
        if not armed["crashed"] and self.path == roll_path:
            armed["crashed"] = True
            raise RuntimeError("simulated crash before rollup fold")
        return orig(self, df, *a, **kw)

    monkeypatch.setattr(ManagedTable, "merge", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _refresh(src, dst)
    # companion folded, rollup did not, cursor did not advance
    comp = ManagedTable.load(spark, companion_path(roll_path, "v"))
    assert {(r.grp, r.v): r.n_rows for r in comp.read().collect()} == {
        ("a", 7): 1,
        ("b", 5): 1,
    }
    assert int(dst.meta.properties[_STATE_KEY]) < src._current_version()

    _refresh(src, dst)  # replay: companion skipped, rollup folds
    assert _state(dst) == _oracle(src)
    assert _state(dst)["a"] == (1, 7.0, 1)


def test_crash_after_rollup_fold_before_cursor(spark, tmp_path, monkeypatch):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 7, 1), (2, "a", 9, 1)]))
    _refresh(src, dst)
    src.merge(_rows(spark, [(1, "a", 9, 2)]))  # 7 retired, 9 duplicated

    orig = ManagedTable.set_properties
    armed = {"on": True}

    def crashing(self, **kv):
        if armed["on"] and _STATE_KEY in kv:
            armed["on"] = False
            raise RuntimeError("simulated crash before cursor write")
        return orig(self, **kv)

    monkeypatch.setattr(ManagedTable, "set_properties", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _refresh(src, dst)
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)
    assert _state(dst)["a"] == (2, 18.0, 1)


def test_refuses_group_column_as_distinct(spark, tmp_path):
    src = ManagedTable.create(
        spark, f"{tmp_path}/src", SCHEMA, key_cols=["id"], table_type="MOR"
    )
    with pytest.raises(ValueError, match="is a group column"):
        create_rollup(
            src, f"{tmp_path}/r", ["grp"], [], distinct_cols=["grp"]
        )


def test_refresh_refuses_mismatched_rollup(spark, tmp_path):
    src = ManagedTable.create(
        spark, f"{tmp_path}/src", SCHEMA, key_cols=["id"], table_type="MOR"
    )
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], ["v"], consume_from=1)
    src.append(_rows(spark, [(1, "a", 1, 1)]))
    with pytest.raises(ValueError, match="lacks aggregate columns"):
        refresh_rollup(src, dst, ["grp"], ["v"], distinct_cols=["v"])


def test_reaggregate_to_coarser_group(spark, tmp_path):
    """MV routing: a rollup grouped by (grp, sub) answers GROUP BY grp
    — counts/sums re-add, extremes re-fold, and COUNT(DISTINCT) is
    recounted from the companion (summing per-group distinct counts
    would overcount values shared across fine groups)."""
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        reaggregate_rollup,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("grp", T.StringType()),
            T.StructField("sub", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    src = ManagedTable.create(
        spark, f"{tmp_path}/src", schema, key_cols=["id"], table_type="MOR"
    )
    dst = create_rollup(
        src,
        f"{tmp_path}/roll",
        ["grp", "sub"],
        ["v"],
        consume_from=1,
        min_cols=["v"],
        max_cols=["v"],
        distinct_cols=["v"],
    )
    kw = {"min_cols": ["v"], "max_cols": ["v"], "distinct_cols": ["v"]}
    # value 7 appears in BOTH subgroups of 'a': the coarse distinct
    # count must be 2 (7, 9), not 3 (the sum of per-subgroup counts)
    src.append(
        spark.createDataFrame(
            [
                Row(id=1, grp="a", sub="x", v=7),
                Row(id=2, grp="a", sub="y", v=7),
                Row(id=3, grp="a", sub="y", v=9),
                Row(id=4, grp="b", sub="x", v=1),
            ],
            schema,
        )
    )
    refresh_rollup(src, dst, ["grp", "sub"], ["v"], **kw)
    out = {
        r.grp: (r.n_rows, r.sum_v, r.min_v, r.max_v, r.n_distinct_v)
        for r in reaggregate_rollup(
            dst, ["grp"], sum_cols=["v"], **kw
        ).collect()
    }
    assert out == {"a": (3, 23.0, 7, 9, 2), "b": (1, 1.0, 1, 1, 1)}
    # global granularity (empty subset): one row, distinct over all
    g = reaggregate_rollup(dst, [], sum_cols=["v"], **kw).collect()[0]
    assert (g.n_rows, g.sum_v, g.min_v, g.max_v, g.n_distinct_v) == (
        4, 24.0, 1, 9, 3,
    )
    with pytest.raises(ValueError, match="not rollup group"):
        reaggregate_rollup(dst, ["nope"])


def test_composes_with_min_max(spark, tmp_path):
    """distinct + extremes in one rollup: a delete that retires a
    duplicated value (distinct unchanged) while removing the stored
    maximum (rescan path) — the two mechanisms must not interfere."""
    src = ManagedTable.create(
        spark,
        f"{tmp_path}/src",
        SCHEMA,
        key_cols=["id"],
        order_column="seq",
        table_type="MOR",
    )
    dst = create_rollup(
        src,
        f"{tmp_path}/roll",
        ["grp"],
        ["v"],
        consume_from=1,
        min_cols=["v"],
        max_cols=["v"],
        distinct_cols=["v"],
    )
    kw = {"min_cols": ["v"], "max_cols": ["v"], "distinct_cols": ["v"]}
    src.append(_rows(spark, [(1, "a", 7, 1), (2, "a", 7, 1), (3, "a", 3, 1)]))
    refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    src.delete_keys(spark.createDataFrame([Row(id=1)]))
    refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    r = {x.grp: (x.n_rows, x.min_v, x.max_v, x.n_distinct_v)
         for x in dst.read().collect()}
    assert r["a"] == (2, 3, 7, 2)
    src.delete_keys(spark.createDataFrame([Row(id=2)]))
    refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    r = {x.grp: (x.n_rows, x.min_v, x.max_v, x.n_distinct_v)
         for x in dst.read().collect()}
    assert r["a"] == (1, 3, 3, 1)

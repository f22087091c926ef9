"""Crash-replay exactness of refresh_rollup (operators/rollup.py).

The fold commits under a window-derived tag (``rollup-<lo>-<hi>``)
BEFORE the consume cursor advances in a separate metadata write.  A
crash anywhere between those two steps redelivers the SAME window; the
replay must find the tag and skip the fold — re-adding the delta onto
state that already contains it would over-count every affected group
permanently (the failure class the BM25 index guards against with the
same tag machinery, tests/test_search_index.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import table as tbl_mod
from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    _STATE_KEY,
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


def _mk_src(spark, tmp):
    return ManagedTable.create(
        spark,
        f"{tmp}/src",
        SCHEMA,
        key_cols=["id"],
        order_column="seq",
        table_type="MOR",
    )


def _rows(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, v=v, seq=s) for i, g, v, s in rows], SCHEMA
    )


def _state(dst):
    return {
        r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()
    }


def _oracle(src):
    return {
        r.grp: (r.n, float(r.s))
        for r in src.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def _crash_on_cursor_write(monkeypatch):
    """Arm set_properties to blow up ONCE on the rollup-cursor write —
    the exact moment after the fold committed but before the window
    was marked consumed."""
    orig = ManagedTable.set_properties
    armed = {"on": True}

    def crashing(self, **kv):
        if armed["on"] and _STATE_KEY in kv:
            armed["on"] = False
            raise RuntimeError("simulated crash before cursor write")
        return orig(self, **kv)

    monkeypatch.setattr(ManagedTable, "set_properties", crashing)
    return armed


def test_crash_between_fold_and_cursor_is_exact_on_replay(
    spark, tmp_path, monkeypatch
):
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 20, 1), (3, "b", 5, 1)]))
    dst = create_rollup(src, f"{tmp_path}/roll", ["grp"], ["v"], consume_from=1)
    refresh_rollup(src, dst, ["grp"], ["v"])
    assert _state(dst) == _oracle(src)

    # window 2: an upsert that moves id=2 a->b and a fresh insert
    src.merge(_rows(spark, [(2, "b", 25, 2), (4, "a", 7, 2)]))

    _crash_on_cursor_write(monkeypatch)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_rollup(src, dst, ["grp"], ["v"])
    # the fold landed but the cursor did not advance
    assert int(dst.meta.properties[_STATE_KEY]) < src._current_version()

    # redelivery: must NOT re-add the already-folded delta
    refresh_rollup(src, dst, ["grp"], ["v"])
    assert _state(dst) == _oracle(src)
    assert int(
        ManagedTable.load(spark, f"{tmp_path}/roll").meta.properties[_STATE_KEY]
    ) == src._current_version()

    # and a further no-change refresh stays a no-op
    v = dst._current_version()
    assert refresh_rollup(src, dst, ["grp"], ["v"]) == v


def test_crash_before_emptied_group_delete_heals(spark, tmp_path, monkeypatch):
    """Crash AFTER the tagged fold but BEFORE the emptied-group delete:
    the zero-count marker row the fold wrote must be swept away by the
    replay, not left behind and not double-retracted."""
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (3, "b", 5, 1)]))
    dst = create_rollup(src, f"{tmp_path}/roll", ["grp"], ["v"], consume_from=1)
    refresh_rollup(src, dst, ["grp"], ["v"])

    # empty group b entirely
    src.delete_keys(spark.createDataFrame([Row(id=3)]))

    orig_delete = ManagedTable.delete_keys
    armed = {"on": True}

    def crashing_delete(self, keys_df, tag=None):
        if armed["on"] and self.path == dst.path:
            armed["on"] = False
            raise RuntimeError("simulated crash before emptied-group delete")
        return orig_delete(self, keys_df, tag=tag)

    monkeypatch.setattr(ManagedTable, "delete_keys", crashing_delete)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_rollup(src, dst, ["grp"], ["v"])
    # the fold committed a zero-count marker for b; cursor still behind
    assert _state(dst)["b"][0] == 0
    assert int(dst.meta.properties[_STATE_KEY]) < src._current_version()

    refresh_rollup(src, dst, ["grp"], ["v"])
    assert _state(dst) == _oracle(src)  # b is GONE, a untouched
    assert "b" not in _state(dst)


def test_double_crash_same_window_still_exact(spark, tmp_path, monkeypatch):
    """Two consecutive crashed replays of one window (tag lands on the
    first, cursor write dies on both) still converge bit-exact."""
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "b", 3, 1)]))
    dst = create_rollup(src, f"{tmp_path}/roll", ["grp"], ["v"], consume_from=1)
    refresh_rollup(src, dst, ["grp"], ["v"])
    src.merge(_rows(spark, [(1, "a", 11, 2), (5, "b", 4, 2)]))

    orig = ManagedTable.set_properties
    remaining = {"n": 2}

    def crashing(self, **kv):
        if remaining["n"] > 0 and _STATE_KEY in kv:
            remaining["n"] -= 1
            raise RuntimeError("simulated crash before cursor write")
        return orig(self, **kv)

    monkeypatch.setattr(ManagedTable, "set_properties", crashing)
    for _ in range(2):
        with pytest.raises(RuntimeError, match="simulated crash"):
            refresh_rollup(src, dst, ["grp"], ["v"])
    refresh_rollup(src, dst, ["grp"], ["v"])
    assert _state(dst) == _oracle(src)

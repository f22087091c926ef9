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


def test_crash_then_new_source_commit_before_retry_is_exact(
    spark, tmp_path, monkeypatch
):
    """The replay-window trap: the fold for (last, c1] commits, the
    cursor write crashes, and the source gains ANOTHER commit before
    the retry (the job path re-commits a redelivered batch before
    maintenance re-runs).  The retry's natural window is (last, c2] —
    a tag that does not exist — so without window RECOVERY it would
    re-fold the already-absorbed (last, c1] delta.  The retry must
    complete the crashed window exactly, then fold only (c1, c2]."""
    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "b", 3, 1)]))
    dst = create_rollup(src, f"{tmp_path}/roll", ["grp"], ["v"], consume_from=1)
    refresh_rollup(src, dst, ["grp"], ["v"])

    src.merge(_rows(spark, [(3, "a", 7, 2)]))  # window (c0, c1]
    _crash_on_cursor_write(monkeypatch)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_rollup(src, dst, ["grp"], ["v"])
    # the fold for (c0, c1] is live; now the source moves on
    src.merge(_rows(spark, [(4, "b", 5, 2), (1, "a", 12, 2)]))  # (c1, c2]

    refresh_rollup(src, dst, ["grp"], ["v"])
    assert _state(dst) == _oracle(src)
    assert int(dst.meta.properties[_STATE_KEY]) == src._current_version()
    # idempotent from here
    v = dst._current_version()
    assert refresh_rollup(src, dst, ["grp"], ["v"]) == v
    assert _state(dst) == _oracle(src)


def test_companion_fold_crash_then_new_commit_recovers_window(
    spark, tmp_path, monkeypatch
):
    """Crash BETWEEN the companion's tagged fold and the rollup's fold,
    then a new source commit before the retry: the companion's tag
    must pin the retry to the crashed window (else the companion
    double-folds (last, c1] under the new window's tag)."""
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        companion_path,
    )

    src = _mk_src(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "b", 3, 1)]))
    dst = create_rollup(
        src,
        f"{tmp_path}/roll",
        ["grp"],
        ["v"],
        consume_from=1,
        distinct_cols=["v"],
    )
    refresh_rollup(src, dst, ["grp"], ["v"], distinct_cols=["v"])

    src.merge(_rows(spark, [(3, "a", 10, 2)]))  # duplicate value in a

    orig_merge = ManagedTable.merge
    armed = {"on": True}

    def crashing_merge(self, source, **kw):
        # let the companion's tagged fold through; die on the rollup's
        if armed["on"] and self.path == dst.path and kw.get("tag"):
            armed["on"] = False
            raise RuntimeError("simulated crash after companion fold")
        return orig_merge(self, source, **kw)

    monkeypatch.setattr(ManagedTable, "merge", crashing_merge)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_rollup(src, dst, ["grp"], ["v"], distinct_cols=["v"])
    comp = ManagedTable.load(spark, companion_path(dst.path, "v"))
    assert comp.find_commit_tag("rollup-", stop_prefix=None) is not None

    src.merge(_rows(spark, [(4, "a", 99, 2)]))  # source moves on

    refresh_rollup(src, dst, ["grp"], ["v"], distinct_cols=["v"])
    got = {
        r.grp: (r.n_rows, r.sum_v, r.n_distinct_v)
        for r in dst.read().collect()
    }
    oracle = {
        r.grp: (r.n, float(r.s), r.nd)
        for r in src.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.countDistinct("v").alias("nd"),
        )
        .collect()
    }
    assert got == oracle
    # companion holds true per-(group, value) counts — the double-fold
    # failure mode would show n_rows=2 for (a, 10) twice-folded to 4
    cgot = {
        (r.grp, r.v): r.n_rows for r in comp.read().collect()
    }
    assert cgot[("a", 10)] == 2

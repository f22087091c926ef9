"""MIN/MAX rollup maintenance (operators/rollup.py min_cols/max_cols).

Extremes are outside the additive family: an insert folds
incrementally (least/greatest against the stored value), but a
retraction of the stored extreme says nothing about the runner-up —
those groups must be RESCANNED from the source, pinned at the consumed
window's high version.  Every test compares the incrementally
maintained rollup against a full re-aggregation of the source's final
state (the oracle the incremental path must be indistinguishable
from)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _refresh(src, dst):
    return refresh_rollup(
        src, dst, ["grp"], ["v"], min_cols=["v"], max_cols=["v"]
    )


def _state(dst):
    return {
        r.grp: (r.n_rows, r.sum_v, r.min_v, r.max_v)
        for r in dst.read().collect()
    }


def _oracle(src):
    return {
        r.grp: (r.n, float(r.s), r.lo, r.hi)
        for r in src.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def _mk(spark, tmp):
    src = _mk_src(spark, tmp)
    dst = create_rollup(
        src,
        f"{tmp}/roll",
        ["grp"],
        ["v"],
        consume_from=1,
        min_cols=["v"],
        max_cols=["v"],
    )
    return src, dst


def test_schema_carries_source_type(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    by_name = {f.name: f.dataType for f in dst.meta.schema.fields}
    assert by_name["min_v"] == T.IntegerType()
    assert by_name["max_v"] == T.IntegerType()


def test_append_only_fold(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 3, 1), (3, "b", 5, 1)]))
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)
    # second append folds least/greatest against the stored extreme
    src.append(_rows(spark, [(4, "a", 1, 2), (5, "b", 99, 2)]))
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)


def test_delete_of_stored_minimum_rescans_runner_up(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 3, 1), (3, "a", 7, 1)]))
    _refresh(src, dst)
    assert _state(dst)["a"] == (3, 20.0, 3, 10)
    # delete the row holding the group minimum: the fold alone cannot
    # know the runner-up — only the rescan can produce 7
    src.delete_keys(spark.createDataFrame([Row(id=2)]))
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)
    assert _state(dst)["a"] == (2, 17.0, 7, 10)


def test_update_moves_extreme_between_groups(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 1, 1), (2, "a", 50, 1), (3, "b", 5, 1)]))
    _refresh(src, dst)
    # id=1 held a's min; it moves to b and becomes b's min
    src.merge(_rows(spark, [(1, "b", 1, 2)]))
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)
    assert _state(dst)["a"] == (1, 50.0, 50, 50)
    assert _state(dst)["b"] == (2, 6.0, 1, 5)


def test_emptied_group_is_deleted(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (3, "b", 5, 1)]))
    _refresh(src, dst)
    src.delete_keys(spark.createDataFrame([Row(id=3)]))
    _refresh(src, dst)
    st = _state(dst)
    assert "b" not in st
    assert st == _oracle(src)


def test_in_place_value_update_same_group(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 3, 1)]))
    _refresh(src, dst)
    # raise the minimum row's value without changing its group: the
    # pre-image retraction forces a rescan of 'a'
    src.merge(_rows(spark, [(2, "a", 40, 2)]))
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)
    assert _state(dst)["a"] == (2, 50.0, 10, 40)


def test_crash_replay_is_exact_with_extremes(spark, tmp_path, monkeypatch):
    """Crash between the tagged fold (which includes the rescan's
    recomputed rows) and the cursor write: the replay must skip the
    fold — min/max folds are idempotent, but the count/sum part is
    not, and both travel in the same commit."""
    src, dst = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 3, 1), (3, "b", 5, 1)]))
    _refresh(src, dst)
    src.merge(_rows(spark, [(2, "b", 25, 2), (4, "a", 7, 2)]))

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


def test_null_values_are_skipped(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.append(
        spark.createDataFrame(
            [Row(id=1, grp="a", v=None, seq=1), Row(id=2, grp="a", v=4, seq=1)],
            SCHEMA,
        )
    )
    _refresh(src, dst)
    st = _state(dst)
    assert st["a"][0] == 2  # null row still counts
    assert st["a"][2] == 4 and st["a"][3] == 4
    # delete the only non-null row: rescan leaves null extremes
    src.delete_keys(spark.createDataFrame([Row(id=2)]))
    _refresh(src, dst)
    st = _state(dst)
    assert st["a"] == (1, 0.0, None, None)


def test_refresh_refuses_mismatched_rollup(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/roll", ["grp"], ["v"], consume_from=1)
    src.append(_rows(spark, [(1, "a", 10, 1)]))
    with pytest.raises(ValueError, match="lacks aggregate columns"):
        refresh_rollup(src, dst, ["grp"], ["v"], min_cols=["v"])


def test_rescan_isin_reaches_parquet_on_compacted_source(spark, tmp_path):
    """Plan gate for the rescan's scale shape: when the pinned source
    version is delta-free (post-compaction steady state), the
    affected-group isin built by ``_rescan_base`` must be PUSHED into
    the parquet FileScan (row-group skip) — the MOR resolution
    boundary only blocks the pushdown while deltas pend (see
    refresh_rollup docstring).  Oversized value sets and multi-column
    groups must fall back to the broadcast semi-join, never a
    cartesian."""
    from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
        _rescan_base,
    )

    src, _ = _mk(spark, tmp_path)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 3, 1),
                             (3, "b", 5, 1)]))
    src.delete_keys(spark.createDataFrame([Row(id=2)]))
    src.compact()  # folds the tombstone: pinned read is a plain scan
    cur = src._current_version()
    keys = spark.createDataFrame([Row(grp="a")])

    plan = (
        _rescan_base(src, cur, ["grp"], keys, cap=4096)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Catalyst folds a 1-value isin to EqualTo — either way the
    # predicate must appear in PushedFilters at the FileScan
    pushed = plan.split("PushedFilters: [", 1)[1].splitlines()[0]
    assert "In(grp" in pushed or "EqualTo(grp" in pushed, plan[:1500]
    assert "BroadcastNestedLoop" not in plan

    # cap exceeded → broadcast semi-join, no isin collect
    plan2 = (
        _rescan_base(src, cur, ["grp"], keys, cap=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EqualTo(grp" not in plan2 and "In(grp" not in plan2
    assert "LeftSemi" in plan2 and "BroadcastNestedLoop" not in plan2


def test_many_group_fallback_matches_pushdown(spark, tmp_path):
    """Force the broadcast-semi-join fallback (cap=0 property) and
    check it agrees with the oracle — the isin pushdown and the
    fallback are the same rescan, differently planned."""
    src, dst = _mk(spark, tmp_path)
    dst.set_properties(**{"rollup.max-rescan-groups": "0"})
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 3, 1), (3, "b", 5, 1)]))
    _refresh(src, dst)
    src.delete_keys(spark.createDataFrame([Row(id=2)]))
    _refresh(src, dst)
    assert _state(dst) == _oracle(src)

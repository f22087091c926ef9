"""Incrementally-maintained join materializations (operators/join_mv.py):
affected-key recompute from both sources' change feeds — never a full
re-join — exact against the full join of current states after every
refresh, idempotent under crash replay by construction."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.join_mv import (
    create_join_mv,
    refresh_join_mv,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

ORDERS = T.StructType([
    T.StructField("o_id", T.LongType(), False),
    T.StructField("o_cust", T.LongType(), True),
    T.StructField("o_cents", T.LongType(), True),
])
CUST = T.StructType([
    T.StructField("c_id", T.LongType(), False),
    T.StructField("c_seg", T.StringType(), True),
])


def _mk(spark, tmp):
    o = ManagedTable.create(spark, f"{tmp}/o", ORDERS,
                            key_cols=["o_id"], table_type="MOR")
    c = ManagedTable.create(spark, f"{tmp}/c", CUST,
                            key_cols=["c_id"], table_type="MOR")
    mv = create_join_mv(o, c, f"{tmp}/mv", on=("o_cust", "c_id"),
                        consume_from=(1, 1))
    return o, c, mv


def _orows(spark, rows):
    return spark.createDataFrame(
        [Row(o_id=a, o_cust=b, o_cents=c) for a, b, c in rows], ORDERS)


def _crows(spark, rows):
    return spark.createDataFrame(
        [Row(c_id=a, c_seg=b) for a, b in rows], CUST)


def _expect(o, c):
    return {
        tuple(r) for r in o.read().join(
            c.read(), F.col("o_cust") == F.col("c_id"), "inner"
        ).select("o_id", "o_cust", "o_cents", "c_id", "c_seg").collect()
    }


def _got(mv):
    return {
        tuple(r) for r in mv.read().select(
            "o_id", "o_cust", "o_cents", "c_id", "c_seg").collect()
    }


def test_full_lifecycle_matches_full_join(spark, tmp_path):
    o, c, mv = _mk(spark, tmp_path)
    c.append(_crows(spark, [(1, "A"), (2, "B"), (3, "C")]))
    o.append(_orows(spark, [(10, 1, 100), (11, 1, 110), (12, 2, 120),
                            (13, 9, 130)]))  # 13 dangles: no customer 9
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)
    assert len(_got(mv)) == 3

    # non-key update on the left
    o.merge(_orows(spark, [(10, 1, 999)]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)

    # JOIN KEY MOVES: order 11 leaves customer 1 for customer 3 —
    # the old pair must vanish, the new one appear
    o.merge(_orows(spark, [(11, 3, 110)]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)
    assert (11, 3, 110, 3, "C") in _got(mv)

    # right-side attribute update fans out to every matching MV row
    c.merge(_crows(spark, [(1, "A2")]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)

    # left delete removes its pair; a dangling order joining later
    o.delete_keys(spark.createDataFrame([Row(o_id=12)]))
    c.append(_crows(spark, [(9, "Z")]))  # order 13 now matches
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)
    assert (13, 9, 130, 9, "Z") in _got(mv)

    # right delete removes ALL pairs of that customer
    c.delete_keys(spark.createDataFrame([Row(c_id=3)]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)

    # caught up: refresh is a no-op
    v = mv._current_version()
    assert refresh_join_mv(o, c, mv, on=("o_cust", "c_id")) == v


def test_crash_replay_converges(spark, tmp_path, monkeypatch):
    """Recompute semantics: a refresh that died before its cursor
    write replays the window and converges — no tag machinery
    needed, unlike the additive rollup."""
    o, c, mv = _mk(spark, tmp_path)
    c.append(_crows(spark, [(1, "A"), (2, "B")]))
    o.append(_orows(spark, [(10, 1, 100), (11, 2, 110)]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))

    o.merge(_orows(spark, [(10, 2, 200), (12, 1, 120)]))

    orig = ManagedTable.set_properties
    armed = {"on": True}

    def crashing(self, **kv):
        if armed["on"] and "join-mv.left-version" in kv:
            armed["on"] = False
            raise RuntimeError("simulated crash before cursor write")
        return orig(self, **kv)

    monkeypatch.setattr(ManagedTable, "set_properties", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)


def test_compaction_in_window_is_skipped_not_full_diffed(spark, tmp_path):
    """A maintenance commit inside the consumed window splits the
    segments (change_segments) — refresh stays exact across it."""
    o, c, mv = _mk(spark, tmp_path)
    c.append(_crows(spark, [(1, "A"), (2, "B")]))
    o.append(_orows(spark, [(10, 1, 100)]))
    o.merge(_orows(spark, [(11, 2, 110)]))
    o.compact()
    o.merge(_orows(spark, [(10, 2, 105)]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)


def test_distributed_path_past_the_key_cap(spark, tmp_path):
    o, c, mv = _mk(spark, tmp_path)
    mv.set_properties(**{"join-mv.max-affected-keys": "3"})
    c.append(_crows(spark, [(i, f"s{i}") for i in range(20)]))
    o.append(_orows(spark, [(100 + i, i % 20, 10 * i) for i in range(60)]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)
    assert len(_got(mv)) == 60
    # incremental on top of the distributed bootstrap
    o.delete_keys(spark.createDataFrame([Row(o_id=100 + i) for i in range(10)]))
    refresh_join_mv(o, c, mv, on=("o_cust", "c_id"))
    assert _got(mv) == _expect(o, c)


def test_create_validations(spark, tmp_path):
    o = ManagedTable.create(spark, f"{tmp_path}/o", ORDERS,
                            key_cols=["o_id"], table_type="MOR")
    c = ManagedTable.create(spark, f"{tmp_path}/c", CUST,
                            key_cols=["c_id"], table_type="MOR")
    with pytest.raises(ValueError, match="missing"):
        create_join_mv(o, c, f"{tmp_path}/mv1", on=("o_cust", "c_id"),
                       left_cols=["o_cust", "o_cents"])  # no o_id key
    with pytest.raises(ValueError, match="not in source schema"):
        create_join_mv(o, c, f"{tmp_path}/mv2", on=("o_cust", "c_id"),
                       left_cols=["o_id", "o_cust", "nope"])
    k = ManagedTable.create(
        spark, f"{tmp_path}/k",
        T.StructType([T.StructField("o_id", T.LongType(), False),
                      T.StructField("c_id", T.LongType(), True)]),
        key_cols=["o_id"], table_type="MOR")
    with pytest.raises(ValueError, match="collide"):
        create_join_mv(k, c, f"{tmp_path}/mv3", on=("c_id", "c_id"))

"""asof_join direction/tolerance semantics (operators/asof.py) against
a hand-computed fixture — backward, forward, nearest, ties, and
tolerance nulling, on numeric timestamps."""

import pytest

from s3_sqs_data_ingestion_demo_spark.operators.asof import asof_join

# key k=1: right rows at ts 10 (r10) and 20 (r20)
LEFT = [(1, 5, "l5"), (1, 10, "l10"), (1, 14, "l14"), (1, 16, "l16"), (1, 30, "l30"), (2, 7, "lone")]
RIGHT = [(1, 10, "r10"), (1, 20, "r20")]


def _run(spark, **kw):
    left = spark.createDataFrame(LEFT, "k int, ts int, lv string")
    right = spark.createDataFrame(RIGHT, "k int, ts int, rv string")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", **kw)
    return {(r.k, r.ts): (r.rv_asof, r.ts_asof) for r in out.collect()}


def test_backward(spark):
    got = _run(spark)
    assert got[(1, 5)] == (None, None)       # nothing at or before 5
    assert got[(1, 10)] == ("r10", 10)       # same-instant tie -> right row
    assert got[(1, 14)] == ("r10", 10)
    assert got[(1, 30)] == ("r20", 20)
    assert got[(2, 7)] == (None, None)       # key with no right rows


def test_forward(spark):
    got = _run(spark, direction="forward")
    assert got[(1, 5)] == ("r10", 10)
    assert got[(1, 10)] == ("r10", 10)       # same-instant tie matches
    assert got[(1, 14)] == ("r20", 20)
    assert got[(1, 30)] == (None, None)      # nothing at or after 30
    assert got[(2, 7)] == (None, None)


def test_nearest_with_backward_ties(spark):
    got = _run(spark, direction="nearest")
    assert got[(1, 5)] == ("r10", 10)        # only forward exists
    assert got[(1, 14)] == ("r10", 10)       # 4 back vs 6 forward
    assert got[(1, 16)] == ("r20", 20)       # 6 back vs 4 forward
    assert got[(1, 30)] == ("r20", 20)       # only backward exists
    # equidistant (15 would tie): add explicitly
    left = spark.createDataFrame([(1, 15, "l15")], "k int, ts int, lv string")
    right = spark.createDataFrame(RIGHT, "k int, ts int, rv string")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", direction="nearest")
    assert out.collect()[0].rv_asof == "r10"  # tie resolves backward


def test_tolerance_nulls_far_matches(spark):
    got = _run(spark, direction="backward", tolerance=3)
    assert got[(1, 10)] == ("r10", 10)
    assert got[(1, 14)] == (None, None)      # 4 away > 3
    got_f = _run(spark, direction="forward", tolerance=4)
    assert got_f[(1, 16)] == ("r20", 20)     # 4 away, within
    assert got_f[(1, 5)] == (None, None)     # 5 away > 4


def test_unknown_direction_rejected(spark):
    with pytest.raises(ValueError, match="direction"):
        _run(spark, direction="sideways")

"""Fixed-bin histogram rollups (operators/rollup.py hist_cols +
rollup_quantiles).

Histograms are in the ADDITIVE family: per-bin counts fold with signed
weights, so retractions (updates/deletes via the CDF) subtract exactly
and no rescan is ever needed — the invariant every test here pins is
"maintained histogram == histogram recomputed from the final state",
bit-exact, across append / upsert / delete streams, null groups, the
MIN/MAX rescan path, and crash replay under the shared window tag."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    _STATE_KEY,
    create_rollup,
    hist_bin_expr,
    reaggregate_rollup,
    refresh_rollup,
    rollup_quantiles,
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

HIST = {"v": (0.0, 100.0, 10)}  # 10 bins of width 10 + under/overflow


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


def _hist_state(dst):
    return {r.grp: list(r.hist_v) for r in dst.read().collect()}


def _hist_oracle(src, group="grp"):
    """Histogram recomputed from the source's final state with the
    same bin expression the rollup uses."""
    lo, hi, nb = HIST["v"]
    e = src.read().withColumn("_b", hist_bin_expr("v", lo, hi, nb))
    agg = e.groupBy(group).agg(
        *[
            F.sum(F.when(F.col("_b") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"b{i}")
            for i in range(nb + 2)
        ]
    )
    return {
        r[group]: [r[f"b{i}"] for i in range(nb + 2)] for r in agg.collect()
    }


def test_hist_fold_exact_under_upsert_and_delete(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(
        src, f"{tmp_path}/r", ["grp"], ["v"], hist_cols=HIST
    )
    src.append(
        _rows(
            spark,
            [(i, "a" if i % 2 else "b", (i * 7) % 120 - 5, 1) for i in range(40)],
        )
    )
    refresh_rollup(src, dst, ["grp"], ["v"], hist_cols=HIST)
    # update stream: move keys between groups AND change values
    src.merge(_rows(spark, [(i, "c", (i * 3) % 120, 2) for i in range(0, 40, 4)]))
    src.delete_keys(spark.createDataFrame([(i,) for i in range(0, 40, 5)], "id int"))
    refresh_rollup(src, dst, ["grp"], ["v"], hist_cols=HIST)
    assert _hist_state(dst) == _hist_oracle(src)


def test_underflow_overflow_and_nulls(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    src.append(
        _rows(
            spark,
            [
                (1, "a", -3, 1),   # underflow
                (2, "a", 0, 1),    # first bin (inclusive lo)
                (3, "a", 99, 1),   # last bin
                (4, "a", 100, 1),  # overflow (exclusive hi)
                (5, "a", 250, 1),  # overflow
                (6, "a", None, 1),  # null: doesn't count anywhere
            ],
        )
    )
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    row = dst.read().collect()[0]
    assert row.n_rows == 6  # count includes the null-v row
    h = list(row.hist_v)
    assert h[0] == 1 and h[1] == 1 and h[10] == 1 and h[11] == 2
    assert sum(h) == 5  # the null contributed to no bin


def test_null_group_key_histogram(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    src.append(
        _rows(spark, [(1, None, 10, 1), (2, None, 20, 1), (3, "a", 30, 1)])
    )
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    src.delete_keys(spark.createDataFrame([(1,)], "id int"))
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    assert _hist_state(dst) == _hist_oracle(src)


def test_hist_recomputed_on_minmax_rescan(spark, tmp_path):
    """A retraction with min/max declared rescans the touched groups —
    the rescan must rebuild the histogram too, not zero it."""
    kw = {"min_cols": ["v"], "max_cols": ["v"], "hist_cols": HIST}
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], ["v"], **kw)
    src.append(_rows(spark, [(i, "a", i * 10, 1) for i in range(10)]))
    refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    # delete the max → rescan of group a
    src.delete_keys(spark.createDataFrame([(9,)], "id int"))
    refresh_rollup(src, dst, ["grp"], ["v"], **kw)
    assert _hist_state(dst) == _hist_oracle(src)
    row = dst.read().collect()[0]
    assert row.max_v == 80


def test_reaggregate_hist_coarser_and_global(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(
        src, f"{tmp_path}/r", ["grp", "seq"], [], hist_cols=HIST
    )
    src.append(
        _rows(
            spark,
            [(i, "a" if i % 2 else "b", (i * 11) % 130, i % 3) for i in range(30)],
        )
    )
    refresh_rollup(src, dst, ["grp", "seq"], [], hist_cols=HIST)
    coarse = {
        r.grp: list(r.hist_v)
        for r in reaggregate_rollup(dst, ["grp"], hist_cols=HIST).collect()
    }
    assert coarse == _hist_oracle(src)
    glob = reaggregate_rollup(dst, [], hist_cols=HIST).collect()[0]
    want = [0] * 12
    for h in _hist_oracle(src).values():
        want = [a + b for a, b in zip(want, h)]
    assert list(glob.hist_v) == want


def test_quantiles_hand_computed(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    # group a: 10 values, one per bin center (5, 15, ..., 95)
    src.append(_rows(spark, [(i, "a", i * 10 + 5, 1) for i in range(10)]))
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    q = rollup_quantiles(dst.read(), "v", HIST["v"], [0.5, 1.0], ["grp"])
    row = q.collect()[0]
    # target 0.5*10=5 → bin 5 [40,50): est = 40 + 10*(5-4)/1 = 50
    assert row.p50_v == pytest.approx(50.0)
    # q=1 → last bin [90,100): est = 90 + 10*(10-9)/1 = 100
    assert row.p100_v == pytest.approx(100.0)


def test_quantiles_empty_histogram_is_null(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    src.append(_rows(spark, [(1, "a", None, 1)]))
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    row = rollup_quantiles(dst.read(), "v", HIST["v"], [0.5], ["grp"]).collect()[0]
    assert row.p50_v is None


def test_maintained_equals_rebuilt_quantiles(spark, tmp_path):
    """End-to-end invariant: quantiles from the incrementally
    maintained histogram == quantiles from a rollup rebuilt from the
    final state (same estimator, same bins — must be bit-identical)."""
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    src.append(
        _rows(spark, [(i, "a" if i % 3 else "b", (i * 13) % 110, 1) for i in range(60)])
    )
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    src.merge(_rows(spark, [(i, "b", (i * 5) % 90, 2) for i in range(0, 60, 2)]))
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    rebuilt = create_rollup(
        src, f"{tmp_path}/r2", ["grp"], [], hist_cols=HIST, consume_from=1
    )
    refresh_rollup(src, rebuilt, ["grp"], [], hist_cols=HIST)
    qm = rollup_quantiles(dst.read(), "v", HIST["v"], [0.25, 0.5, 0.9], ["grp"])
    qr = rollup_quantiles(rebuilt.read(), "v", HIST["v"], [0.25, 0.5, 0.9], ["grp"])
    assert sorted(map(tuple, qm.collect())) == sorted(map(tuple, qr.collect()))


def test_hist_crash_replay_exact(spark, tmp_path, monkeypatch):
    """Crash between the tagged fold and the cursor write: the replay
    finds the tag and skips the fold — histogram bins must not double."""
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], ["v"], hist_cols=HIST)
    src.append(_rows(spark, [(i, "a", i, 1) for i in range(20)]))
    refresh_rollup(src, dst, ["grp"], ["v"], hist_cols=HIST)
    src.append(_rows(spark, [(i, "a", i, 1) for i in range(20, 30)]))

    orig = ManagedTable.set_properties
    armed = {"on": True}

    def crashing(self, **kv):
        if armed["on"] and _STATE_KEY in kv:
            armed["on"] = False
            raise RuntimeError("simulated crash before cursor write")
        return orig(self, **kv)

    monkeypatch.setattr(ManagedTable, "set_properties", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_rollup(src, dst, ["grp"], ["v"], hist_cols=HIST)
    refresh_rollup(src, dst, ["grp"], ["v"], hist_cols=HIST)
    assert _hist_state(dst) == _hist_oracle(src)


def test_invalid_spec_rejected(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    with pytest.raises(ValueError, match="hi > lo"):
        create_rollup(
            src, f"{tmp_path}/r", ["grp"], [], hist_cols={"v": (10, 10, 4)}
        )
    with pytest.raises(ValueError, match="n_bins"):
        create_rollup(
            src, f"{tmp_path}/r2", ["grp"], [], hist_cols={"v": (0, 10, 0)}
        )
    with pytest.raises(ValueError, match="missing from source"):
        create_rollup(
            src, f"{tmp_path}/r3", ["grp"], [], hist_cols={"nope": (0, 10, 4)}
        )


def test_hist_spec_drift_refused(spark, tmp_path):
    """The binning is immutable: refreshing or routing with a
    different spec must raise, never null-pad the arrays (zip_with
    pads the shorter side and null + n = null)."""
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    src.append(_rows(spark, [(1, "a", 5, 1)]))
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    drifted = {"v": (0.0, 100.0, 20)}  # more bins than created with
    with pytest.raises(ValueError, match="immutable"):
        refresh_rollup(src, dst, ["grp"], [], hist_cols=drifted)
    with pytest.raises(ValueError, match="immutable"):
        reaggregate_rollup(dst, ["grp"], hist_cols=drifted)
    with pytest.raises(ValueError, match="immutable"):
        refresh_rollup(
            src, dst, ["grp"], [], hist_cols={"v": (0.0, 50.0, 10)}
        )


def test_global_quantile_routing(spark, tmp_path):
    """rollup_quantiles over a reaggregate_rollup([]) result — the
    global percentile routed entirely from summary tables."""
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    src.append(_rows(spark, [(i, "a" if i % 2 else "b", i * 10 + 5, 1)
                             for i in range(10)]))
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    glob = reaggregate_rollup(dst, [], hist_cols=HIST)
    row = rollup_quantiles(glob, "v", HIST["v"], [0.5], []).collect()
    assert len(row) == 1
    # same estimate as the per-bin hand computation in
    # test_quantiles_hand_computed (one value per bin, target=5)
    assert row[0].p50_v == pytest.approx(50.0)


def test_quantile_spec_disagreeing_with_arrays_refused(spark, tmp_path):
    """ADVICE r9: rollup_quantiles trusted the caller-supplied spec
    against an arbitrary frame — an n_bins that disagrees with the
    hist_<col> arrays actually present must raise, not silently
    mis-scale the estimates."""
    src = _mk_src(spark, tmp_path)
    dst = create_rollup(src, f"{tmp_path}/r", ["grp"], [], hist_cols=HIST)
    src.append(_rows(spark, [(1, "a", 10, 1), (2, "a", 20, 1)]))
    refresh_rollup(src, dst, ["grp"], [], hist_cols=HIST)
    lo, hi, nb = HIST["v"]
    bad = (lo, hi, nb + 3)  # wrong bin count for the maintained arrays
    with pytest.raises(Exception, match="spec mismatch"):
        rollup_quantiles(dst.read(), "v", bad, [0.5], ["grp"]).collect()
    # the correct spec still answers
    assert rollup_quantiles(
        dst.read(), "v", HIST["v"], [0.5], ["grp"]
    ).collect()

"""Declarative constraint gate (operators/quality_checks.py) and
incrementally-maintained rollups (operators/rollup.py)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.quality_checks import (
    check_constraints,
)
from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    create_rollup,
    refresh_rollup,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SRC_SCHEMA)


def test_constraints_full_report(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5),
            (2, None, 50),   # null grp
            (3, "a", -1),    # below range
            (3, "zz", 5),    # duplicate id + unaccepted grp
        ],
        SRC_SCHEMA,
    )
    ref = spark.createDataFrame([(1,), (2,)], "id long")
    out = {
        r.rule_id: r.n_violations
        for r in check_constraints(
            df,
            [
                {"rule": "not_null", "column": "grp"},
                {"rule": "range", "column": "v", "min": 0, "max": 10},
                {"rule": "accepted_values", "column": "grp", "values": ["a", "b"]},
                {"rule": "unique", "columns": ["id"]},
                {"rule": "foreign_key", "columns": ["id"], "ref": "r",
                 "ref_columns": ["id"]},
            ],
            refs={"r": ref},
        ).collect()
    }
    assert out == {
        "not_null(grp)": 1,
        "range(v)": 2,  # -1 and 50
        "accepted_values(grp)": 1,  # zz (null is not a violation here)
        "unique(id)": 1,  # one excess row for id 3
        "foreign_key(id->r.id)": 2,  # both id-3 rows miss the ref
    }


def test_constraints_fail_loudly_on_unknowns(spark):
    df = _rows(spark, [(1, "a", 1)])
    with pytest.raises(ValueError, match="unknown constraint rule"):
        check_constraints(df, [{"rule": "positive", "column": "v"}])
    with pytest.raises(ValueError, match="unknown table"):
        check_constraints(
            df,
            [{"rule": "foreign_key", "columns": ["id"], "ref": "nope",
              "ref_columns": ["id"]}],
        )


def test_row_local_rules_fold_into_one_aggregate(spark):
    df = _rows(spark, [(1, "a", 1), (2, "b", 2)])
    out = check_constraints(
        df,
        [
            {"rule": "not_null", "column": "grp"},
            {"rule": "range", "column": "v", "min": 0},
            {"rule": "accepted_values", "column": "grp", "values": ["a", "b"]},
        ],
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    tree = out._jdf.queryExecution().explainString(mode).split("\n\n")[0]
    # three rules, ONE aggregate pass (partial + final) over one scan
    assert tree.count("HashAggregate") == 2
    assert tree.count("Scan") == 1


def test_rollup_incremental_equals_full_recompute(spark, tmp_path):
    src = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA, key_cols=["id"]
    )
    dst = create_rollup(src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"])

    src.append(_rows(spark, [(1, "a", 10), (2, "a", 5), (3, "b", 1)]))
    refresh_rollup(src, dst, ["grp"], ["v"])
    got1 = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got1 == {"a": (2, 15.0), "b": (1, 1.0)}

    v_before = src._current_version()
    src.append(_rows(spark, [(4, "a", 100), (5, "c", 7)]))
    # the second refresh consumes ONLY the new batch (fast path)
    assert src.read_changes(v_before).count() == 2
    refresh_rollup(src, dst, ["grp"], ["v"])
    got2 = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got2 == {"a": (3, 115.0), "b": (1, 1.0), "c": (1, 7.0)}

    # idempotent: nothing new -> no-op, same state
    refresh_rollup(src, dst, ["grp"], ["v"])
    assert {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()} == got2


def test_rollup_update_stream_retractions(spark, tmp_path):
    """Updates maintain the rollup via CDF retractions: an in-group
    value change adjusts the sum only; a group-moving update shifts
    the row's whole contribution between groups."""
    src = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    dst = create_rollup(src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"])
    src.append(_rows(spark, [(1, "a", 10), (2, "a", 5), (3, "b", 1)]))
    refresh_rollup(src, dst, ["grp"], ["v"])
    # in-group update (1: 10->99) + group move (3: b->a) + insert (4)
    src.merge(_rows(spark, [(1, "a", 99), (3, "a", 1), (4, "c", 7)]))
    refresh_rollup(src, dst, ["grp"], ["v"])
    got = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got == {"a": (3, 105.0), "c": (1, 7.0)}
    # group "b" emptied by the move: its row is DELETED, not zeroed
    assert "b" not in got


def test_rollup_delete_stream_retractions(spark, tmp_path):
    src = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    dst = create_rollup(src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"])
    src.append(_rows(spark, [(1, "a", 10), (2, "a", 5), (3, "b", 1)]))
    refresh_rollup(src, dst, ["grp"], ["v"])
    src.delete_keys(spark.createDataFrame([(2,), (3,)], "id long"))
    refresh_rollup(src, dst, ["grp"], ["v"])
    got = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got == {"a": (1, 10.0)}
    # a later re-insert revives the emptied group through the same feed
    src.append(_rows(spark, [(5, "b", 42)]))
    refresh_rollup(src, dst, ["grp"], ["v"])
    got = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got == {"a": (1, 10.0), "b": (1, 42.0)}


def test_rollup_noop_upsert_window_changes_nothing(spark, tmp_path):
    src = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    dst = create_rollup(src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"])
    src.append(_rows(spark, [(1, "a", 10)]))
    refresh_rollup(src, dst, ["grp"], ["v"])
    v_dst = dst._current_version()
    src.merge(_rows(spark, [(1, "a", 10)]))  # byte-identical upsert
    refresh_rollup(src, dst, ["grp"], ["v"])
    got = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got == {"a": (1, 10.0)}
    # the CDF suppressed the no-op, so the fold had nothing to write
    # beyond (at most) a rowless state bump — the group values hold
    assert dst._current_version() >= v_dst


def test_rollup_state_survives_reload(spark, tmp_path):
    """The consumed-version watermark is persisted table metadata, not
    process state: a reloaded table continues where the last refresh
    left off."""
    src = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA, key_cols=["id"]
    )
    dst = create_rollup(src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"])
    src.append(_rows(spark, [(1, "a", 1)]))
    refresh_rollup(src, dst, ["grp"], ["v"])

    src2 = ManagedTable.load(spark, src.path)
    dst2 = ManagedTable.load(spark, dst.path)
    src2.append(_rows(spark, [(2, "a", 2)]))
    refresh_rollup(src2, dst2, ["grp"], ["v"])
    assert {r.grp: (r.n_rows, r.sum_v) for r in dst2.read().collect()} == {
        "a": (2, 3.0)
    }


def test_streaming_rollup_continuous_aggregate(spark, tmp_path):
    """File stream -> source table appends -> per-batch rollup folds;
    a second availableNow run (restart) picks up only new files, and
    the summary equals a full recompute."""
    import json as _json

    from s3_sqs_data_ingestion_demo_spark.operators.rollup import create_rollup
    from s3_sqs_data_ingestion_demo_spark.streaming.ingest import (
        start_streaming_rollup,
    )

    d = str(tmp_path)
    land = os.path.join(d, "landing"); os.makedirs(land)
    ck = os.path.join(d, "ck")

    def write_file(name, rows):
        with open(os.path.join(land, name), "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    src = ManagedTable.create(spark, os.path.join(d, "src"), SRC_SCHEMA,
                              key_cols=["id"])
    dst = create_rollup(src, os.path.join(d, "r"), ["grp"], ["v"])
    kw = dict(options={"maxFilesPerTrigger": "1"}, available_now=True,
              checkpoint_dir=ck)

    write_file("b1.json", [{"id": 1, "grp": "a", "v": 10},
                           {"id": 2, "grp": "b", "v": 1}])
    write_file("b2.json", [{"id": 3, "grp": "a", "v": 5}])
    q = start_streaming_rollup(spark, land, SRC_SCHEMA, src, dst,
                               ["grp"], ["v"], **kw)
    q.awaitTermination(120)
    got = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got == {"a": (2, 15.0), "b": (1, 1.0)}

    # restart with a new arrival: checkpoint replays nothing
    write_file("b3.json", [{"id": 4, "grp": "b", "v": 100}])
    q = start_streaming_rollup(spark, land, SRC_SCHEMA, src, dst,
                               ["grp"], ["v"], **kw)
    q.awaitTermination(120)
    assert {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()} == {
        "a": (2, 15.0), "b": (2, 101.0)
    }
    assert src.read().count() == 4  # no double-appends anywhere


def test_streaming_rollup_passes_extremes_and_distinct(spark, tmp_path):
    """The streaming twin forwards min/max/distinct to refresh_rollup:
    a duplicated value counts once, extremes fold per batch."""
    import json as _json

    from s3_sqs_data_ingestion_demo_spark.operators.rollup import create_rollup
    from s3_sqs_data_ingestion_demo_spark.streaming.ingest import (
        start_streaming_rollup,
    )

    d = str(tmp_path)
    land = os.path.join(d, "landing"); os.makedirs(land)
    src = ManagedTable.create(spark, os.path.join(d, "src"), SRC_SCHEMA,
                              key_cols=["id"])
    dst = create_rollup(
        src, os.path.join(d, "r"), ["grp"], ["v"],
        min_cols=["v"], max_cols=["v"], distinct_cols=["v"],
    )
    with open(os.path.join(land, "b1.json"), "w") as fh:
        for r in [{"id": 1, "grp": "a", "v": 7},
                  {"id": 2, "grp": "a", "v": 7},
                  {"id": 3, "grp": "a", "v": 9}]:
            fh.write(_json.dumps(r) + "\n")
    q = start_streaming_rollup(
        spark, land, SRC_SCHEMA, src, dst, ["grp"], ["v"],
        min_cols=["v"], max_cols=["v"], distinct_cols=["v"],
        available_now=True, checkpoint_dir=os.path.join(d, "ck"),
    )
    q.awaitTermination(120)
    r = dst.read().collect()[0]
    assert (r.n_rows, r.sum_v, r.min_v, r.max_v, r.n_distinct_v) == (
        3, 23.0, 7, 9, 2,
    )


def test_append_tag_idempotency_probe(spark, tmp_path):
    src = ManagedTable.create(spark, os.path.join(str(tmp_path), "t"),
                              SRC_SCHEMA, key_cols=["id"])
    assert not src.has_commit_tag("b1")
    src.append(_rows(spark, [(1, "a", 1)]), tag="b1")
    assert src.has_commit_tag("b1")
    # the replayed-batch discipline: probe says present -> skip append
    if not src.has_commit_tag("b1"):
        src.append(_rows(spark, [(1, "a", 1)]), tag="b1")
    assert src.read().count() == 1


def test_profile_table_counts_nulls_and_distincts(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.quality_checks import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k int, v string",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_null == 1 and out["k"].n_distinct == 3
    assert out["v"].n_rows == 4 and out["v"].n_null == 1 and out["v"].n_distinct == 2


def test_rollup_window_splits_at_compaction_commits(spark, tmp_path, monkeypatch):
    """A compaction inside the consumed window must NOT push the feed
    onto its full-diff fallback: the refresh splits the window at the
    content-neutral maintenance commit and consumes two fast-path
    segments."""
    src = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA,
        key_cols=["id"], table_type="MOR",
    )
    dst = create_rollup(src, os.path.join(str(tmp_path), "r"), ["grp"], ["v"])
    src.append(_rows(spark, [(1, "a", 10), (2, "b", 5)]))
    refresh_rollup(src, dst, ["grp"], ["v"])
    src.merge(_rows(spark, [(1, "a", 20)]))   # segment 1
    v_pre = src._current_version()
    src.compact()                              # maintenance barrier
    v_cmp = src._current_version()
    src.merge(_rows(spark, [(2, "c", 5), (3, "a", 1)]))  # segment 2
    v_cur = src._current_version()

    windows = []
    orig = ManagedTable.read_changes_cdf

    def spy(self, a, b=None):
        windows.append((a, b))
        return orig(self, a, b)

    monkeypatch.setattr(ManagedTable, "read_changes_cdf", spy)
    refresh_rollup(src, dst, ["grp"], ["v"])
    assert windows == [(v_pre - 1, v_pre), (v_cmp, v_cur)]
    got = {r.grp: (r.n_rows, r.sum_v) for r in dst.read().collect()}
    assert got == {"a": (2, 21.0), "c": (1, 5.0)}

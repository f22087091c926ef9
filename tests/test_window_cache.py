"""ChangeWindowCache: the per-batch shared change-window frame the
declarative job path hands to every maintenance family
(operators/rollup.ChangeWindowCache, wired in job.process_files).

The laws pinned here:
  1. cached refreshes land the SAME state as uncached ones — rollup,
     top-k, and join MV all value-match an uncached twin over an
     insert / group-moving-upsert / delete sequence;
  2. sharing actually happens: families at the same cursor trigger ONE
     window derivation (counted via a change_segments spy);
  3. a lagging family (different lo) misses the cache and still lands
     the correct state — the fallback path.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

import s3_sqs_data_ingestion_demo_spark.operators.rollup as R
from s3_sqs_data_ingestion_demo_spark.operators.join_mv import (
    create_join_mv,
    refresh_join_mv,
)
from s3_sqs_data_ingestion_demo_spark.operators.rollup import (
    ChangeWindowCache,
    create_rollup,
    refresh_rollup,
)
from s3_sqs_data_ingestion_demo_spark.operators.topk_mv import (
    create_topk_mv,
    refresh_topk_mv,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SRC = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("cust", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)
DIM = T.StructType(
    [
        T.StructField("c_id", T.LongType()),
        T.StructField("seg", T.StringType()),
    ]
)

BATCHES = [
    # insert
    ("append", [Row(id=1, grp="a", cust=1, v=10),
                Row(id=2, grp="a", cust=2, v=5),
                Row(id=3, grp="b", cust=1, v=7)]),
    # group-moving upsert (id=1 moves a→b, cust 1→2) + new row
    ("merge", [Row(id=1, grp="b", cust=2, v=11),
               Row(id=4, grp="a", cust=2, v=3)]),
    # delete
    ("delete", [Row(id=2)]),
]


def _mk_tables(spark, d, tag):
    src = ManagedTable.create(
        spark, f"{d}/src_{tag}", SRC, key_cols=["id"], table_type="MOR"
    )
    dim = ManagedTable.create(
        spark, f"{d}/dim_{tag}", DIM, key_cols=["c_id"], table_type="MOR"
    )
    dim.append(
        src.spark.createDataFrame(
            [Row(c_id=1, seg="A"), Row(c_id=2, seg="B")], DIM
        )
    )
    roll = create_rollup(src, f"{d}/roll_{tag}", ["grp"], ["v"],
                         consume_from=1)
    topk = create_topk_mv(
        src, f"{d}/topk_{tag}", group_cols=["grp"], order_col="v", k=2,
        id_cols=["id"], consume_from=1,
    )
    mv = create_join_mv(src, dim, f"{d}/mv_{tag}", on=("cust", "c_id"),
                        consume_from=(1, 1))
    return src, dim, roll, topk, mv


def _apply(spark, src, kind, rows):
    if kind == "append":
        src.append(spark.createDataFrame(rows, SRC))
    elif kind == "merge":
        src.merge(spark.createDataFrame(rows, SRC))
    else:
        src.delete_keys(
            spark.createDataFrame(rows, "id long").select("id")
        )


def _state(roll, topk, mv):
    r = {(x.grp): (x.n_rows, x.sum_v) for x in roll.read().collect()}
    t = {
        (x.grp, x.id): x.v
        for x in topk.read().select("grp", "id", "v").collect()
    }
    m = {
        (x.id, x.c_id): (x.grp, x.seg, x.v)
        for x in mv.read().collect()
    }
    return r, t, m


def test_cached_refreshes_match_uncached(spark, tmp_path):
    d = str(tmp_path)
    a = _mk_tables(spark, d, "cached")
    b = _mk_tables(spark, d, "plain")
    for kind, rows in BATCHES:
        for (src, dim, roll, topk, mv), cache in (
            (a, ChangeWindowCache()),
            (b, None),
        ):
            _apply(spark, src, kind, rows)
            refresh_rollup(src, roll, ["grp"], ["v"], window_cache=cache)
            refresh_topk_mv(
                src, topk, group_cols=["grp"], order_col="v", k=2,
                id_cols=["id"], window_cache=cache,
            )
            refresh_join_mv(src, dim, mv, on=("cust", "c_id"),
                            window_cache=cache)
        assert _state(*a[2:]) == _state(*b[2:])
    # final state sanity against a from-scratch restatement
    src, dim, roll, topk, mv = a
    want = {
        r.grp: (r.n, float(r.s))
        for r in src.read().groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    assert {r.grp: (r.n_rows, r.sum_v) for r in roll.read().collect()} == want
    want_mv = {
        (r.id, r.c_id)
        for r in src.read().join(
            dim.read(), F.col("cust") == F.col("c_id")
        ).select("id", "c_id").collect()
    }
    assert {(r.id, r.c_id) for r in mv.read().collect()} == want_mv


def test_families_at_same_cursor_share_one_derivation(
    spark, tmp_path, monkeypatch
):
    d = str(tmp_path)
    src, dim, roll, topk, mv = _mk_tables(spark, d, "spy")

    def sync(cache):
        refresh_rollup(src, roll, ["grp"], ["v"], window_cache=cache)
        refresh_topk_mv(
            src, topk, group_cols=["grp"], order_col="v", k=2,
            id_cols=["id"], window_cache=cache,
        )
        refresh_join_mv(src, dim, mv, on=("cust", "c_id"),
                        window_cache=cache)

    # batch 1 consumes the dim's bootstrap window too — run it
    # uncounted so the spy measures the steady state
    _apply(spark, src, *BATCHES[0])
    sync(ChangeWindowCache())

    calls = {"weighted": 0}
    real = R.window_weighted_changes

    def spy(*args, **kw):
        calls["weighted"] += 1
        return real(*args, **kw)

    monkeypatch.setattr(R, "window_weighted_changes", spy)
    _apply(spark, src, *BATCHES[1])
    sync(ChangeWindowCache())
    # three families, same (src, lo, hi), dim unchanged → ONE window
    # derivation for the whole batch
    assert calls["weighted"] == 1


def test_lagging_family_misses_and_stays_correct(spark, tmp_path):
    d = str(tmp_path)
    src, dim, roll, topk, mv = _mk_tables(spark, d, "lag")
    # rollup consumes batch 1 alone; topk lags until after batch 2 —
    # their windows differ, so the second refresh round has one hit
    # (rollup's fresh window) and one miss (topk's wider window)
    _apply(spark, src, *BATCHES[0])
    refresh_rollup(src, roll, ["grp"], ["v"],
                   window_cache=ChangeWindowCache())
    _apply(spark, src, *BATCHES[1])
    cache = ChangeWindowCache()
    refresh_rollup(src, roll, ["grp"], ["v"], window_cache=cache)
    refresh_topk_mv(
        src, topk, group_cols=["grp"], order_col="v", k=2,
        id_cols=["id"], window_cache=cache,
    )
    want = {
        r.grp: (r.n, float(r.s))
        for r in src.read().groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    assert {r.grp: (r.n_rows, r.sum_v) for r in roll.read().collect()} == want
    got_topk = {
        (r.grp, r.id): r.v
        for r in topk.read().select("grp", "id", "v").collect()
    }
    # top-2 per group of the live state
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(
        F.col("v").desc(), F.col("id").asc()
    )
    want_topk = {
        (r.grp, r.id): r.v
        for r in src.read().withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2).collect()
    }
    assert got_topk == want_topk

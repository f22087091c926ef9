"""The streaming rollup twin forwards sumsq_cols to refresh_rollup —
second moments fold per micro-batch like sums."""

import json
import os

from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.rollup import create_rollup
from s3_sqs_data_ingestion_demo_spark.streaming.ingest import (
    start_streaming_rollup,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("grp", T.StringType(), True),
        T.StructField("v", T.IntegerType(), True),
    ]
)


def test_streaming_rollup_passes_sumsq(spark, tmp_path):
    d = str(tmp_path)
    land = os.path.join(d, "landing")
    os.makedirs(land)
    src = ManagedTable.create(
        spark, os.path.join(d, "src"), SRC_SCHEMA, key_cols=["id"]
    )
    dst = create_rollup(
        src, os.path.join(d, "r"), ["grp"], ["v"], sumsq_cols=["v"]
    )
    with open(os.path.join(land, "b1.json"), "w") as fh:
        for r in [
            {"id": 1, "grp": "a", "v": 3},
            {"id": 2, "grp": "a", "v": 5},
        ]:
            fh.write(json.dumps(r) + "\n")
    q = start_streaming_rollup(
        spark, land, SRC_SCHEMA, src, dst, ["grp"], ["v"],
        sumsq_cols=["v"],
        available_now=True, checkpoint_dir=os.path.join(d, "ck"),
    )
    q.awaitTermination(120)
    r = dst.read().collect()[0]
    assert (r.n_rows, r.sum_v, r.sumsq_v) == (2, 8.0, 34.0)


def test_streaming_rollup_passes_hist(spark, tmp_path):
    d = str(tmp_path)
    land = os.path.join(d, "landing")
    os.makedirs(land)
    src = ManagedTable.create(
        spark, os.path.join(d, "src"), SRC_SCHEMA, key_cols=["id"]
    )
    hist = {"v": (0.0, 10.0, 5)}
    dst = create_rollup(
        src, os.path.join(d, "r"), ["grp"], [], hist_cols=hist
    )
    with open(os.path.join(land, "b1.json"), "w") as fh:
        for r in [
            {"id": 1, "grp": "a", "v": 3},
            {"id": 2, "grp": "a", "v": 12},  # overflow bin
        ]:
            fh.write(json.dumps(r) + "\n")
    q = start_streaming_rollup(
        spark, land, SRC_SCHEMA, src, dst, ["grp"], [],
        hist_cols=hist,
        available_now=True, checkpoint_dir=os.path.join(d, "ck"),
    )
    q.awaitTermination(120)
    r = dst.read().collect()[0]
    assert list(r.hist_v) == [0, 0, 1, 0, 0, 0, 1]


def test_streaming_topk(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.operators.topk_mv import (
        create_topk_mv,
    )
    from s3_sqs_data_ingestion_demo_spark.streaming.ingest import (
        start_streaming_topk,
    )

    d = str(tmp_path)
    land = os.path.join(d, "landing")
    os.makedirs(land)
    src = ManagedTable.create(
        spark, os.path.join(d, "src"), SRC_SCHEMA, key_cols=["id"]
    )
    kw = dict(group_cols=["grp"], order_col="v", k=2, id_cols=["id"])
    dst = create_topk_mv(src, os.path.join(d, "mv"), **kw)
    with open(os.path.join(land, "b1.json"), "w") as fh:
        for r in [
            {"id": 1, "grp": "a", "v": 3},
            {"id": 2, "grp": "a", "v": 9},
            {"id": 3, "grp": "a", "v": 7},
        ]:
            fh.write(json.dumps(r) + "\n")
    q = start_streaming_topk(
        spark, land, SRC_SCHEMA, src, dst, **kw,
        available_now=True, checkpoint_dir=os.path.join(d, "ck"),
    )
    q.awaitTermination(120)
    assert sorted((r.grp, r.id, r.v) for r in dst.read().collect()) == [
        ("a", 2, 9), ("a", 3, 7)
    ]

"""Streaming join materialization (streaming/ingest.py
start_streaming_join_mv): file stream → left-table appends →
per-batch affected-key re-join into the MV, the streaming twin of the
continuous aggregate.  Dimension changes landed between runs fold in
on the next batch because the refresh consumes BOTH change feeds."""

import json
import os

from pyspark.sql import Row
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.operators.join_mv import (
    create_join_mv,
)
from s3_sqs_data_ingestion_demo_spark.streaming.ingest import (
    start_streaming_join_mv,
)
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

LEFT = T.StructType(
    [
        T.StructField("id", T.LongType()),
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


def test_streaming_join_mv_tracks_stream_and_dim_changes(spark, tmp_path):
    d = str(tmp_path)
    land = os.path.join(d, "landing")
    os.makedirs(land)
    ck = os.path.join(d, "ck")

    def write_file(name, rows):
        with open(os.path.join(land, name), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    src = ManagedTable.create(
        spark, os.path.join(d, "src"), LEFT, key_cols=["id"],
        table_type="MOR",
    )
    dim = ManagedTable.create(
        spark, os.path.join(d, "dim"), DIM, key_cols=["c_id"],
        table_type="MOR",
    )
    dim.append(
        spark.createDataFrame([Row(c_id=1, seg="A"), Row(c_id=2, seg="B")],
                              DIM)
    )
    mv = create_join_mv(
        src, dim, os.path.join(d, "mv"), on=("cust", "c_id"),
        consume_from=(1, 1),
    )
    kw = dict(options={"maxFilesPerTrigger": "1"}, available_now=True,
              checkpoint_dir=ck)

    write_file("b1.json", [{"id": 1, "cust": 1, "v": 10},
                           {"id": 2, "cust": 2, "v": 5}])
    write_file("b2.json", [{"id": 3, "cust": 1, "v": 7}])
    q = start_streaming_join_mv(
        spark, land, LEFT, src, dim, mv, on=("cust", "c_id"), **kw
    )
    q.awaitTermination(120)
    got = {(r.id, r.seg, r.v) for r in mv.read().collect()}
    assert got == {(1, "A", 10), (2, "B", 5), (3, "A", 7)}

    # a dimension change lands between runs + a new stream arrival:
    # the restarted stream folds BOTH in (two-feed refresh)
    dim.merge(spark.createDataFrame([Row(c_id=1, seg="A2")], DIM))
    write_file("b3.json", [{"id": 4, "cust": 2, "v": 1}])
    q = start_streaming_join_mv(
        spark, land, LEFT, src, dim, mv, on=("cust", "c_id"), **kw
    )
    q.awaitTermination(120)
    got = {(r.id, r.seg, r.v) for r in mv.read().collect()}
    assert got == {(1, "A2", 10), (2, "B", 5), (3, "A2", 7), (4, "B", 1)}
    assert src.read().count() == 4  # no double-appends

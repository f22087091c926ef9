"""Streaming maintenance of the BM25 and IVF index tables."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def _land_json(land, name, rows):
    os.makedirs(land, exist_ok=True)
    with open(os.path.join(land, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_streaming_search_index_matches_adhoc(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.operators.search import bm25_topk
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        bm25_index_topk,
    )
    from s3_sqs_data_ingestion_demo_spark.streaming.index_ingest import (
        start_streaming_search_index,
    )

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    d = str(tmp_path)
    land = os.path.join(d, "landing")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    third = max(1, len(rows) // 3)
    for i in range(3):
        _land_json(
            land, f"b{i}.json",
            [{"doc_id": a, "text": b}
             for a, b in rows[i * third: None if i == 2 else (i + 1) * third]],
        )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("text", T.StringType())]
    )
    q = start_streaming_search_index(
        spark, land, schema, os.path.join(d, "idx"), os.path.join(d, "ck"),
        available_now=True, options={"maxFilesPerTrigger": "1"},
    )
    q.awaitTermination(300)
    terms = ("data", "model", "training")
    got = [
        (r.doc_id, r.n_hit_terms, r.score_u)
        for r in bm25_index_topk(spark, os.path.join(d, "idx"), terms, 10).collect()
    ]
    want = [
        (r.doc_id, r.n_hit_terms, r.score_u)
        for r in bm25_topk(docs, terms, k=10).collect()
    ]
    assert got == want and got


def test_streaming_ivf_index_covers_stream(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.operators.ann_index import (
        build_ivf_index,
        load_ivf_index,
    )
    from s3_sqs_data_ingestion_demo_spark.streaming.index_ingest import (
        start_streaming_ivf_index,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    d = str(tmp_path)
    path = os.path.join(d, "ivf")
    build_ivf_index(spark, path, emb.filter(F.col("vec_id") % 2 == 0), k=8)
    land = os.path.join(d, "landing")
    odd = [(r.vec_id, [float(x) for x in r.embedding])
           for r in emb.filter(F.col("vec_id") % 2 == 1).collect()]
    half = max(1, len(odd) // 2)
    _land_json(land, "b0.json",
               [{"vec_id": a, "embedding": b} for a, b in odd[:half]])
    _land_json(land, "b1.json",
               [{"vec_id": a, "embedding": b} for a, b in odd[half:]])
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()),
         T.StructField("embedding", T.ArrayType(T.DoubleType()))]
    )
    q = start_streaming_ivf_index(
        spark, land, schema, path, os.path.join(d, "ck"),
        available_now=True, options={"maxFilesPerTrigger": "1"},
    )
    q.awaitTermination(300)
    _, at = load_ivf_index(spark, path)
    assert at.read().select("vec_id").distinct().count() == emb.count()

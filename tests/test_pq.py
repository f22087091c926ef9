"""Product-quantization operator: codes, compression, ADC recall."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_sqs_data_ingestion_demo_spark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_train,
)
from s3_sqs_data_ingestion_demo_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# m=16 x 64 centroids: 16 codes per 64-dim vector (~16x compression
# at uint8 storage); on these unstructured synthetic vectors coarser
# settings (m=8, ksub=16) land ADC recall@5 near 0.2 — real embedding
# corpora have subspace structure PQ exploits, synthetics don't.
@pytest.fixture(scope="module")
def codebooks(emb):
    return pq_train(emb, m=16, ksub=64)


def test_train_shapes_and_determinism(emb):
    cb = pq_train(emb, m=8, ksub=16)
    assert cb.shape == (8, 16, 8)  # dim 64 / m 8
    cb2 = pq_train(emb, m=8, ksub=16)
    assert (cb == cb2).all()  # deterministic sample + init


def test_encode_codes_in_range(emb, codebooks):
    codes = pq_encode(emb, codebooks).collect()
    assert len(codes) == emb.count()
    for r in codes[:50]:
        assert len(r.codes) == 16
        assert all(0 <= c < 64 for c in r.codes)


def test_identical_vectors_share_codes(spark, codebooks):
    df = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(10)], "vec_id long, embedding array<float>"
    )
    codes = {tuple(r.codes) for r in pq_encode(df, codebooks).collect()}
    assert len(codes) == 1


def test_adc_recall_against_brute_force(spark, emb, codebooks):
    """ADC top-k over 32x-compressed codes must keep meaningful recall
    vs exact cosine, and re-ranking depth helps (recall@shortlist-10
    >= recall@5): the standard PQ + exact-rerank pattern."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(queries, emb, k=5).collect()
    }
    codes = pq_encode(emb, codebooks)
    got5 = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(queries, codes, codebooks, k=5).collect()
    }
    got10 = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(queries, codes, codebooks, k=10).collect()
    }
    r5 = len(exact & got5) / len(exact)
    r10 = len(exact & got10) / len(exact)
    assert r10 >= r5 > 0.4, (r5, r10)


def test_topk_shape_and_rank_contract(emb, codebooks):
    queries = emb.filter(F.col("vec_id") < 3)
    codes = pq_encode(emb, codebooks)
    rows = pq_topk(queries, codes, codebooks, k=4).collect()
    by_q = {}
    for r in rows:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3, 4]
        sims = [r.adc_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_ivfpq_recall_and_nprobe_monotone(spark, emb):
    """IVF-PQ: residual codes + cell probing.  Recall grows with
    nprobe; full probe matches plain-PQ-grade recall (residual
    encoding can only help vs raw-vector PQ at equal bits)."""
    from s3_sqs_data_ingestion_demo_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )
    from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
        label_centroids,
    )

    cents = label_centroids(emb)
    n_cells = cents.count()
    cb = ivfpq_train(emb, cents, m=16, ksub=64)
    index = ivfpq_encode(emb, cents, cb)
    assert index.count() == emb.count()

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(queries, emb, k=5).collect()
    }
    recalls = []
    for nprobe in (1, 3, n_cells):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivfpq_topk(queries, index, cents, cb, k=5, nprobe=nprobe).collect()
        }
        recalls.append(len(exact & got) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone in nprobe: {recalls}"
    assert recalls[-1] > 0.4, recalls


def test_ivfpq_index_schema_and_cells(spark, emb):
    from s3_sqs_data_ingestion_demo_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_train,
    )
    from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
        label_centroids,
    )

    cents = label_centroids(emb)
    cb = ivfpq_train(emb, cents, m=8, ksub=16)
    rows = ivfpq_encode(emb, cents, cb).collect()
    cell_ids = {r.cell_id for r in cents.collect()}
    assert {r.cell_id for r in rows} <= cell_ids
    assert all(len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes) for r in rows)

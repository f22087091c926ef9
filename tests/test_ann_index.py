"""Persistent IVF index: build / incremental append / query / rebuild
trigger (operators/ann_index.py)."""

import os

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    cell_balance,
    ivf_index_topk,
    load_ivf_index,
)
from s3_sqs_data_ingestion_demo_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_build_append_covers_full_corpus(spark, tmp_path):
    """Build on half the corpus, append the other half: every vector
    is assigned exactly once, centroids untouched by the append."""
    e = _emb(spark)
    n = e.count()
    path = str(tmp_path / "ivf")
    ct, at = build_ivf_index(
        spark, path, e.filter(F.col("vec_id") % 2 == 0), k=8
    )
    cent_v = ct._current_version()
    assert at.read().count() == e.filter(F.col("vec_id") % 2 == 0).count()
    append_to_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 1))
    ct2, at2 = load_ivf_index(spark, path)
    assert at2.read().count() == n
    assert at2.read().select("vec_id").distinct().count() == n
    assert ct2._current_version() == cent_v  # append never refits


def test_append_is_idempotent_by_key(spark, tmp_path):
    """Re-appending the same batch upserts (merge on vec_id), never
    duplicates index rows."""
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, path, e, k=8)
    n = e.count()
    batch = e.filter(F.col("vec_id") < 50)
    append_to_ivf_index(spark, path, batch)
    append_to_ivf_index(spark, path, batch)
    _, at = load_ivf_index(spark, path)
    assert at.read().count() == n


def test_index_topk_recall_vs_exact(spark, tmp_path):
    """Recall@5 of the persisted index (nprobe=3 of 8 cells) against
    brute force must clear the floor the ad-hoc IVF path achieves."""
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 0), k=8)
    append_to_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 1))
    qs = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(qs, e, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_index_topk(spark, path, qs, k=5, nprobe=3).collect()
    }
    assert len(exact) == 50
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_cell_balance_sums_to_corpus(spark, tmp_path):
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, path, e, k=8)
    bal = cell_balance(spark, path)
    rows = bal.collect()
    assert sum(r.n_vectors for r in rows) == e.count()
    assert all(r.n_vectors > 0 for r in rows)

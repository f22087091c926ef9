"""Distributed k-means: convergence, determinism, and IVF integration."""

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
    _assign_cells,
    _dvec,
    cosine,
    cosine_topk,
    ivf_topk,
    kmeans_fit,
)

SF = "/root/testdata/sf0.001"


def _mean_sim_to_centroid(spark, emb, cents):
    base = emb.select(F.col("vec_id").alias("id"), _dvec("embedding").alias("v"))
    assigned = _assign_cells(base, cents)
    return (
        assigned.join(F.broadcast(cents), "cell_id")
        .select(cosine(F.col("v"), F.col("centroid")).alias("s"))
        .agg(F.avg("s"))
        .first()[0]
    )


def test_kmeans_improves_fit_and_is_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c0 = kmeans_fit(emb, k=10, iters=0)   # raw init
    c5 = kmeans_fit(emb, k=10, iters=5)
    fit0 = _mean_sim_to_centroid(spark, emb, c0)
    fit5 = _mean_sim_to_centroid(spark, emb, c5)
    assert fit5 > fit0, f"k-means did not improve fit: {fit0} -> {fit5}"
    # deterministic across runs
    again = kmeans_fit(emb, k=10, iters=5)
    a = sorted((r.cell_id, tuple(round(x, 9) for x in r.centroid)) for r in c5.collect())
    b = sorted((r.cell_id, tuple(round(x, 9) for x in r.centroid)) for r in again.collect())
    assert a == b


def test_ivf_with_kmeans_centroids(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = kmeans_fit(emb, k=10, iters=3)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(queries, emb, k=5).collect()}
    full = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(queries, emb, cents, k=5, nprobe=10).collect()
    }
    assert full == exact  # probing all cells == brute force
    some = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(queries, emb, cents, k=5, nprobe=3).collect()
    }
    assert len(some & exact) / len(exact) > 0.4  # useful recall at 3/10 cells

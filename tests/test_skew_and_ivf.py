"""Salted aggregation correctness + IVF similarity recall vs brute force."""

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    label_centroids,
)
from s3_sqs_data_ingestion_demo_spark.operators.skew import (
    salted_agg,
    top_values_by_frequency,
)

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain_agg(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    plain = {
        r.user_id: (r.n, round(r.total, 2), r.lo, r.hi)
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    salted = {
        r.user_id: (r.n, round(r.total, 2), r.lo, r.hi)
        for r in salted_agg(
            e,
            ["user_id"],
            {
                "n": ("count", "*"),
                "total": ("sum", "value"),
                "lo": ("min", "value"),
                "hi": ("max", "value"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    with pytest.raises(ValueError, match="algebraic"):
        salted_agg(e, ["user_id"], {"m": ("median", "value")})


def test_hot_key_diagnostic(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    top = top_values_by_frequency(e, "event_type", top_n=3).collect()
    assert len(top) == 3
    assert top[0].freq >= top[1].freq >= top[2].freq
    assert 0 < top[0].share <= 1


def test_ivf_recall_against_brute_force(spark):
    """IVF contract: recall grows monotonically with nprobe and reaches
    exact brute-force when probing every cell; probed scores are true
    cosines.  (The synthetic label clusters are loose, so absolute
    recall at small nprobe is data-dependent — the monotone curve and
    the full-probe equivalence are the operator's invariants.)"""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact_rows = cosine_topk(queries, emb, k=5).collect()
    ex = {(r.query_id, r.neighbor_id) for r in exact_rows}
    cents = label_centroids(emb)
    n_cells = cents.count()

    recalls = []
    for nprobe in (1, 3, n_cells):
        ap_rows = ivf_topk(queries, emb, cents, k=5, nprobe=nprobe).collect()
        ap = {(r.query_id, r.neighbor_id) for r in ap_rows}
        recalls.append(len(ex & ap) / len(ex))
    assert recalls == sorted(recalls), f"recall not monotone in nprobe: {recalls}"
    assert recalls[0] > 0
    assert recalls[-1] == 1.0, f"full probe must equal brute force: {recalls}"

    # probed scores are true cosines (subset consistency with exact)
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact_rows}
    probed = ivf_topk(queries, emb, cents, k=5, nprobe=3).collect()
    for r in probed:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.cosine_sim) < 1e-9


def test_approx_distinct_bounded_error(spark):
    """HLL estimates must land within ~3x the configured rsd of exact."""
    from s3_sqs_data_ingestion_demo_spark.extended_queries import (
        q_approx_distinct_sketch,
    )
    from pyspark.sql import functions as F

    approx = {r.l_returnflag: r for r in q_approx_distinct_sketch(spark, SF).collect()}
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a.approx_parts - e.parts) / e.parts < 0.06
        assert abs(a.approx_orders - e.orders) / e.orders < 0.06

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
    """The sketch query self-reports HLL-vs-exact tolerance flags
    (rsd=0.02, 10% tolerance) and carries the exact counts — all flags
    must hold and the exact counts must match a direct aggregation."""
    from s3_sqs_data_ingestion_demo_spark.extended_queries import (
        q_approx_distinct_sketch,
    )
    from pyspark.sql import functions as F

    out = {r.l_returnflag: r for r in q_approx_distinct_sketch(spark, SF).collect()}
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
        a = out[flag]
        assert a.parts_sketch_ok and a.orders_sketch_ok
        assert a.exact_parts == e.parts and a.exact_orders == e.orders


# ---------------------------------------------------------------- GEMM
# tiling + LSH hot-bucket discipline (VERDICT r01 #3/#4)

def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_blocked_pairs_tile_sizing_invariant(spark):
    """Dynamic n_blocks (from corpus count / target tile rows) must
    return the same exact pair set as any forced block count."""
    from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
        blocked_cosine_pairs,
    )

    vecs = [[(i * 7 + j * 3) % 13 - 6.0 for j in range(8)] for i in range(60)]
    df = _vec_df(spark, vecs)
    # force tiny tiles: 60 rows / 8-row target -> 8 blocks
    tiny = blocked_cosine_pairs(df, threshold=0.8, target_tile_rows=8)
    one = blocked_cosine_pairs(df, threshold=0.8, n_blocks=1)
    got = sorted((r.id_a, r.id_b, r.cosine_sim) for r in tiny.collect())
    want = sorted((r.id_a, r.id_b, r.cosine_sim) for r in one.collect())
    assert got == want and len(want) > 0


def test_lsh_degenerate_corpus_bounded_and_complete(spark):
    """All-identical embeddings collapse into ONE sign-pattern bucket:
    the in-bucket verifier must sub-block (no O(n²)-row join blowup)
    and still return every pair — hot buckets are the signal for
    embedding near-dup, not noise to drop."""
    from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
        lsh_cosine_pairs,
    )

    n = 40
    df = _vec_df(spark, [[1.0] * 8 for _ in range(n)])
    out = lsh_cosine_pairs(
        df, n_planes=4, dim=8, threshold=0.99, target_tile_rows=8
    )
    rows = out.collect()
    assert len(rows) == n * (n - 1) // 2  # every pair, exactly once
    assert all(r.id_a < r.id_b and r.cosine_sim >= 0.99 for r in rows)


def test_lsh_matches_bruteforce_within_buckets(spark):
    """LSH pairs must be a subset of exact pairs with identical
    cosine values (verification is exact within buckets)."""
    from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
        blocked_cosine_pairs,
        lsh_cosine_pairs,
    )

    vecs = [[(i * 5 + j) % 11 - 5.0 for j in range(8)] for i in range(50)]
    df = _vec_df(spark, vecs)
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in blocked_cosine_pairs(df, threshold=0.7, n_blocks=2).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in lsh_cosine_pairs(
            df, n_planes=2, n_tables=6, dim=8, threshold=0.7
        ).collect()
    }
    assert set(lsh) <= set(exact)
    assert all(exact[k] == v for k, v in lsh.items())
    # multi-table OR gives real recall; 2-plane × 6-table at cosine 0.7
    # collides w.p. ~1-(1-0.56)^6 ≈ 0.99 per pair
    assert len(lsh) >= 0.5 * len(exact) > 0


def test_semantic_dedup_pairs_subset_of_exact_and_multiprobe_recall(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.similarity import (
        blocked_cosine_pairs,
        semantic_dedup_pairs,
    )

    # two tight clusters + near-duplicate planted pairs inside each
    vecs = []
    for i in range(30):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        vecs.append([b + 0.01 * ((i * 7 + j) % 5) for j, b in enumerate(base)])
    df = _vec_df(spark, vecs)
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in blocked_cosine_pairs(df, threshold=0.95, n_blocks=2).collect()
    }
    sem = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in semantic_dedup_pairs(
            df, k=2, iters=3, nprobe=1, threshold=0.95
        ).collect()
    }
    # precision exact by construction: every pair is a true pair with
    # its true (rounded) cosine
    assert set(sem) <= set(exact)
    assert all(exact[k] == v for k, v in sem.items())
    # two clean clusters at k=2: within-cluster pairs are all found
    assert len(sem) >= 0.9 * len(exact) > 0
    # multi-probe can only add pairs, still without false positives
    sem3 = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            df, k=2, iters=3, nprobe=2, threshold=0.95
        ).collect()
    }
    assert set(sem) <= sem3 <= set(exact)

"""Warm-session determinism of the minhash near-dup operator.

Under ``MEMORY_AND_DISK`` persistence of the shingle/signature base,
plans with several concurrent consumers of the cached relation read
corrupted values out of the in-memory columnar cache: near-dup pairs
randomly appeared AND disappeared across identical warm-session runs
(~25% of runs on this corpus; the r01 cold-JVM sf0.1 first-action row
loss was the same defect).  Three formulations are stable —
``DISK_ONLY`` persist, ``localCheckpoint``, and no persist; the
operator uses DISK_ONLY plus an explicit materializing count().

This test pins the user-visible contract: repeated calls in one warm
session return the identical pair set, which must also equal the
unpersisted (pure recompute) result.
"""

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from s3_sqs_data_ingestion_demo_spark.operators.dedup import minhash_dedup_pairs

LONG_A = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
LONG_A_NEAR = LONG_A.replace("today", "tonight")
LONG_B = "spark engines shuffle partitioned data across executors while catalyst optimizes query plans"


def corpus(spark):
    rows = [
        (1, LONG_A),
        (2, LONG_A),
        (3, LONG_A_NEAR),
        (4, LONG_B),
        (5, "too short"),
        (6, ""),
        (7, "The  Quick  Brown Fox jumps over the lazy dog near the quiet river bank today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, persist):
    return sorted(
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in minhash_dedup_pairs(
            corpus(spark), threshold=0.4, persist_intermediate=persist
        ).collect()
    )


def test_minhash_pairs_stable_across_warm_runs(spark):
    truth = _pairs(spark, persist=False)
    assert truth, "corpus must produce near-dup pairs"
    for i in range(6):
        got = _pairs(spark, persist=True)
        assert got == truth, f"run {i}: {got} != {truth}"

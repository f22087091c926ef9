"""Warm-session determinism of the minhash near-dup operator.

The historical nondeterminism here (near-dup pairs randomly appearing
and disappearing across identical warm runs; the r01 cold-JVM sf0.1
first-action row loss was the same defect) was a lambda-arity bug, not
a caching one: the signature seeds were built with ``lambda x, s=s``
inside ``F.transform``, which PySpark binds as the (element, index)
TWO-ARG form — the defaulted ``s`` was rebound to the index Column,
whose generated name leaked into the seed, so the hash family varied
with the session's lambda-variable counter.  Fixed by the arity-1
closure helper ``_minhash_sig_col`` (see also
tests/test_cold_jvm_minhash.py); persistence level was never the
defect — ``_cached_persist`` uses MEMORY_AND_DISK.

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

"""Bounded session cache for dedup intermediates.

The shingle-family operators route their persisted intermediates
through ``_DEDUP_CACHE`` — shared across operators (one shingle base
serves jaccard, minhash, and curation in a session), bounded (LRU
eviction unpersists), and clearable.  These tests pin the reuse, the
bound, and result-stability with the cache cold vs warm.
"""

import pyspark.sql.functions as F
import pytest

from s3_sqs_data_ingestion_demo_spark.operators import dedup as D


@pytest.fixture(autouse=True)
def _clean_cache():
    D.clear_dedup_cache()
    yield
    D.clear_dedup_cache()


def docs(spark, n=40, tag=""):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(f"the quick brown fox {tag} jumps over document number "),
            (F.col("id") % 7).cast("string"),
            F.lit(" with some shared trailing words for overlap"),
        ).alias("text"),
    )


def test_base_shared_across_operators(spark):
    d = docs(spark)
    D.jaccard_near_dup_pairs(d, threshold=0.3).count()
    assert len(D._DEDUP_CACHE) == 1  # shingle base
    D.minhash_dedup_pairs(docs(spark), threshold=0.3).count()
    # identical plan built separately -> base reused, only sigs added
    kinds = sorted(k[2] for k in D._DEDUP_CACHE)
    assert kinds == ["minhash_sigs", "shingle_base"]


def test_repeat_calls_do_not_grow_cache(spark):
    d = docs(spark)
    for _ in range(3):
        D.minhash_dedup_pairs(d, threshold=0.3).count()
    assert len(D._DEDUP_CACHE) == 2


def test_lru_eviction_unpersists_and_bounds(spark):
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    for i in range(D._DEDUP_CACHE_MAX + 2):
        D.jaccard_near_dup_pairs(docs(spark, tag=str(i)), threshold=0.3).count()
    assert len(D._DEDUP_CACHE) == D._DEDUP_CACHE_MAX
    # evicted relations were unpersisted: the session gained at most
    # cap-many persisted RDDs (one per cached relation), not one per call
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after - before <= D._DEDUP_CACHE_MAX


def test_results_identical_cold_vs_warm(spark):
    d = docs(spark)
    cold = sorted(map(tuple, D.minhash_dedup_pairs(d, threshold=0.3).collect()))
    warm = sorted(map(tuple, D.minhash_dedup_pairs(d, threshold=0.3).collect()))
    D.clear_dedup_cache()
    recold = sorted(map(tuple, D.minhash_dedup_pairs(d, threshold=0.3).collect()))
    assert cold == warm == recold
    assert len(cold) > 0  # non-degenerate corpus


def test_clear_cache_unpersists_everything(spark):
    D.simhash_near_dup_pairs(docs(spark)).count()
    assert len(D._DEDUP_CACHE) >= 1
    D.clear_dedup_cache()
    assert len(D._DEDUP_CACHE) == 0

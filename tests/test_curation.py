"""End-to-end corpus curation: quality gate -> exact dedup ->
near-dup removal -> token budget."""

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.curation import (
    curate_corpus,
    curate_with_report,
)

LONG_A = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
LONG_A_NEAR = "the quick brown fox jumps over the lazy dog near the quiet river bank tonight"
LONG_B = "spark engines shuffle partitioned data across executors while catalyst optimizes query plans"


def corpus(spark):
    rows = [
        (1, LONG_A),
        (2, LONG_A),            # exact dup of 1 (dropped, keeps 1)
        (3, LONG_A_NEAR),       # near dup of 1 (dropped, keeps 1)
        (4, LONG_B),            # unique (kept)
        (5, "too short"),       # quality gate: < 5 tokens
        (6, ""),                # empty
        (7, "The  Quick  Brown Fox jumps over the lazy dog near the quiet river bank today"),
        # 7 normalizes to the same fingerprint as 1 (case/whitespace) -> exact dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_end_to_end(spark):
    kept = curate_corpus(corpus(spark), min_quality=0.1, near_dup_threshold=0.4)
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 4]
    toks = {r.doc_id: r.bpe_ish_tokens for r in kept.collect()}
    assert toks[1] == len(LONG_A.split())  # plain words: bpe-ish == whitespace
    assert "quality_score" in kept.columns  # annotations survive


def test_curate_report_counts(spark):
    kept, rep = curate_with_report(
        corpus(spark), min_quality=0.1, near_dup_threshold=0.4
    )
    assert rep.n_input == 7
    assert rep.n_after_quality == 5   # drops 5 (short) and 6 (empty)
    assert rep.n_after_exact == 3     # drops 2 and 7 (same fingerprint as 1)
    assert rep.n_after_near_dup == 2  # drops 3 (near dup of 1)
    assert rep.total_tokens_kept == sum(
        r.bpe_ish_tokens for r in kept.collect()
    )


def test_curation_is_deterministic(spark):
    a = sorted(r.doc_id for r in curate_corpus(corpus(spark), min_quality=0.1,
                                               near_dup_threshold=0.4).collect())
    b = sorted(r.doc_id for r in curate_corpus(corpus(spark), min_quality=0.1,
                                               near_dup_threshold=0.4).collect())
    assert a == b

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


def test_curate_cluster_dedup_star_vs_greedy(spark):
    """Star shape: docs 5 and 6 are each near-dups of doc 1 but not of
    each other (single-word edits at opposite ends of a 40-word text;
    at threshold 0.8 the 5~6 similarity 0.73 is below cut).  Greedy
    keeps 5 and 6 — they are mutually dissimilar and each only lost to
    1 as a b-side... which drops them.  Clustering keeps exactly one
    doc of the whole component."""
    letters = "abcdefghijklmnopqrst"
    words = [f"w{letters[i % 20]}{letters[i // 20]}" for i in range(40)]
    base = " ".join(words)
    w5 = words.copy(); w5[5] = "changedfive"
    w35 = words.copy(); w35[35] = "changedthirtyfive"
    other = " ".join(f"q{letters[i % 20]}{letters[i // 20]}x" for i in range(30))
    docs = spark.createDataFrame(
        [(1, base), (5, " ".join(w5)), (6, " ".join(w35)), (9, other)],
        "doc_id long, text string",
    )
    greedy = sorted(
        r.doc_id
        for r in curate_corpus(
            docs, min_quality=0.01, near_dup_threshold=0.8
        ).collect()
    )
    clustered = sorted(
        r.doc_id
        for r in curate_corpus(
            docs, min_quality=0.01, near_dup_threshold=0.8, cluster_dedup=True
        ).collect()
    )
    # pairs at 0.8: (1,5) and (1,6) only — both policies drop 5 and 6
    # here; the policies differ on which SURVIVES when the minimum is
    # itself a b-side, covered by the chain test below
    assert greedy == [1, 9]
    assert clustered == [1, 9]


def test_curate_cluster_dedup_transitive_chain(spark):
    """Chain 1~5~3 where 1~3 never pairs: clustering must still
    collapse the whole chain to its minimum (transitivity), and the
    canonical survivor must be doc 1."""
    letters = "abcdefghijklmnopqrst"
    words = [f"w{letters[i % 20]}{letters[i // 20]}" for i in range(40)]
    w_mid = words.copy(); w_mid[5] = "edithere"          # ~ base (0.85)
    w_far = w_mid.copy(); w_far[35] = "anotheredit"      # ~ mid (0.85), vs base 0.73
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (5, " ".join(w_mid)), (3, " ".join(w_far))],
        "doc_id long, text string",
    )
    clustered = sorted(
        r.doc_id
        for r in curate_corpus(
            docs, min_quality=0.01, near_dup_threshold=0.8, cluster_dedup=True
        ).collect()
    )
    assert clustered == [1]

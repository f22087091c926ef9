"""Unigram-LM quality scoring (operators/scoring.py)."""

from s3_sqs_data_ingestion_demo_spark.operators.scoring import unigram_nll_scores


def test_unigram_nll_orders_rare_docs_higher(spark):
    rows = [
        (1, "common common common common"),
        (2, "rare1 rare2 rare3 rare4"),
        (3, "common common rare1 common"),
        (4, ""),  # token-free: no likelihood, omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_nll_scores(df).collect()}
    assert set(out) == {1, 2, 3}
    # all-rare > mixed > all-common pseudo-perplexity
    assert out[2].avg_nll > out[3].avg_nll > out[1].avg_nll
    assert out[1].n_tokens == 4
    # buckets are floors of the rounded scores
    for r in out.values():
        assert r.nll_bucket == int(r.avg_nll // 1)


def test_unigram_nll_is_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, unigram_nll_scores(docs).collect()))
    b = sorted(map(tuple, unigram_nll_scores(docs.repartition(9)).collect()))
    assert a == b


def test_vocab_cap_oov_bucket_probabilities(spark):
    """top_k_vocab=K keeps the K most frequent tokens and collapses the
    rest into one OOV bucket carrying the residual mass, so every OOV
    token scores the same NLL and the model still sums to 1."""
    rows = [
        (1, "a a a a b b b c c d"),  # corpus freq: a=5 b=4 c=3 d=2
        (2, "c d"),
        (3, "a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import math

    out = {r.doc_id: r for r in unigram_nll_scores(df, top_k_vocab=2).collect()}
    n = 14  # total tokens
    # vocab = {a:5, b:4}; OOV mass = c(3) + d(2) = 5
    def micro(c):
        return round(-math.log(c / n) * 1e6)

    exp_doc2 = round((micro(5) + micro(5)) / 2 / 1e6, 4)  # both OOV
    assert abs(out[2].avg_nll - exp_doc2) < 1e-9
    exp_doc3 = round((micro(5) + micro(4)) / 2 / 1e6, 4)
    assert abs(out[3].avg_nll - exp_doc3) < 1e-9
    for r in out.values():
        assert r.nll_bucket == int(r.avg_nll // 1)


def test_vocab_cap_broadcasts_the_capped_table(spark):
    """The production property: with top_k_vocab the scoring join's
    vocab side is an explicit broadcast — the corpus is never shuffled
    on the (unbounded, Zipf-skewed) token key."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = unigram_nll_scores(docs, top_k_vocab=100)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = out._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in p
    # deterministic under repartitioning, like the uncapped path
    a = sorted(map(tuple, unigram_nll_scores(docs, top_k_vocab=100).collect()))
    b = sorted(
        map(
            tuple,
            unigram_nll_scores(docs.repartition(9), top_k_vocab=100).collect(),
        )
    )
    assert a == b


def test_bigram_nll_rewards_frequent_transitions(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.scoring import (
        bigram_nll_scores,
    )

    rows = [
        (1, "the cat sat"), (2, "the cat sat"), (3, "the cat sat"),
        (4, "cat the sat"),  # same unigrams, unseen transitions
        (5, "x"),            # <2 tokens: omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_nll_scores(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].avg_nll == out[2].avg_nll == out[3].avg_nll
    # the scrambled doc shares unigram stats but has rare bigrams ->
    # strictly higher pseudo-perplexity: the signal unigrams can't see
    assert out[4].avg_nll > out[1].avg_nll
    assert out[1].n_bigrams == 2

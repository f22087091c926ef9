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

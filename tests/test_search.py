"""BM25 / TF-IDF relevance scoring (operators/search.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3_sqs_data_ingestion_demo_spark.operators import search as SRCH  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_orders_by_relevance_and_saturates(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark spark spark spark filler filler"),
            (2, "spark merge filler filler filler filler filler filler"),
            (3, "filler only no hits here at all ok"),
            (4, "spark filler filler filler filler filler filler filler"),
        ],
    )
    out = SRCH.bm25_topk(docs, ("spark", "merge"), k=10).collect()
    ids = [r.doc_id for r in out]
    # doc 3 has no query terms -> absent
    assert 3 not in ids
    # doc 2 hits two distinct terms; term saturation (k1) keeps doc 1's
    # six repeats of one term below two distinct-term hits
    assert ids[0] == 2
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].n_hit_terms == 2
    assert by_id[1].score_u > by_id[4].score_u  # more tf still scores higher
    # exact integer scores
    assert all(isinstance(r.score_u, int) for r in out)


def test_bm25_tiebreak_is_doc_id(spark):
    docs = _docs(spark, [(9, "a b spark"), (2, "a b spark"), (5, "a b spark")])
    out = SRCH.bm25_topk(docs, ("spark",), k=2).collect()
    assert [r.doc_id for r in out] == [2, 5]


def test_tfidf_top_terms_rank_and_ties(spark):
    docs = _docs(
        spark,
        [
            (1, "apple apple banana common common"),
            (2, "banana cherry common common common"),
            (3, "common common common common common"),
        ],
    )
    out = SRCH.tfidf_top_terms(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.term_rank, r.term, r.tfidf_u))
    # 'common' appears in all docs -> idf = ln(1) = 0 -> never a top term
    assert by_doc[1][0][1] == "apple"  # tf=2, df=1 beats banana tf=1 df=2
    assert by_doc[1][1][1] == "banana"
    # doc 2: banana (df=2) vs cherry (df=1): cherry has higher idf, both tf=1
    assert by_doc[2][0][1] == "cherry"
    # doc 3 has only zero-idf terms; rows exist but with tfidf_u == 0
    assert all(v[2] == 0 for v in by_doc.get(3, [(0, "", 0)]))


def test_bm25_topk_plan_shape(spark):
    docs = _docs(spark, [(i, f"spark text {i}") for i in range(20)])
    plan = SRCH.bm25_topk(docs, ("spark",), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort


def test_repetition_signals_exact_fractions(spark):
    from s3_sqs_data_ingestion_demo_spark.operators import text as X

    docs = _docs(spark, [(1, "a a a b"), (2, "x y")])
    out = {r.doc_id: r for r in X.repetition_signals(docs).collect()}
    r1 = out[1]
    assert r1.n_tokens == 4
    assert r1.dup_token_fp4 == 5000  # (4 - 2 distinct) / 4
    assert r1.top_token == "a" and r1.top_token_fp4 == 7500
    assert r1.top_bigram_fp4 == 6666  # "a a" twice / 3 bigrams
    r2 = out[2]
    # tie on counts -> lexicographically-last token wins
    assert r2.top_token == "y" and r2.top_bigram_fp4 == 10000


def test_fuzzy_self_pairs_blocking_equals_quadratic(spark):
    from s3_sqs_data_ingestion_demo_spark.operators import fuzzy as FZ

    names = ["abc", "abd", "ab", "abcd", "xyz", "xzz", "totally-different"]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    got = {
        (r.name_a, r.name_b): r.dist
        for r in FZ.fuzzy_self_pairs(df, "s").collect()
    }
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        tuple(sorted((a, b))): lev(a, b)
        for a, b in itertools.combinations(names, 2)
        if lev(a, b) <= 1
    }
    assert got == want
    # substitutions, insertions and deletions all present in the fixture
    assert (("abc", "abd")) in got and (("ab", "abc")) in got


def test_fuzzy_pairs_rejects_unsupported_distance(spark):
    from s3_sqs_data_ingestion_demo_spark.operators import fuzzy as FZ

    df = spark.createDataFrame([("a",)], "s string")
    try:
        FZ.fuzzy_self_pairs(df, "s", max_dist=2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

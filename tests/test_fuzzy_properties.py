"""Property-based tests (hypothesis): FastSS fuzzy join vs the
quadratic levenshtein definition, and segment-dedup invariants."""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


# small alphabet + short strings -> dense distance-1 neighborhoods,
# exercising substitutions, insertions, deletions and repeated chars
_WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=4),
    min_size=2,
    max_size=12,
    unique=True,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=_WORDS)
def test_fuzzy_blocking_equals_quadratic_definition(spark, words):
    from s3_sqs_data_ingestion_demo_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {(r.name_a, r.name_b): r.dist for r in fuzzy_self_pairs(df, "s").collect()}
    want = {
        tuple(sorted((a, b))): _lev(a, b)
        for a, b in itertools.combinations(words, 2)
        if _lev(a, b) <= 1
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=20).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    window=st.integers(min_value=1, max_value=5),
)
def test_segment_dedup_invariants(spark, texts, window):
    from s3_sqs_data_ingestion_demo_spark.operators.dedup import segment_dedup_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    rows = segment_dedup_stats(df, window=window, max_doc_freq=1).collect()
    assert len(rows) == len(texts)
    for r in rows:
        n_tokens = len(texts[r.doc_id].split(" "))
        assert r.n_segs == -(-n_tokens // window)  # ceil
        assert 0 <= r.n_dropped <= r.n_segs
        assert 0 <= r.kept_tokens <= n_tokens
        # everything kept -> full token count survives
        if r.n_dropped == 0:
            assert r.kept_tokens == n_tokens

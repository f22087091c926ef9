"""Corpus-assembly audit operators: temperature mixing weights,
length-filter retention sweep, cross-source overlap matrix.

Value parity vs DuckDB is covered by test_oracle_parity.py; these
tests pin the operators' structural properties and plan shapes.
"""

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.dedup import source_overlap
from s3_sqs_data_ingestion_demo_spark.operators.sampling import (
    temperature_shares,
)
from s3_sqs_data_ingestion_demo_spark.operators.text import retention_sweep


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # skewed domains: 64 'web' docs, 16 'code', 4 'academic'
    for i in range(64):
        rows.append((i, "web", "the quick brown fox jumps over the lazy dog " * 3))
    for i in range(16):
        rows.append((100 + i, "code", "def f(x): return x + 1 # add one to x"))
    for i in range(4):
        rows.append((200 + i, "academic", "we prove the bound holds for all n"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_temperature_upweights_rare_domains(docs):
    out = {r["domain"]: r for r in temperature_shares(docs, "source").collect()}
    assert set(out) == {"web", "code", "academic"}
    # raw shares follow counts exactly (ppm floors of 64/84, 16/84, 4/84)
    assert out["web"]["raw_share_ppm"] == 64 * 1_000_000 // 84
    assert out["academic"]["raw_share_ppm"] == 4 * 1_000_000 // 84
    # temperature shares: w = floor(sqrt(n)) -> 8, 4, 2 over W=14
    assert out["web"]["temp_share_ppm"] == 8 * 1_000_000 // 14
    assert out["code"]["temp_share_ppm"] == 4 * 1_000_000 // 14
    assert out["academic"]["temp_share_ppm"] == 2 * 1_000_000 // 14
    # the whole point: rare domains gain share, dominant ones lose it
    assert out["academic"]["temp_share_ppm"] > out["academic"]["raw_share_ppm"]
    assert out["web"]["temp_share_ppm"] < out["web"]["raw_share_ppm"]


def test_retention_sweep_monotone_and_exact(docs):
    out = {
        r["min_tokens"]: r
        for r in retention_sweep(docs, thresholds=(0, 5, 10, 1000)).collect()
    }
    assert set(out) == {0, 5, 10, 1000}
    # threshold 0 retains everything
    assert out[0]["docs_retained"] == 84
    assert out[0]["docs_retained_ppm"] == 1_000_000
    assert out[0]["tokens_retained_ppm"] == 1_000_000
    # curves are monotone non-increasing in the threshold
    for lo, hi in [(0, 5), (5, 10), (10, 1000)]:
        assert out[lo]["docs_retained"] >= out[hi]["docs_retained"]
        assert out[lo]["tokens_retained"] >= out[hi]["tokens_retained"]
    # an unreachable threshold still emits a row, at zero
    assert out[1000]["docs_retained"] == 0
    assert out[1000]["tokens_retained_ppm"] == 0


def test_retention_sweep_aggregates_before_grid_join(docs):
    """The grid theta-join must see the token-count HISTOGRAM, not the
    corpus: an aggregate has to sit below the nested-loop join."""
    plan = retention_sweep(docs)._jdf.queryExecution().executedPlan().toString()
    nlj = plan.find("BroadcastNestedLoopJoin")
    assert nlj != -1
    assert "HashAggregate" in plan[nlj:], plan


def test_source_overlap_matrix(docs, spark):
    out = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap(docs, "source").collect()
    }
    # identical docs within a source collapse: 'web' holds one distinct
    # doc's shingles; disjoint vocab across sources -> no pair rows
    assert out == {}
    # now add a bridging doc sharing text across two sources
    bridge = spark.createDataFrame(
        [
            (300, "web", "shared shingle text appears here verbatim"),
            (301, "code", "shared shingle text appears here verbatim"),
        ],
        "doc_id long, source string, text string",
    )
    out2 = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap(docs.unionByName(bridge), "source").collect()
    }
    pair = out2[("code", "web")]
    assert pair["n_common"] == 4  # 6 tokens -> 4 tri-gram shingles
    assert 0 < pair["jaccard_ppm"] <= 1_000_000
    assert pair["containment_ppm"] <= 1_000_000
    # containment >= jaccard always (denominator is smaller)
    assert pair["containment_ppm"] >= pair["jaccard_ppm"]
    # ordering invariant: src_a < src_b lexicographically
    assert all(a < b for (a, b) in out2)


def test_leakage_safe_split_keeps_clusters_together(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # components: {0,1,2} -> 0, {10,11} -> 10
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "doc_id long, component long",
    )
    out = leakage_safe_split(
        docs, comp, {"train": 0.75, "val": 0.125, "test": 0.125}
    ).select("doc_id", "group_key", "split")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200
    # whole cluster shares one split
    assert rows[0]["split"] == rows[1]["split"] == rows[2]["split"]
    assert rows[10]["split"] == rows[11]["split"]
    # cluster members carry the cluster's group key
    assert rows[1]["group_key"] == 0 and rows[11]["group_key"] == 10
    # singletons group by their own id, and all labels are produced
    assert rows[50]["group_key"] == 50
    assert {r["split"] for r in rows.values()} == {"train", "val", "test"}


def test_vocab_coverage_monotone_and_bounded(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " + ("alpha " * (i % 5))) for i in range(100)],
        "doc_id long, text string",
    )
    out = {r["vocab_k"]: r for r in vocab_coverage(docs, ks=(1, 2, 10)).collect()}
    assert set(out) == {1, 2, 10}
    # k=1 covers exactly the most frequent term ('alpha')
    total_alpha = sum(1 + (i % 5) for i in range(100))
    assert out[1]["covered_tokens"] == total_alpha
    # monotone non-decreasing, saturating at full coverage once k >= |vocab|
    assert out[1]["covered_tokens"] <= out[2]["covered_tokens"] <= out[10]["covered_tokens"]
    assert out[10]["coverage_ppm"] == 1_000_000


def test_vocab_coverage_topk_is_take_ordered(spark):
    """Global top-k must be a TakeOrdered (bounded per-partition
    selection), never a full sort of the vocabulary."""
    from s3_sqs_data_ingestion_demo_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        vocab_coverage(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan

"""PageRank: fixed-point parity with a pure-Python power iteration,
mass accounting, and plan shape."""

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.graph import pagerank

SCALE = 10**12


def _py_pagerank(edges, iterations=3, scale=SCALE, damping_num=85):
    """Reference implementation: same integer arithmetic, driver-side."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    nodes = sorted(outdeg)
    n = len(nodes)
    init = scale // n
    base = (init * (100 - damping_num)) // 100
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        incoming = defaultdict(int)
        for s, d in edges:
            incoming[d] += rank[s] // outdeg[s]
        rank = {v: base + (damping_num * incoming[v]) // 100 for v in nodes}
    return rank


def _sym(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


@pytest.fixture(scope="module")
def star_edges():
    # hub 0 connected to 1..5, plus a 6-7-8 triangle
    return _sym([(0, i) for i in range(1, 6)]) + _sym(
        [(6, 7), (7, 8), (8, 6)]
    )


def test_pagerank_matches_reference(spark, star_edges):
    df = spark.createDataFrame(star_edges, "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=3).collect()
    }
    want = _py_pagerank(star_edges, iterations=3)
    assert got == want
    # the hub out-ranks every spoke
    assert got[0] > got[1]


def test_pagerank_mass_bounded(spark, star_edges):
    df = spark.createDataFrame(star_edges, "src long, dst long")
    total = (
        pagerank(df, iterations=3)
        .agg(F.sum("rank_fp").alias("m"))
        .collect()[0]["m"]
    )
    # integer truncation only ever LOSES mass; bounded by scale
    assert 0 < total <= SCALE


def test_pagerank_uniform_on_cycle(spark):
    # directed 4-cycle: every node identical by symmetry
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    ranks = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, iterations=4).collect()
    }
    assert len(set(ranks.values())) == 1


def test_pagerank_empty_raises(spark):
    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(df)


def test_pagerank_query_topk_plan(spark):
    """The registered query's top-20 must compile to
    TakeOrderedAndProject, not a single-partition window sort."""
    from s3_sqs_data_ingestion_demo_spark.extended_queries import (
        pagerank_purchase_graph,
    )

    df = pagerank_purchase_graph(spark, "/root/testdata/sf0.001")
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in tree
    assert "Window" not in tree

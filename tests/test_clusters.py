"""Connected-components clustering of near-dup pairs
(operators/dedup.py connected_components)."""

import pytest

from s3_sqs_data_ingestion_demo_spark.operators.dedup import connected_components


def _cc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "doc_id_a long, doc_id_b long")
    return {
        r.doc_id: (r.component, r.is_canonical)
        for r in connected_components(df, **kw).collect()
    }


def test_transitive_chain_merges_into_one_cluster(spark):
    # 1-2, 2-3, 3-4: one component although 1~4 was never a pair
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0)}


def test_separate_components_and_canonicals(spark):
    got = _cc(spark, [(5, 9), (2, 7), (7, 3)])
    assert got[5] == (5, 1) and got[9] == (5, 0)
    assert got[2] == (2, 1) and got[7] == (2, 0) and got[3] == (2, 0)
    # exactly one canonical per component
    comps = {}
    for doc, (comp, canon) in got.items():
        comps.setdefault(comp, 0)
        comps[comp] += canon
    assert all(v == 1 for v in comps.values())


def test_long_chain_converges(spark):
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert all(got[i] == (0, int(i == 0)) for i in range(n + 1))


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="converge"):
        _cc(spark, [(i, i + 1) for i in range(6)], max_iters=2)


def test_empty_pairs(spark):
    assert _cc(spark, []) == {}

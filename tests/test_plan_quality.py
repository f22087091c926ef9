"""Physical-plan quality gates — the properties that matter at 100 TB.

These tests pin the plan shapes, not just results: filters reach the
parquet scan, projections prune the read schema, dim joins broadcast,
aggregations are partial (map-side), no query falls back to Python
row-at-a-time evaluation, and no accidental cartesian products.
"""

import pytest

from s3_sqs_data_ingestion_demo_spark import (  # noqa: F401
    extended_queries,
    pipeline_queries,
)
from s3_sqs_data_ingestion_demo_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    jdf = df._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_q01_pushdown_and_partial_agg(spark):
    p = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    assert "partial_sum" in p  # map-side combine before the exchange
    # column pruning: orderkey/partkey/suppkey never read
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]


def test_q06_all_predicates_pushed(spark):
    p = plan_of(spark, "q06_forecast_revenue")
    pushed = p.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q03_broadcasts_filtered_dim(spark):
    p = plan_of(spark, "q03_top_unshipped_orders")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # top-k with limit must not globally sort-materialize
    assert "TakeOrderedAndProject" in p


def test_q05_single_fact_shuffle(spark):
    p = plan_of(spark, "q05_region_revenue")
    # all four dims broadcast; the only sort-merge-eligible join is
    # orders x lineitem
    assert p.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in p


def test_asof_is_single_window_pass(spark):
    p = plan_of(spark, "q_asof_click_before_purchase")
    # union-trick as-of: window over user_id, NO join of any kind
    assert "Window" in p
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in p, f"asof plan unexpectedly contains {bad}"


def test_ann_broadcasts_queries_not_corpus(spark):
    p = plan_of(spark, "ann_cosine_topk")
    # the small query side broadcasts (nested-loop broadcast is the
    # cross-join plan); corpus is never shuffled before scoring
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_fingerprint_no_shuffle(spark):
    # standalone fingerprint projection (driver-verified inside the
    # combined text_quality_documents entry)
    df = pipeline_queries.fingerprint_documents(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in p  # pure projection


def test_minhash_signatures_no_shuffle(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.dedup import minhash_signatures

    df = minhash_signatures(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in p  # signatures fall out of the scan projection


@pytest.mark.parametrize(
    "name",
    # merge_upsert_* are end-to-end table-write scenarios, not pure
    # queries; their operator (merge_upsert) is plan-checked elsewhere
    [n for n in sorted(REGISTRY) if not n.startswith(("lsh_", "merge_upsert_"))],
)
def test_no_python_eval_in_queries(spark, name):
    """Every registered query must stay JVM-side: no row-at-a-time
    Python UDF evaluation in the physical plan."""
    p = plan_of(spark, name)
    assert "BatchEvalPython" not in p, f"{name} fell back to Python UDF"
    assert "CartesianProduct" not in p, f"{name} plans a cartesian product"


def test_hash_split_and_stratified_sample_no_shuffle(spark):
    """The corpus-assembly projections must stay shuffle-free: split
    assignment and stratified sampling are pure per-row hash math."""
    for name in ("hash_split_documents", "stratified_sample_documents"):
        p = plan_of(spark, name)
        assert "Exchange" not in p, f"{name} unexpectedly shuffles"


def test_domain_mix_single_domain_shuffle(spark):
    """Exact-quota mixing needs exactly one data shuffle (the window
    rank on the domain key); quotas join back as a broadcast."""
    p = plan_of(spark, "domain_mix_documents")
    assert "Window" in p
    assert "BroadcastHashJoin" in p  # quota side stays broadcast
    assert "CartesianProduct" not in p


def test_managed_table_read_prunes_partitions(spark, tmp_path):
    """A partition-column filter over ManagedTable.read() must reach
    the scan as a PartitionFilter (directory pruning, the same
    metadata pruning Iceberg gives via manifests)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    sch = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("part", T.StringType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "tbl"), sch,
        partition_cols=["part"], key_cols=["id"],
    )
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], sch))
    df = t.read().filter(F.col("part") == "a")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters: [isnotnull(part" in p and "part#" in p
    assert "(part#" in p.split("PartitionFilters:")[1].splitlines()[0]


def test_events_scan_prunes_props(spark):
    """q_events_hourly must not read the wide props JSON column."""
    p = plan_of(spark, "q_events_hourly")
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema


def test_resample_no_cartesian_single_fill_window(spark):
    p = plan_of(spark, "q_resample_user_values")
    assert "CartesianProduct" not in p
    # one forward-fill window pass over the grid
    assert p.count("Window") >= 1


def test_quantize_is_pure_projection(spark):
    p = plan_of(spark, "embedding_quantize_int8")
    assert "Exchange" not in p  # zero-shuffle projection
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_chunking_is_pure_projection_generator(spark):
    p = plan_of(spark, "chunk_documents")
    assert "Exchange" not in p
    assert "Generate" in p  # the sequence/slice explode


def test_kmv_no_cartesian_bounded_topk(spark):
    p = plan_of(spark, "q_kmv_user_sketch")
    assert "CartesianProduct" not in p
    # the ALL row's union sketch comes from a bounded top-k, not a sort
    assert "TakeOrderedAndProject" in p


def test_new_text_operators_no_sortmerge_and_bounded_topk(spark):
    # BM25 / segment-dedup / drift: every join must broadcast (tiny
    # stats / idf / boilerplate sides), top-k must be a
    # TakeOrderedAndProject (never a full sort), nothing Python-side.
    for name in (
        "bm25_search_documents",
        "segment_dedup_documents",
        "token_drift_documents",
        "repetition_signals_documents",
    ):
        tree = plan_of(spark, name).split("\n\n")[0]
        assert "SortMergeJoin" not in tree, name
        assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree, name
    for name in ("bm25_search_documents", "token_drift_documents"):
        assert "TakeOrderedAndProject" in plan_of(spark, name).split("\n\n")[0], name


def test_fuzzy_pairs_plan_has_no_join(spark):
    # candidates are generated inside grouped blocks: the whole plan is
    # explode -> aggregate -> explode, with no join operator at all
    tree = plan_of(spark, "fuzzy_name_pairs_customers").split("\n\n")[0]
    assert "Join" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_multiset_ops_single_shuffle_each(spark):
    tree = plan_of(spark, "q_multiset_set_ops").split("\n\n")[0]
    assert "CartesianProduct" not in tree and "BroadcastNestedLoop" not in tree


def test_read_unresolved_single_scan_unpartitioned(spark, tmp_path):
    """An unpartitioned MOR table's unresolved read must be ONE
    multi-path FileScan, not a per-entry scan union — a long-lived
    stream accumulates hundreds of delta entries between compactions
    and an O(entries) plan is a per-micro-batch scale cost."""
    import os

    from pyspark.sql import types as T

    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "t"), schema,
        key_cols=["id"], table_type="MOR",
    )
    for i in range(5):
        t.merge(spark.createDataFrame([(i, float(i))], schema))
    df = t.read_unresolved(with_seq=True)
    tree = df._jdf.queryExecution().executedPlan().toString().split("\n\n")[0]
    assert tree.count("FileScan") == 1
    assert "Union" not in tree
    # seq must still resolve per entry: 5 distinct, increasing commit
    # seqs (the create snapshot is v1, so merges land at v2..v6)
    seqs = sorted(r._sg_seq for r in df.select("_sg_seq").collect())
    assert seqs == [2, 3, 4, 5, 6]


def test_span_dedup_shuffles_hashes_not_text(spark):
    """Span dedup's shuffles must carry window hashes and positions —
    never token arrays or span text — and nothing Python-side."""
    tree = plan_of(spark, "span_dedup_documents").split("\n\n")[0]
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "CartesianProduct" not in tree


def test_tokenizer_fertility_folds_over_vocab_only(spark):
    """The BPE segmentation folds must run over the DISTINCT-word
    vocabulary (an aggregate feeds the fold), never per occurrence —
    the corpus-size-independence property of the fertility report."""
    import re

    df = REGISTRY["tokenizer_fertility_documents"].fn(spark, SF)
    tree = df._jdf.queryExecution().optimizedPlan().toString()
    # the fold expression (aggregate(..., lambda ...)) must appear in a
    # plan branch that sits ABOVE a distinct/aggregate over words
    assert "aggregate(" in tree.lower()
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_temperature_mix_single_aggregate_no_cartesian(spark):
    """The T=2 mix is one partial-aggregated groupBy plus a broadcast
    1-row max — the only join allowed is a broadcast nested loop
    against that 1-row side; the source scan must be pruned to the
    single grouping column."""
    tree = plan_of(spark, "temperature_mix_documents")
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "ReadSchema: struct<source:string>" in tree


def test_hard_negatives_broadcasts_queries_no_corpus_shuffle(spark):
    """Hard-negative mining must broadcast the query side and scan the
    corpus once — the corpus never rides an exchange before the
    per-query top-k window; scans are pruned to (vec_id, embedding)."""
    tree = plan_of(spark, "hard_negatives_embeddings")
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    # the tree summary (first explain section) shows the real scan
    # count: query side + ONE corpus pass (the detail sections repeat
    # nodes, so count there would double)
    summary = tree.split("\n\n")[0]
    assert summary.count("Scan parquet") == 2
    # the corpus side must feed the join with no Exchange below it
    corpus_branch = summary.split("BroadcastNestedLoopJoin")[1].split(
        "BroadcastExchange"
    )[0]
    assert "Exchange" not in corpus_branch
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in tree


def test_cluster_representatives_one_corpus_window(spark):
    """The retention policy's corpus-wide work is one window keyed on
    component — no Python and no cartesian in the final plan."""
    tree = plan_of(spark, "cluster_representatives_documents")
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_bm25_index_query_pushes_term_filter(spark, tmp_path):
    """The persisted-index query path's pruning claim, pinned: after
    ``compact(cluster_by=["term"])`` the query's term filter must be
    PUSHED into every postings FileScan (file/row-group skip via tight
    per-file term ranges) — a refactor that lifts the filter above the
    MOR resolution window would silently turn this into a
    full-postings scan per query."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        append_to_search_index,
        bm25_index_topk,
        compact_search_index,
    )

    d = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"data model training alpha{i % 7} beta{i % 5}")
         for i in range(100)],
        "doc_id long, text string",
    )
    append_to_search_index(spark, d, docs)
    compact_search_index(spark, d)
    res = bm25_index_topk(spark, d, ("data", "alpha1"), 5)
    tree = res._jdf.queryExecution().executedPlan().toString()
    postings_scans = [
        ln for ln in tree.split("\n")
        if "FileScan parquet" in ln and "term" in ln.split("]")[0]
    ]
    assert postings_scans, tree[:1500]
    for ln in postings_scans:
        assert "In(term, [" in ln.split("PushedFilters:", 1)[-1], ln
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert res.count() == 5


def test_filtered_ann_prefilters_corpus_with_pushed_predicate(spark):
    """Filtered vector search must PRE-filter: the lang predicate is
    pushed into the documents parquet scan (which reads only doc_id +
    lang, never text), the id set broadcasts into a semi-join, and the
    corpus never rides a shuffle before the distance pass — no
    cartesian, no sort-merge, no Python."""
    tree = plan_of(spark, "filtered_ann_topk")
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    # the documents side: pruned to (doc_id, lang) with the predicate
    # pushed to the scan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in tree
    assert "EqualTo(lang,en)" in tree


def test_rrf_fusion_bounded_inputs_no_corpus_shuffle_in_fusion(spark):
    """RRF's fusion inputs are both bounded top-N lists: each input
    ranking ends in a bounded top-k (TakeOrderedAndProject / window
    over ≤N rows), so whatever join strategy Spark picks for the FULL
    OUTER fusion (full-outer equi-joins can't broadcast) only ever
    sees ≤2N rows.  The corpus-scale relations must never meet a
    cartesian or Python eval; the bounded-ness is pinned by requiring
    a bounded top-k on both branches BELOW the fusion join."""
    tree = plan_of(spark, "rrf_fusion_documents")
    assert "CartesianProduct" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    summary = tree.split("\n\n")[0]
    # bounded tops: the bm25 branch's top-N and the final top-10 are
    # TakeOrderedAndProject; the cosine branch bounds via its rank
    # window (rank <= N on a 1-query broadcast pass)
    assert summary.count("TakeOrderedAndProject") >= 2

"""Persistent IVF index: build / incremental append / query / rebuild
trigger (operators/ann_index.py)."""

import os

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    cell_balance,
    ivf_index_topk,
    load_ivf_index,
)
from s3_sqs_data_ingestion_demo_spark.operators.similarity import cosine_topk

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_build_append_covers_full_corpus(spark, tmp_path):
    """Build on half the corpus, append the other half: every vector
    is assigned exactly once, centroids untouched by the append."""
    e = _emb(spark)
    n = e.count()
    path = str(tmp_path / "ivf")
    ct, at = build_ivf_index(
        spark, path, e.filter(F.col("vec_id") % 2 == 0), k=8
    )
    cent_v = ct._current_version()
    assert at.read().count() == e.filter(F.col("vec_id") % 2 == 0).count()
    append_to_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 1))
    ct2, at2 = load_ivf_index(spark, path)
    assert at2.read().count() == n
    assert at2.read().select("vec_id").distinct().count() == n
    assert ct2._current_version() == cent_v  # append never refits


def test_append_is_idempotent_by_key(spark, tmp_path):
    """Re-appending the same batch upserts (merge on vec_id), never
    duplicates index rows."""
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, path, e, k=8)
    n = e.count()
    batch = e.filter(F.col("vec_id") < 50)
    append_to_ivf_index(spark, path, batch)
    append_to_ivf_index(spark, path, batch)
    _, at = load_ivf_index(spark, path)
    assert at.read().count() == n


def test_index_topk_recall_vs_exact(spark, tmp_path):
    """Recall@5 of the persisted index (nprobe=3 of 8 cells) against
    brute force must clear the floor the ad-hoc IVF path achieves."""
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 0), k=8)
    append_to_ivf_index(spark, path, e.filter(F.col("vec_id") % 2 == 1))
    qs = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(qs, e, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_index_topk(spark, path, qs, k=5, nprobe=3).collect()
    }
    assert len(exact) == 50
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_cell_balance_sums_to_corpus(spark, tmp_path):
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, path, e, k=8)
    bal = cell_balance(spark, path)
    rows = bal.collect()
    assert sum(r.n_vectors for r in rows) == e.count()
    assert all(r.n_vectors > 0 for r in rows)


def test_index_topk_scan_is_cell_pruned(spark, tmp_path):
    """The query path must push the probed cell set INTO the
    assignments scan — a join key alone never reaches parquet, and an
    unpruned read would scan the entire index per query batch.  After
    ``compact(cluster_by=["cell_id"])`` the isin predicate must appear
    as a pushed filter on a single FileScan."""
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    _, at = build_ivf_index(spark, path, e, k=8)
    append_to_ivf_index(spark, path, e.filter(F.col("vec_id") < 50))
    at.compact(cluster_by=["cell_id"])
    q = e.filter(F.col("vec_id") < 3)
    res = ivf_index_topk(spark, path, q, k=5, nprobe=2)
    tree = res._jdf.queryExecution().executedPlan().toString()
    assert "In(cell_id" in tree or "cell_id IN" in tree, tree[:2000]
    # exactly one scan of the assignments table (plus the centroid and
    # checkpointed-probe inputs, which are not parquet FileScans of
    # this path)
    summary = tree.split("\n\n")[0]
    assert summary.count("Scan parquet") <= 2  # assignments (+centroids)
    # and the results still rank correctly
    assert res.filter(F.col("rank") == 1).count() == q.count()


def test_index_topk_reads_only_probed_cells_multi_entry(spark, tmp_path):
    """Manifest-level skip: with key-disjoint entries, the probed cell
    set prunes whole entries — the scan's input files are a strict
    subset of the index's."""
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    _, at = build_ivf_index(spark, path, e.filter(F.col("vec_id") < 250), k=4)
    append_to_ivf_index(
        spark, path, e.filter(F.col("vec_id") >= 250)
    )
    # entries: overwrite root (vec 0..249) + delta (250..499) — key
    # ranges disjoint, so the fast path engages pre-compaction
    assert at.entries_disjoint_on("vec_id")
    total = len(at.read().inputFiles())
    q = e.filter(F.col("vec_id") == 0)
    res = ivf_index_topk(spark, path, q, k=3, nprobe=1)
    res.collect()
    # nprobe=1 with one query touches 1 cell; both entries may hold
    # members of it, but the pushed filter must still be present
    tree = res._jdf.queryExecution().executedPlan().toString()
    assert "In(cell_id" in tree or "cell_id IN" in tree or "EqualTo(cell_id" in tree
    assert total >= 2


def test_filtered_search_restricts_and_fills_k(spark, tmp_path):
    """Filtered search (id_filter): only eligible ids come back, k is
    filled from eligible members (pre-filter semantics), and at
    nprobe = n_cells — every cell probed — the result is EXACTLY the
    brute-force top-k over the filtered corpus."""
    e = _emb(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, path, e, k=4)
    queries = e.filter(F.col("vec_id") < 5)
    eligible = e.filter(F.col("vec_id") % 3 == 0).select("vec_id")

    got = ivf_index_topk(
        spark, path, queries, k=5, nprobe=4, id_filter=eligible
    )
    rows = got.collect()
    ok_ids = {r.vec_id for r in eligible.collect()}
    assert rows and all(r.neighbor_id in ok_ids for r in rows)
    # every query fills k (the filtered corpus is large enough)
    from collections import Counter

    per_q = Counter(r.query_id for r in rows)
    assert set(per_q.values()) == {5}

    # all cells probed => identical to exact search over the filtered
    # corpus (same ordering contract: rounded cosine desc, neighbor id)
    exact = cosine_topk(
        queries, e.join(eligible, "vec_id", "left_semi"), k=5
    )
    want = {(r.query_id, r.neighbor_id, r.rank) for r in exact.collect()}
    assert {(r.query_id, r.neighbor_id, r.rank) for r in rows} == want

"""Incremental BM25 index (operators/search_index.py): build in
batches, exact score parity with the ad-hoc path, replay idempotency,
document removal."""

import os

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.search import bm25_topk
from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
    append_to_search_index,
    bm25_index_topk,
    load_search_index,
    remove_document,
)

SF = "/root/testdata/sf0.001"
TERMS = ("data", "model", "training")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


def _rows(df):
    return [(r.doc_id, r.n_hit_terms, r.score_u) for r in df.collect()]


def test_incremental_index_matches_adhoc_scores(spark, tmp_path):
    """Indexing the corpus in 3 batches must give byte-identical BM25
    results to the single-pass ad-hoc scorer over the same corpus —
    the integer-exactness contract extended to the persisted path."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    for i in range(3):
        append_to_search_index(
            spark, path, docs.filter(F.col("doc_id") % 3 == i)
        )
    got = _rows(bm25_index_topk(spark, path, TERMS, k=10))
    want = _rows(bm25_topk(docs, TERMS, k=10))
    assert got == want
    assert got  # non-trivial corpus hit


def test_replayed_batch_tag_keeps_stats_exact(spark, tmp_path):
    """At-least-once delivery: re-appending a tagged batch must not
    double the additive (n_docs, total_dl) stats — scores stay equal
    to the ad-hoc baseline after the replay."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    append_to_search_index(
        spark, path, docs.filter(F.col("doc_id") % 2 == 0), batch_tag="b0"
    )
    append_to_search_index(
        spark, path, docs.filter(F.col("doc_id") % 2 == 1), batch_tag="b1"
    )
    append_to_search_index(  # replay of b1
        spark, path, docs.filter(F.col("doc_id") % 2 == 1), batch_tag="b1"
    )
    _, st = load_search_index(spark, path)
    n = st.read().agg(F.sum("n_docs")).collect()[0][0]
    assert n == docs.count()
    assert _rows(bm25_index_topk(spark, path, TERMS, k=10)) == _rows(
        bm25_topk(docs, TERMS, k=10)
    )


def test_remove_document_unindexes_and_rebalances_stats(spark, tmp_path):
    """Removing a doc must drop it from results AND subtract its
    length from the additive stats — scores equal an ad-hoc run over
    the corpus WITHOUT that doc."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    append_to_search_index(spark, path, docs)
    victim = _rows(bm25_index_topk(spark, path, TERMS, k=1))[0][0]
    remove_document(spark, path, victim)
    got = _rows(bm25_index_topk(spark, path, TERMS, k=10))
    want = _rows(
        bm25_topk(docs.filter(F.col("doc_id") != victim), TERMS, k=10)
    )
    assert got == want
    assert all(d != victim for d, _, _ in got)


def test_compact_preserves_scores_and_folds_stats(spark, tmp_path):
    """Maintenance must be invisible to queries: after folding stats
    to one row and Z-ordering postings by term, results are unchanged
    and the stats table is a single row."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        compact_search_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    for i in range(3):
        append_to_search_index(
            spark, path, docs.filter(F.col("doc_id") % 3 == i)
        )
    before = _rows(bm25_index_topk(spark, path, TERMS, k=10))
    compact_search_index(spark, path)
    _, st = load_search_index(spark, path)
    assert st.read().count() == 1
    assert _rows(bm25_index_topk(spark, path, TERMS, k=10)) == before


def test_crash_between_postings_and_stats_heals_on_replay(spark, tmp_path):
    """The torn-write case: a worker dies AFTER the postings merge but
    BEFORE the stats append (tag not yet committed).  The redelivered
    batch must heal the index exactly — postings dedup by key, stats
    append once — ending byte-identical to a clean run."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        _doc_postings,
        create_search_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    append_to_search_index(spark, path, b0, batch_tag="b0")
    # simulate the crash: merge b1's postings WITHOUT the stats append
    pt, st = create_search_index(spark, path)
    postings, _ = _doc_postings(b1, "text", "doc_id")
    pt.merge(postings)
    # redelivery of the full batch
    append_to_search_index(spark, path, b1, batch_tag="b1")
    n = st.read().agg(F.sum("n_docs")).collect()[0][0]
    assert n == docs.count()
    assert _rows(bm25_index_topk(spark, path, TERMS, k=10)) == _rows(
        bm25_topk(docs, TERMS, k=10)
    )


def test_replace_reindexes_changed_document_exactly(spark, tmp_path):
    """Merge-shaped feed (replace=True): re-indexing a doc with NEW
    text must drop postings for terms the old version had and fix the
    additive stats — results equal an ad-hoc run over the LATEST
    corpus."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        load_search_index,
    )

    path = str(tmp_path / "idx")
    v1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "data model training")],
        "doc_id long, text string",
    )
    append_to_search_index(spark, path, v1, batch_tag="b0")
    v2 = spark.createDataFrame(
        [(1, "data data shiny")], "doc_id long, text string"
    )
    append_to_search_index(spark, path, v2, batch_tag="b1", replace=True)
    latest = spark.createDataFrame(
        [(1, "data data shiny"), (2, "data model training")],
        "doc_id long, text string",
    )
    _, st = load_search_index(spark, path)
    assert st.read().agg(F.sum("n_docs")).collect()[0][0] == 2
    for terms in (("alpha",), ("data", "model")):
        got = _rows(bm25_index_topk(spark, path, terms, k=10))
        want = _rows(bm25_topk(latest, terms, k=10))
        assert got == want
    assert not _rows(bm25_index_topk(spark, path, ("alpha",), k=10))


def test_remove_empty_document_fixes_stats(spark, tmp_path):
    """A token-less doc is counted in the stats (ad-hoc parity) and
    must be REMOVABLE — the sentinel posting makes it findable, so
    n_docs never sticks at an inflated value."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        load_search_index,
        remove_document,
    )

    path = str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [(1, "data model"), (7, "   ")], "doc_id long, text string"
    )
    append_to_search_index(spark, path, batch)
    _, st = load_search_index(spark, path)
    assert st.read().agg(F.sum("n_docs")).collect()[0][0] == 2
    remove_document(spark, path, 7)
    assert st.read().agg(F.sum("n_docs")).collect()[0][0] == 1
    # scoring unaffected by sentinel rows
    assert _rows(bm25_index_topk(spark, path, ("data",), k=5)) == _rows(
        bm25_topk(
            spark.createDataFrame([(1, "data model")], "doc_id long, text string"),
            ("data",), k=5,
        )
    )


def test_removal_crash_between_stats_and_delete_heals(spark, tmp_path,
                                                      monkeypatch):
    """Crash ordering: the negative stats row commits first (tagged),
    then the postings tombstone.  A crash in between redelivers the
    removal — the tag skips the second decrement and the delete
    completes, ending byte-identical to a clean removal."""
    from s3_sqs_data_ingestion_demo_spark import table as tbl_mod
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        load_search_index,
        remove_documents_bulk,
    )

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "data model training")],
        "doc_id long, text string",
    )
    append_to_search_index(spark, path, docs)

    real_delete = tbl_mod.ManagedTable.delete_keys
    calls = {"n": 0}

    def crashing_delete(self, keys_df):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before postings delete")
        return real_delete(self, keys_df)

    monkeypatch.setattr(tbl_mod.ManagedTable, "delete_keys", crashing_delete)
    ids = spark.createDataFrame([(1,)], "doc_id long")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated"):
        remove_documents_bulk(spark, path, ids)
    # redelivery
    remove_documents_bulk(spark, path, ids)

    _, st = load_search_index(spark, path)
    assert st.read().agg(F.sum("n_docs")).collect()[0][0] == 1  # not 0
    live = spark.createDataFrame(
        [(2, "data model training")], "doc_id long, text string"
    )
    assert _rows(bm25_index_topk(spark, path, ("data", "alpha"), k=5)) == \
        _rows(bm25_topk(live, ("data", "alpha"), k=5))


def _replace_fixture(spark, path):
    """v1 indexed clean; returns (v2 batch, expected latest corpus)."""
    v1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "data model training")],
        "doc_id long, text string",
    )
    append_to_search_index(spark, path, v1, batch_tag="b0")
    v2 = spark.createDataFrame(
        [(1, "data data shiny"), (3, "fresh corpus entry")],
        "doc_id long, text string",
    )
    latest = spark.createDataFrame(
        [
            (1, "data data shiny"),
            (2, "data model training"),
            (3, "fresh corpus entry"),
        ],
        "doc_id long, text string",
    )
    return v2, latest


def _assert_matches_clean(spark, path, latest):
    _, st = load_search_index(spark, path)
    assert st.read().agg(F.sum("n_docs")).collect()[0][0] == latest.count()
    for terms in (("alpha",), ("data", "model"), ("fresh", "shiny")):
        got = _rows(bm25_index_topk(spark, path, terms, k=10))
        want = _rows(bm25_topk(latest, terms, k=10))
        assert got == want, terms


def test_replace_crash_before_tombstone_heals_on_replay(spark, tmp_path,
                                                        monkeypatch):
    """replace=True, crash AFTER the net stats commit but BEFORE the
    victim tombstone: the redelivered batch must skip the (tagged)
    stats and complete the tombstone + merge — ending byte-identical
    to a clean replace.  This was the double-decrement hole: a removal
    tag derived from the (advanced) postings version would have
    appended a second negative stats row."""
    from s3_sqs_data_ingestion_demo_spark import table as tbl_mod

    path = str(tmp_path / "idx")
    v2, latest = _replace_fixture(spark, path)

    real_delete = tbl_mod.ManagedTable.delete_keys
    calls = {"n": 0}

    def crashing_delete(self, keys_df):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before victim tombstone")
        return real_delete(self, keys_df)

    monkeypatch.setattr(tbl_mod.ManagedTable, "delete_keys", crashing_delete)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated"):
        append_to_search_index(spark, path, v2, batch_tag="b1", replace=True)
    append_to_search_index(spark, path, v2, batch_tag="b1", replace=True)
    _assert_matches_clean(spark, path, latest)


def test_replace_crash_before_merge_heals_on_replay(spark, tmp_path,
                                                    monkeypatch):
    """replace=True, crash AFTER the victim tombstone but BEFORE the
    postings merge: redelivery finds no live victims (old rows already
    tombstoned), skips the tagged stats, and lands the merge once."""
    from s3_sqs_data_ingestion_demo_spark import table as tbl_mod

    path = str(tmp_path / "idx")
    v2, latest = _replace_fixture(spark, path)

    real_merge = tbl_mod.ManagedTable.merge
    calls = {"n": 0}

    def crashing_merge(self, source, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before postings merge")
        return real_merge(self, source, **kw)

    monkeypatch.setattr(tbl_mod.ManagedTable, "merge", crashing_merge)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated"):
        append_to_search_index(spark, path, v2, batch_tag="b1", replace=True)
    append_to_search_index(spark, path, v2, batch_tag="b1", replace=True)
    _assert_matches_clean(spark, path, latest)


def test_replace_duplicate_delivery_after_success(spark, tmp_path):
    """A duplicate delivery of a fully-committed replace batch (SQS
    at-least-once) must not change stats or scores: the tag skips the
    net stats row, and the tombstone + re-merge of the batch's own
    rows is a no-op at read time (newer seq wins)."""
    path = str(tmp_path / "idx")
    v2, latest = _replace_fixture(spark, path)
    append_to_search_index(spark, path, v2, batch_tag="b1", replace=True)
    append_to_search_index(spark, path, v2, batch_tag="b1", replace=True)
    _assert_matches_clean(spark, path, latest)

"""Declarative secondary-index maintenance (output_config.indexes):
every ingested batch also folds into the named retrieval indexes."""

import json
import os

from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig

SF = "/root/testdata/sf0.001"


def _write_docs_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("doc_id\ttext\n")
        for doc_id, text in rows:
            fh.write(f"{doc_id}\t{text}\n")


def _cfg(tmp, index_path):
    return JobConfig.from_dict({
        "input_config": {
            "format": "csv",
            "options": {"header": "true", "sep": "\t", "inferSchema": "true"},
        },
        "output_config": {
            "table_path": f"{tmp}/tbl",
            "mode": "append",
            "key_columns": ["doc_id"],
            "indexes": [{"type": "bm25", "path": index_path}],
        },
    })


def test_job_maintains_bm25_index_and_replay_is_exact(spark, tmp_path):
    from s3_sqs_data_ingestion_demo_spark.operators.search import bm25_topk
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        bm25_index_topk,
        load_search_index,
    )

    d = str(tmp_path)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    rows = [(r.doc_id, r.text.replace("\t", " ").replace("\n", " "))
            for r in docs.collect()]
    half = len(rows) // 2
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_docs_csv(b1, rows[:half])
    _write_docs_csv(b2, rows[half:])
    # table must pre-exist for append mode without an avsc contract
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
    from pyspark.sql import types as T
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType([T.StructField("doc_id", T.IntegerType()),
                      T.StructField("text", T.StringType())]),
        key_cols=["doc_id"],
    )
    cfg = _cfg(d, f"{d}/idx")
    J.process_files(spark, cfg, [b1])
    J.process_files(spark, cfg, [b2])
    J.process_files(spark, cfg, [b2])  # replayed batch: tag guard skips

    _, st = load_search_index(spark, f"{d}/idx")
    n = st.read().agg(F.sum("n_docs")).collect()[0][0]
    assert n == len(rows)

    # index results equal the ad-hoc scorer over the CSV-roundtripped corpus
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ("data", "model", "training")
    got = [(r.doc_id, r.score_u)
           for r in bm25_index_topk(spark, f"{d}/idx", terms, 10).collect()]
    want = [(r.doc_id, r.score_u)
            for r in bm25_topk(corpus, terms, k=10).collect()]
    assert got == want and got


def test_index_config_validation():
    import pytest

    with pytest.raises(ValueError, match="unknown index type"):
        JobConfig.from_dict(
            {"output_config": {"indexes": [{"type": "hnsw", "path": "/x"}]}}
        )
    with pytest.raises(ValueError, match="need a path"):
        JobConfig.from_dict(
            {"output_config": {"indexes": [{"type": "bm25"}]}}
        )


def test_index_maintenance_cadence_folds_and_preserves_results(spark, tmp_path):
    """maintenance_every=2: after the 2nd batch the search index
    compacts (stats fold to 1 row, postings range-clustered) with
    results unchanged."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        bm25_index_topk,
        load_search_index,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
    from pyspark.sql import types as T

    d = str(tmp_path)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    rows = [(r.doc_id, r.text.replace("\t", " ").replace("\n", " "))
            for r in docs.collect()]
    half = len(rows) // 2
    _write_docs_csv(f"{d}/b1.csv", rows[:half])
    _write_docs_csv(f"{d}/b2.csv", rows[half:])
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType([T.StructField("doc_id", T.IntegerType()),
                      T.StructField("text", T.StringType())]),
        key_cols=["doc_id"],
    )
    cfg = JobConfig.from_dict({
        "input_config": {
            "format": "csv",
            "options": {"header": "true", "sep": "\t", "inferSchema": "true"},
        },
        "output_config": {
            "table_path": f"{d}/tbl",
            "mode": "append",
            "key_columns": ["doc_id"],
            "indexes": [{"type": "bm25", "path": f"{d}/idx",
                         "maintenance_every": 2}],
        },
    })
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    J.process_files(spark, cfg, [f"{d}/b2.csv"])
    pt, st = load_search_index(spark, f"{d}/idx")
    assert st.read().count() == 1  # folded
    assert len(pt._read_manifest()) == 1  # compacted to one root
    n = st.read().collect()[0].n_docs
    assert n == len(rows)
    assert bm25_index_topk(
        spark, f"{d}/idx", ("data", "model", "training"), 5
    ).count() == 5


def test_merge_mode_and_cdc_deletes_keep_index_in_sync(spark, tmp_path):
    """Mode-aware maintenance: merge-mode updates REPLACE a doc's
    postings, and CDC delete rows un-index their keys in the same
    batch — the index never returns a doc the table no longer has."""
    from s3_sqs_data_ingestion_demo_spark.operators.search import bm25_topk
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        bm25_index_topk,
        load_search_index,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
    from pyspark.sql import types as T

    d = str(tmp_path)

    def write_cdc(path, rows):
        with open(path, "w") as fh:
            fh.write("Op\tts\tdoc_id\ttext\n")
            for op, ts, doc_id, text in rows:
                fh.write(f"{op}\t{ts}\t{doc_id}\t{text}\n")

    write_cdc(f"{d}/b1.csv", [
        ("I", 1, 1, "alpha beta gamma"),
        ("I", 1, 2, "data model training"),
        ("I", 1, 3, "spark merge window"),
    ])
    write_cdc(f"{d}/b2.csv", [
        ("U", 2, 1, "data data shiny"),   # update doc 1: new text
        ("D", 2, 3, "ignored"),            # delete doc 3
    ])
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType([
            T.StructField("doc_id", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.IntegerType()),
        ]),
        key_cols=["doc_id"], order_column="ts",
    )
    cfg = JobConfig.from_dict({
        "input_config": {
            "format": "csv",
            "options": {"header": "true", "sep": "\t", "inferSchema": "true"},
        },
        "output_config": {
            "table_path": f"{d}/tbl",
            "mode": "merge",
            "key_columns": ["doc_id"],
            "order_column": "ts",
            "cdc_delete_values": ["D"],
            "indexes": [{"type": "bm25", "path": f"{d}/idx"}],
        },
    })
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    J.process_files(spark, cfg, [f"{d}/b2.csv"])

    live = spark.createDataFrame(
        [(1, "data data shiny"), (2, "data model training")],
        "doc_id long, text string",
    )
    _, st = load_search_index(spark, f"{d}/idx")
    assert st.read().agg(F.sum("n_docs")).collect()[0][0] == 2
    for terms in (("alpha",), ("spark", "merge"), ("data", "model")):
        got = [(r.doc_id, r.score_u)
               for r in bm25_index_topk(spark, f"{d}/idx", terms, 10).collect()]
        want = [(r.doc_id, r.score_u)
                for r in bm25_topk(live, terms, k=10).collect()]
        assert got == want, terms


def test_merge_into_with_indexes_refuses_at_parse_time(tmp_path):
    """indexes + a verbatim MERGE INTO merge_query must be rejected
    when the config is PARSED — raising mid-batch (after messages were
    consumed) would turn the config error into an infinite
    poison-redelivery loop on the SQS path."""
    import pytest

    d = str(tmp_path)
    with open(f"{d}/m.sql", "w") as fh:
        fh.write("MERGE INTO target USING source_table ON 1=1 "
                 "WHEN MATCHED THEN UPDATE SET *")
    with pytest.raises(ValueError, match="transform_query"):
        JobConfig.from_dict({
            "output_config": {
                "table_path": f"{d}/tbl",
                "mode": "merge",
                "merge_query": f"{d}/m.sql",
                "key_columns": ["doc_id"],
                "indexes": [{"type": "bm25", "path": f"{d}/idx"}],
            },
        })


def test_merge_into_with_indexes_runtime_guard(spark, tmp_path):
    """Defense in depth: a config object that dodged parse validation
    (e.g. the .sql file appeared after parse) still refuses in
    process_files BEFORE any write."""
    import pytest

    d = str(tmp_path)
    with open(f"{d}/b.csv", "w") as fh:
        fh.write("doc_id\ttext\n1\thello\n")
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
    from pyspark.sql import types as T
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType([T.StructField("doc_id", T.IntegerType()),
                      T.StructField("text", T.StringType())]),
        key_cols=["doc_id"],
    )
    # the .sql file does not exist at parse time → parse probe defers
    cfg = JobConfig.from_dict({
        "input_config": {
            "format": "csv",
            "options": {"header": "true", "sep": "\t", "inferSchema": "true"},
        },
        "output_config": {
            "table_path": f"{d}/tbl",
            "mode": "merge",
            "merge_query": f"{d}/m.sql",
            "order_column": "doc_id",
            "key_columns": ["doc_id"],
            "indexes": [{"type": "bm25", "path": f"{d}/idx"}],
        },
    })
    with open(f"{d}/m.sql", "w") as fh:
        fh.write("MERGE INTO target USING source_table ON 1=1 "
                 "WHEN MATCHED THEN UPDATE SET *")
    with pytest.raises(ValueError, match="transform_query"):
        J.process_files(spark, cfg, [f"{d}/b.csv"])


def test_merge_mode_indexes_require_order_column(tmp_path):
    """Merge-mode indexes without order_column are rejected at parse:
    the table and the index would have no shared deterministic rule
    for a batch carrying two versions of one key."""
    import pytest

    with pytest.raises(ValueError, match="order_column"):
        JobConfig.from_dict({
            "output_config": {
                "table_path": f"{tmp_path}/tbl",
                "mode": "merge",
                "key_columns": ["doc_id"],
                "indexes": [{"type": "bm25", "path": f"{tmp_path}/idx"}],
            },
        })


def test_ivf_drift_triggers_declared_rebuild(spark, tmp_path):
    """A declared ivf index with rebuild_max_cell_share refits itself
    when drifted appends concentrate the corpus in one cell: the
    centroids advance past the bootstrap fit and the post-rebuild
    balance improves."""
    import json as _json

    from s3_sqs_data_ingestion_demo_spark.operators.ann_index import (
        load_ivf_index,
        max_cell_share,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
    from pyspark.sql import types as T

    d = str(tmp_path)

    def land(name, rows):
        with open(f"{d}/{name}", "w") as fh:
            for doc_id, emb in rows:
                fh.write(_json.dumps({"doc_id": doc_id, "embedding": emb}) + "\n")
        return f"{d}/{name}"

    # bootstrap: two tight clusters in DIFFERENT DIRECTIONS (cell
    # assignment is cosine against unit centroids, so separation must
    # be angular, not radial) → k=2 splits them 4/4
    b0 = land("b0.json", [(i, [1.0, 0.01 * i]) for i in range(4)]
              + [(10 + i, [0.01 * i, 1.0]) for i in range(4)])
    # drift: 16 more vectors at ~51° — all nearer the second cluster's
    # direction, piling into one cell (share 20/24 > 0.6)
    b1 = land("b1.json", [(100 + i, [0.8 + 0.01 * i, 1.0]) for i in range(16)])
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
        key_cols=["doc_id"],
    )
    cfg = JobConfig.from_dict({
        "input_config": {"format": "json"},
        "output_config": {
            "table_path": f"{d}/tbl",
            "mode": "append",
            "key_columns": ["doc_id"],
            "indexes": [{
                "type": "ivf", "path": f"{d}/ivf",
                "vector_column": "embedding", "ivf_cells": 2,
                "maintenance_every": 1, "rebuild_max_cell_share": 0.6,
            }],
        },
    })
    J.process_files(spark, cfg, [b0])
    ct, at = load_ivf_index(spark, f"{d}/ivf")
    cent_v = ct._current_version()
    share_before_drift = max_cell_share(spark, f"{d}/ivf")
    assert share_before_drift <= 0.6  # balanced bootstrap
    J.process_files(spark, cfg, [b1])
    ct2, at2 = load_ivf_index(spark, f"{d}/ivf")
    # the drifted batch pushed one cell past the share bar → refit ran
    assert ct2._current_version() > cent_v
    assert max_cell_share(spark, f"{d}/ivf") <= 20 / 24
    # every vector still assigned exactly once
    assert at2.read().select("vec_id").distinct().count() == 24


def test_parallel_fold_failure_surfaces_after_all_settle(
    spark, tmp_path, monkeypatch
):
    """With >=2 declared indexes the folds run in a thread pool
    (job._maintain_indexes): one failing fold must not strand the
    others mid-flight — the error surfaces AFTER every fold settles,
    and the batch redelivery that follows heals the failed index
    without double-counting the one that succeeded (keyed upsert)."""
    import pytest
    from pyspark.sql import types as T

    from s3_sqs_data_ingestion_demo_spark.operators import search_index as SI
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        bm25_index_topk,
    )
    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    d = str(tmp_path)
    batch = f"{d}/b0.csv"
    _write_docs_csv(
        batch,
        [(1, "spark shuffles data"), (2, "parquet stores columns"),
         (3, "spark reads parquet")],
    )
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType([T.StructField("doc_id", T.IntegerType()),
                      T.StructField("text", T.StringType())]),
        key_cols=["doc_id"],
    )
    cfg = JobConfig.from_dict({
        "input_config": {
            "format": "csv",
            "options": {"header": "true", "sep": "\t", "inferSchema": "true"},
        },
        "output_config": {
            "table_path": f"{d}/tbl",
            "mode": "append",
            "key_columns": ["doc_id"],
            "indexes": [
                {"type": "bm25", "path": f"{d}/bm25"},
                {"type": "minhash", "path": f"{d}/mh"},
            ],
        },
    })

    orig = SI.append_to_search_index
    armed = {"on": True}

    def crashing_append(*a, **kw):
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("simulated bm25 fold failure")
        return orig(*a, **kw)

    monkeypatch.setattr(SI, "append_to_search_index", crashing_append)
    with pytest.raises(RuntimeError, match="bm25 fold failure"):
        J.process_files(spark, cfg, [batch])
    # the OTHER fold settled before the error surfaced
    assert ManagedTable.exists(f"{d}/mh")
    n_sig = ManagedTable.load(spark, f"{d}/mh").read().count()
    assert n_sig == 3
    # redelivery: bm25 folds for real; minhash keyed upsert, no dupes
    J.process_files(spark, cfg, [batch])
    hits = bm25_index_topk(spark, f"{d}/bm25", ("spark", "parquet"), 3)
    assert {r.doc_id for r in hits.collect()} == {1, 2, 3}
    sig = ManagedTable.load(spark, f"{d}/mh").read()
    assert sig.count() == 3  # one signature row per doc, no dupes

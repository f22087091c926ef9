"""Declarative ``minhash`` near-dup index (output_config.indexes):
every ingested batch folds into the MinHash-LSH signature table and
its verified near-dup pairs land in the keyed pairs-log table — the
ingest-time duplicate alarm, maintained without an external scheduler.

Mirrors tests/test_job_indexes.py's structure for the third index
type; the LSH mechanics themselves are pinned by
tests/test_streaming_neardup.py — here we pin the JOB wiring:
mode-awareness, replay idempotency, CDC delete propagation, rebuild.
"""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

LONG_A = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "bank today"
)
LONG_A_NEAR = LONG_A.replace("today", "tonight")
LONG_B = (
    "spark engines shuffle partitioned data across executors while "
    "catalyst optimizes query plans"
)
def _write_docs(path, rows):
    with open(path, "w") as fh:
        fh.write("doc_id\ttext\n")
        for doc_id, text in rows:
            fh.write(f"{doc_id}\t{text}\n")


def _write_cdc(path, rows):
    with open(path, "w") as fh:
        fh.write("Op\tts\tdoc_id\ttext\n")
        for op, ts, doc_id, text in rows:
            fh.write(f"{op}\t{ts}\t{doc_id}\t{text}\n")


def _doc_table(spark, path, with_ts=False):
    fields = [
        T.StructField("doc_id", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
    if with_ts:
        fields.append(T.StructField("ts", T.IntegerType()))
    ManagedTable.create(
        spark, path, T.StructType(fields),
        key_cols=["doc_id"],
        order_column="ts" if with_ts else None,
    )


def _cfg(d, mode="append", **extra_out):
    out = {
        "table_path": f"{d}/tbl",
        "mode": mode,
        "key_columns": ["doc_id"],
        "indexes": [{
            "type": "minhash",
            "path": f"{d}/mh",
            "pairs_path": f"{d}/pairs",
        }],
    }
    out.update(extra_out)
    return JobConfig.from_dict({
        "input_config": {
            "format": "csv",
            "options": {"header": "true", "sep": "\t", "inferSchema": "true"},
        },
        "output_config": out,
    })


def _pairs(spark, d):
    t = ManagedTable.load(spark, f"{d}/pairs")
    return sorted(
        (r.doc_id_a, r.doc_id_b) for r in t.read().collect()
    )


def test_append_mode_emits_cross_batch_pairs_and_replay_is_exact(
    spark, tmp_path
):
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl")
    _write_docs(f"{d}/b1.csv", [(1, LONG_A), (2, LONG_B)])
    _write_docs(f"{d}/b2.csv", [(7, LONG_A_NEAR)])
    cfg = _cfg(d)
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    assert _pairs(spark, d) == []  # no dups within batch 1
    J.process_files(spark, cfg, [f"{d}/b2.csv"])
    assert _pairs(spark, d) == [(1, 7)]

    # replayed batch (crash between sink write and source commit):
    # keyed signature merge + keyed pairs merge → nothing duplicates
    J.process_files(spark, cfg, [f"{d}/b2.csv"])
    assert _pairs(spark, d) == [(1, 7)]
    mh = ManagedTable.load(spark, f"{d}/mh")
    assert mh.read().count() == 3  # one signature row per doc


def test_within_batch_pairs_are_detected(spark, tmp_path):
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl")
    _write_docs(f"{d}/b1.csv", [(1, LONG_A), (2, LONG_A_NEAR), (3, LONG_B)])
    cfg = _cfg(d)
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    assert _pairs(spark, d) == [(1, 2)]


def test_merge_mode_update_replaces_signature(spark, tmp_path):
    """An updated document must pair by its NEW text only: the keyed
    merge replaces its signature row wholesale (no remove-then-append
    needed — one row per doc, unlike BM25's (term, doc) postings)."""
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl", with_ts=True)
    _write_cdc(f"{d}/b1.csv", [
        ("I", 1, 1, LONG_B),
        ("I", 1, 2, LONG_A),
    ])
    _write_cdc(f"{d}/b2.csv", [("U", 2, 1, LONG_A_NEAR)])  # doc 1 re-texted
    _write_cdc(f"{d}/b3.csv", [("I", 3, 9, LONG_B)])
    cfg = _cfg(d, mode="merge", order_column="ts")
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    J.process_files(spark, cfg, [f"{d}/b2.csv"])
    # the update itself pairs doc 1's new text with doc 2's similar text
    assert _pairs(spark, d) == [(1, 2)]
    # doc 9 IS doc 1's ORIGINAL text verbatim (bands always collide for
    # exact copies) — exact verification against doc 1's REPLACED
    # signature must reject the stale pairing
    J.process_files(spark, cfg, [f"{d}/b3.csv"])
    assert _pairs(spark, d) == [(1, 2)]
    mh = ManagedTable.load(spark, f"{d}/mh")
    assert mh.read().count() == 3


def test_cdc_delete_unindexes_the_doc(spark, tmp_path):
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl", with_ts=True)
    _write_cdc(f"{d}/b1.csv", [
        ("I", 1, 1, LONG_A),
        ("I", 1, 2, LONG_B),
    ])
    _write_cdc(f"{d}/b2.csv", [("D", 2, 1, "ignored")])
    _write_cdc(f"{d}/b3.csv", [("I", 3, 9, LONG_A_NEAR)])
    cfg = _cfg(d, mode="merge", order_column="ts",
               cdc_delete_values=["D"])
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    J.process_files(spark, cfg, [f"{d}/b2.csv"])
    J.process_files(spark, cfg, [f"{d}/b3.csv"])
    # doc 1 was deleted before doc 9 arrived: no pair may reference it
    assert _pairs(spark, d) == []


def test_overwrite_mode_rebuilds_as_corpus_self_dedup(spark, tmp_path):
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl")
    _write_docs(f"{d}/b1.csv", [(1, LONG_A), (2, LONG_B)])
    cfg = _cfg(d)
    J.process_files(spark, cfg, [f"{d}/b1.csv"])

    _write_docs(f"{d}/full.csv", [
        (10, LONG_A), (11, LONG_A_NEAR), (12, LONG_B),
    ])
    cfg_ow = _cfg(d, mode="overwrite")
    J.process_files(spark, cfg_ow, [f"{d}/full.csv"])
    # old signatures (ids 1, 2) gone; pairs log holds the self-dedup
    mh = ManagedTable.load(spark, f"{d}/mh")
    assert sorted(r.id for r in mh.read().select("id").collect()) == [
        10, 11, 12,
    ]
    assert _pairs(spark, d) == [(10, 11)]


def test_maintenance_cadence_folds_deltas(spark, tmp_path):
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl")
    cfg = _cfg(d)
    cfg.output_config.indexes[0].maintenance_every = 2
    batches = [
        [(1, LONG_A)], [(2, LONG_B)], [(3, LONG_A_NEAR)], [(4, LONG_B)],
    ]
    for i, rows in enumerate(batches):
        _write_docs(f"{d}/b{i}.csv", rows)
        J.process_files(spark, cfg, [f"{d}/b{i}.csv"])
    mh = ManagedTable.load(spark, f"{d}/mh")
    # compaction ran at the cadence: deltas folded, results intact
    assert mh.data_commits_since_maintenance() < 2
    assert mh.read().count() == 4
    assert _pairs(spark, d) == [(1, 3), (2, 4)]


def test_minhash_config_validation():
    import pytest

    cfg = JobConfig.from_dict({
        "output_config": {
            "table_path": "/t",
            "mode": "append",
            "key_columns": ["doc_id"],
            "indexes": [{
                "type": "minhash", "path": "/x",
                "minhash_threshold": 0.7,
            }],
        },
    })
    ix = cfg.output_config.indexes[0]
    assert ix.type == "minhash" and ix.minhash_threshold == 0.7
    assert ix.pairs_path == ""  # optional: signature-only maintenance

    with pytest.raises(ValueError, match="minhash_threshold"):
        JobConfig.from_dict({
            "output_config": {
                "indexes": [{
                    "type": "minhash", "path": "/x",
                    "minhash_threshold": 0.0,
                }],
            },
        })


def test_signature_only_maintenance_without_pairs_path(spark, tmp_path):
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl")
    _write_docs(f"{d}/b1.csv", [(1, LONG_A), (2, LONG_B)])
    cfg = _cfg(d)
    cfg.output_config.indexes[0].pairs_path = ""
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    mh = ManagedTable.load(spark, f"{d}/mh")
    assert mh.read().count() == 2
    assert not os.path.exists(f"{d}/pairs")


def test_within_batch_delete_never_pairs(spark, tmp_path):
    """A doc deleted in the SAME batch that carries a near-dup of it
    must not pair: deletes tombstone signatures BEFORE pair
    generation (review finding r07)."""
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl", with_ts=True)
    _write_cdc(f"{d}/b1.csv", [
        ("I", 1, 1, LONG_A),
        ("I", 1, 2, LONG_B),
    ])
    _write_cdc(f"{d}/b2.csv", [
        ("D", 2, 1, "ignored"),
        ("I", 2, 9, LONG_A_NEAR),  # near doc 1 — deleted THIS batch
    ])
    cfg = _cfg(d, mode="merge", order_column="ts",
               cdc_delete_values=["D"])
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    J.process_files(spark, cfg, [f"{d}/b2.csv"])
    assert _pairs(spark, d) == []


def test_all_deletes_batch_keeps_fast_path(spark, tmp_path):
    """An all-deletes CDC batch arrives EMPTY at the index: no rowless
    signature delta may be committed (a stats-less empty entry would
    flip every later disjointness proof to the slow path), and the
    delete itself still un-indexes."""
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl", with_ts=True)
    _write_cdc(f"{d}/b1.csv", [
        ("I", 1, 1, LONG_A),
        ("I", 1, 2, LONG_B),
    ])
    _write_cdc(f"{d}/b2.csv", [("D", 2, 2, "ignored")])  # deletes only
    _write_cdc(f"{d}/b3.csv", [("I", 3, 9, LONG_A_NEAR)])
    cfg = _cfg(d, mode="merge", order_column="ts",
               cdc_delete_values=["D"])
    J.process_files(spark, cfg, [f"{d}/b1.csv"])
    J.process_files(spark, cfg, [f"{d}/b2.csv"])
    mh = ManagedTable.load(spark, f"{d}/mh")
    # only the delete tombstone landed — no rowless data delta
    kinds = [e.get("kind") for e in mh._read_manifest()]
    assert kinds.count("delta") == 1, kinds
    # ... and batch 3 still pairs with doc 1 (fast path or not, the
    # result is right; the rowless-delta absence is what this pins)
    J.process_files(spark, cfg, [f"{d}/b3.csv"])
    assert _pairs(spark, d) == [(1, 9)]


def test_maintenance_folds_pairs_log_too(spark, tmp_path):
    d = str(tmp_path)
    _doc_table(spark, f"{d}/tbl")
    cfg = _cfg(d)
    cfg.output_config.indexes[0].maintenance_every = 2
    batches = [
        [(1, LONG_A)], [(2, LONG_A_NEAR)], [(3, LONG_A)], [(4, LONG_B)],
    ]
    for i, rows in enumerate(batches):
        _write_docs(f"{d}/b{i}.csv", rows)
        J.process_files(spark, cfg, [f"{d}/b{i}.csv"])
    pt = ManagedTable.load(spark, f"{d}/pairs")
    assert pt.data_commits_since_maintenance() < 2
    assert _pairs(spark, d) == [(1, 2), (1, 3), (2, 3)]


def test_rebuild_share_validated_at_parse():
    import pytest

    for bad in (-0.6, 60):
        with pytest.raises(ValueError, match="rebuild_max_cell_share"):
            JobConfig.from_dict({
                "output_config": {
                    "indexes": [{
                        "type": "ivf", "path": "/x",
                        "rebuild_max_cell_share": bad,
                    }],
                },
            })


def test_forget_keys_removes_from_table_and_every_index(spark, tmp_path):
    """Takedown flow (job.forget_keys): one call removes the ids from
    the table, the bm25/ivf/minhash indexes, AND scrubs pairs-log rows
    referencing them."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        bm25_index_topk,
    )
    from s3_sqs_data_ingestion_demo_spark.operators.ann_index import (
        load_ivf_index,
    )

    d = str(tmp_path)
    ManagedTable.create(
        spark, f"{d}/tbl",
        T.StructType([
            T.StructField("doc_id", T.IntegerType()),
            T.StructField("text", T.StringType()),
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
            "indexes": [
                {"type": "bm25", "path": f"{d}/bm"},
                {"type": "ivf", "path": f"{d}/ivf",
                 "vector_column": "embedding", "ivf_cells": 2},
                {"type": "minhash", "path": f"{d}/mh",
                 "pairs_path": f"{d}/pairs"},
            ],
        },
    })
    import json as _json

    rows = [
        {"doc_id": 1, "text": LONG_A, "embedding": [1.0, 0.0]},
        {"doc_id": 2, "text": LONG_B, "embedding": [0.0, 1.0]},
        {"doc_id": 7, "text": LONG_A_NEAR, "embedding": [0.9, 0.1]},
    ]
    with open(f"{d}/b1.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    J.process_files(spark, cfg, [f"{d}/b1.json"])
    assert _pairs(spark, d) == [(1, 7)]

    ids = spark.createDataFrame([(1,)], "doc_id int")
    J.forget_keys(spark, cfg, ids)

    # table: gone
    live = sorted(
        r.doc_id
        for r in ManagedTable.load(spark, f"{d}/tbl").read().collect()
    )
    assert live == [2, 7]
    # bm25: a term unique to doc 1's text no longer returns it
    got = [r.doc_id
           for r in bm25_index_topk(spark, f"{d}/bm", ("quick",), 5).collect()]
    assert 1 not in got and 7 in got
    # ivf: assignments no longer hold vec 1
    _, at = load_ivf_index(spark, f"{d}/ivf")
    assert sorted(r.vec_id for r in at.read().collect()) == [2, 7]
    # minhash: signature tombstoned, pairs log scrubbed
    mh = ManagedTable.load(spark, f"{d}/mh")
    assert sorted(r.id for r in mh.read().collect()) == [2, 7]
    assert _pairs(spark, d) == []
    # idempotent: re-running the forget converges
    J.forget_keys(spark, cfg, ids)
    assert _pairs(spark, d) == []

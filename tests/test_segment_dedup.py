"""Corpus boilerplate segment dedup (operators/dedup.py
segment_dedup_stats)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib  # noqa: E402

from s3_sqs_data_ingestion_demo_spark.operators import dedup as D  # noqa: E402

BOILER = "one two three four"  # one 4-token window, shared across docs


def _docs(spark):
    rows = [
        (1, BOILER + " uniq1a uniq1b uniq1c uniq1d"),
        (2, BOILER + " uniq2a uniq2b uniq2c uniq2d"),
        (3, "only unique tokens in this doc here yes"),
        (4, BOILER),  # nothing but boilerplate -> fully dropped
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shared_segments_dropped_uniques_kept(spark):
    out = {
        r.doc_id: r
        for r in D.segment_dedup_stats(_docs(spark), window=4, max_doc_freq=1).collect()
    }
    assert out[1].n_segs == 2 and out[1].n_dropped == 1
    assert out[2].n_dropped == 1 and out[2].kept_tokens == 4
    assert out[3].n_dropped == 0 and out[3].kept_tokens == 8
    # doc 4 is pure boilerplate: everything dropped, empty fingerprint
    assert out[4].n_dropped == 1 and out[4].kept_tokens == 0
    assert out[4].clean_fp == hashlib.md5(b"").hexdigest()


def test_higher_doc_freq_threshold_keeps_pairs(spark):
    out = {
        r.doc_id: r
        for r in D.segment_dedup_stats(_docs(spark), window=4, max_doc_freq=3).collect()
    }
    # the boilerplate window appears in 3 docs -> allowed at threshold 3
    assert all(r.n_dropped == 0 for r in out.values())


def test_clean_fp_is_order_stable(spark):
    docs = _docs(spark)
    a = {r.doc_id: r.clean_fp for r in D.segment_dedup_stats(docs, window=4).collect()}
    b = {
        r.doc_id: r.clean_fp
        for r in D.segment_dedup_stats(docs.repartition(7), window=4).collect()
    }
    assert a == b

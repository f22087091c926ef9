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


def test_span_dedup_rolling_windows_and_masking(spark):
    """Lee-et-al-style span masking: rolling windows catch duplicated
    runs at ANY alignment (here offset by one token), masking is
    position-level, and intra-doc repetition counts too."""
    from s3_sqs_data_ingestion_demo_spark.operators.dedup import (
        span_dedup_stats,
    )

    run = " ".join(f"w{i}" for i in range(8))  # one exact 8-token run
    docs = [
        (1, f"a b c {run} x y z"),            # run at offset 3
        (2, f"{run} p q r s t u v"),          # same run at offset 0
        (3, "unique tokens only here none repeated at all ok fine"),
        (4, f"{run} {run}"),                  # intra-doc repetition
        (5, ""),                              # empty doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in span_dedup_stats(df, window=8).collect()}
    # docs 1 and 2: exactly the 8 run tokens masked, surroundings kept
    assert (got[1].n_tokens, got[1].n_dup_tokens) == (14, 8)
    assert (got[2].n_tokens, got[2].n_dup_tokens) == (15, 8)
    assert got[1].dup_ppm == (8 * 1_000_000) // 14
    # doc 3: untouched
    assert got[3].n_dup_tokens == 0
    # doc 4: the run repeats within ONE doc — 16 tokens, all masked
    # (every window in "run run" includes a duplicated alignment)
    assert (got[4].n_tokens, got[4].n_dup_tokens) == (16, 16)
    # empty doc: defined zeros
    assert (got[5].n_tokens, got[5].n_dup_tokens, got[5].dup_ppm) == (0, 0, 0)

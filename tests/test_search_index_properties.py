"""Property-based tests (hypothesis): the incremental BM25 index over
random corpora, batch splits, and removal sets must always agree
byte-for-byte with the single-pass ad-hoc scorer over the live corpus
— the composition law the index's exactness claims rest on."""

import pytest

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.search import bm25_topk
from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
    append_to_search_index,
    bm25_index_topk,
    remove_documents_bulk,
)

pytestmark = pytest.mark.slow  # multi-minute law: smoke tier skips (pytest.ini)

WORDS = ["data", "model", "spark", "merge", "window", "train", "x"]

DOC = st.lists(
    st.sampled_from(WORDS), min_size=0, max_size=6
).map(" ".join)

CORPUS = st.lists(DOC, min_size=1, max_size=8)


def _rows(df):
    return [(r.doc_id, r.n_hit_terms, r.score_u) for r in df.collect()]


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(corpus=CORPUS, split=st.integers(min_value=1, max_value=3),
       data=st.data())
def test_batched_build_plus_removal_equals_adhoc(spark, tmp_path_factory,
                                                 corpus, split, data):
    tmp = str(tmp_path_factory.mktemp("sidx"))
    path = os.path.join(tmp, "idx")
    docs = [(i, text) for i, text in enumerate(corpus)]
    df_all = spark.createDataFrame(docs, "doc_id long, text string")
    # index in `split` deterministic batches
    for b in range(split):
        batch = [d for d in docs if d[0] % split == b]
        if batch:
            append_to_search_index(
                spark, path,
                spark.createDataFrame(batch, "doc_id long, text string"),
                batch_tag=f"b{b}",
            )
    removed = data.draw(
        st.sets(st.sampled_from([d[0] for d in docs]), max_size=2),
        label="removed",
    )
    if removed:
        remove_documents_bulk(
            spark, path,
            spark.createDataFrame([(i,) for i in removed], "doc_id long"),
        )
    live = df_all.filter(~F.col("doc_id").isin(list(removed)) if removed
                         else F.lit(True))
    terms = ("data", "model", "train")
    # an empty live corpus converges too: both paths yield [] (the
    # tf relation is empty, so nothing downstream executes)
    got = _rows(bm25_index_topk(spark, path, terms, k=10))
    want = _rows(bm25_topk(live, terms, k=10))
    assert got == want

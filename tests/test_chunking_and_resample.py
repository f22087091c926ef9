"""Token-window chunking (operators/text.py chunk_documents),
gap-fill resample (operators/timeseries.py), and model-inference
plumbing (operators/inference.py)."""

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.inference import (
    model_score,
    score_filter,
)
from s3_sqs_data_ingestion_demo_spark.operators.text import chunk_documents
from s3_sqs_data_ingestion_demo_spark.operators.timeseries import (
    resample_last_value,
)


def test_chunk_windows_cover_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_size=32, overlap=8).collect()
    # stride 24, n_eff = 100-8 = 92 -> ceil(92/24) = 4 chunks at
    # 0/24/48/72; windows [0,32) [24,56) [48,80) [72,100) cover every
    # token and no chunk starts past the last uncovered position
    assert [(r.chunk_id, r.n_chunk_tokens) for r in sorted(out, key=lambda r: r.chunk_id)] == [
        (0, 32), (1, 32), (2, 32), (3, 28)
    ]


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_size=32, overlap=8).collect()
    assert len(out) == 1  # token-free docs emit nothing
    assert (out[0].doc_id, out[0].chunk_id, out[0].n_chunk_tokens) == (1, 0, 3)


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=8, overlap=8)


def test_chunking_is_shuffle_free(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chunk_documents(docs)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = out._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in p  # projection + generator only


def test_resample_fills_gaps_with_last_value(spark):
    rows = [
        # user 1: events at hour 0 and hour 3 -> hours 1, 2 are gaps
        (10, "2024-01-01 00:15:00", 1, 5.0),
        (11, "2024-01-01 03:10:00", 1, 9.0),
        # user 2: single event -> single grid point
        (12, "2024-01-01 07:30:00", 2, 1.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r.key, r.bucket): (r.value_filled, r.is_gap)
        for r in resample_last_value(df).collect()
    }
    h = 3600
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert out[(1, base)] == (5.0, 0)
    assert out[(1, base + h)] == (5.0, 1)  # carried forward
    assert out[(1, base + 2 * h)] == (5.0, 1)
    assert out[(1, base + 3 * h)] == (9.0, 0)
    assert out[(2, base + 7 * h)] == (1.5, 0)
    assert len(out) == 5


def test_resample_in_bucket_survivor_is_deterministic(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 1, 3.0),
        (2, "2024-01-01 00:50:00", 1, 7.0),  # latest ts wins
        (3, "2024-01-01 00:50:00", 1, 4.0),  # ts tie -> higher value wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    [r] = resample_last_value(df).collect()
    assert r.value_filled == 7.0


def test_model_score_stub_is_deterministic_and_bounded(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id: r for r in model_score(docs).collect()}
    b = {r.doc_id: r for r in model_score(docs.repartition(7)).collect()}
    assert len(a) == docs.count()
    for k in a:
        assert 0.0 <= a[k].model_score < 1.0
        assert a[k].score_bucket == int(a[k].model_score * 10)
        assert (a[k].model_score, a[k].score_bucket) == (
            b[k].model_score,
            b[k].score_bucket,
        )


def test_model_score_real_model_fails_loudly(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(NotImplementedError, match="ML runtime"):
        model_score(docs, model="bert-quality")


def test_orc_batch_roundtrip(spark, tmp_path):
    """ORC joins the multi-format dispatch (SURVEY §2 S4): write a
    batch as ORC, read it back through read_batch with the contract
    schema."""
    import os

    from s3_sqs_data_ingestion_demo_spark.sources.files import read_batch

    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    d = os.path.join(str(tmp_path), "orc")
    src.write.orc(d)
    files = [
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".orc")
    ]
    out = read_batch(spark, files, fmt="orc", schema=src.schema)
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
    ]


def test_score_filter_keeps_only_clearing_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = score_filter(docs, min_score=0.5)
    scores = model_score(docs)
    expected = scores.filter(F.col("model_score") >= 0.5).count()
    assert kept.count() == expected
    assert 0 < expected < docs.count()
    assert kept.columns == docs.columns  # payload schema preserved


def test_udtf_surface_token_spans_and_sentences(spark):
    """Python UDTFs (SURVEY §2.5): registered table functions usable
    from SQL LATERAL — the extension point for Python-dependent
    row-expansions (built-in generators stay JVM-side everywhere
    else)."""
    from s3_sqs_data_ingestion_demo_spark.operators.udtf_ops import (
        register_udtfs,
    )

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "One. Two three! ")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("_sg_udtf_docs")
    spans = spark.sql(
        "SELECT d.doc_id, t.pos, t.token, t.n_chars "
        "FROM _sg_udtf_docs d, LATERAL token_spans(d.text) t"
    ).collect()
    assert {(r.doc_id, r.pos, r.token) for r in spans} == {
        (1, 0, "alpha"), (1, 1, "beta"), (1, 2, "gamma"),
        (2, 0, "One."), (2, 1, "Two"), (2, 2, "three!"),
    }
    sents = spark.sql(
        "SELECT d.doc_id, s.sent_id, s.sentence, s.n_tokens "
        "FROM _sg_udtf_docs d, LATERAL split_sentences(d.text) s "
        "WHERE d.doc_id = 2"
    ).collect()
    assert [(r.sent_id, r.sentence, r.n_tokens) for r in sorted(sents, key=lambda r: r.sent_id)] == [
        (0, "One", 1), (1, "Two three", 2)
    ]


def test_resample_linear_interpolation(spark):
    rows = [
        (1, "2024-01-01 00:30:00", 1, 2.0),
        (2, "2024-01-01 04:30:00", 1, 10.0),  # 4 buckets later
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.bucket: (r.value_filled, r.is_gap)
        for r in resample_last_value(df, mode="linear").collect()
    }
    base, h = 1704067200, 3600
    assert out[base] == (2.0, 0)
    assert out[base + h] == (4.0, 1)   # 2 + 8 * 1/4
    assert out[base + 2 * h] == (6.0, 1)
    assert out[base + 3 * h] == (8.0, 1)
    assert out[base + 4 * h] == (10.0, 0)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="resample mode"):
        resample_last_value(df, mode="spline")


def test_xml_batch_roundtrip(spark, tmp_path):
    """XML joins the multi-format dispatch (native Spark 4 source):
    read a hand-written document through read_batch, both with the
    default rowTag and an explicit one."""
    import os

    from s3_sqs_data_ingestion_demo_spark.sources.files import read_batch

    p = os.path.join(str(tmp_path), "batch.xml")
    with open(p, "w") as f:
        f.write(
            "<rows><row><id>1</id><name>a</name></row>"
            "<row><id>2</id><name>b</name></row></rows>"
        )
    out = read_batch(spark, [p], fmt="xml")
    assert sorted(tuple(r) for r in out.select("id", "name").collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    p2 = os.path.join(str(tmp_path), "batch2.xml")
    with open(p2, "w") as f:
        f.write("<recs><rec><id>3</id></rec></recs>")
    out2 = read_batch(spark, [p2], fmt="xml", options={"rowTag": "rec"})
    assert [r["id"] for r in out2.collect()] == [3]


def test_parquet_multifile_batch_roundtrip(spark, tmp_path):
    """Multi-file parquet batches through read_batch: the parquet
    reader is the ONE varargs signature in DataFrameReader — passing
    the file list unexpanded used to land it in the option map and die
    with a JVM ClassCastException (regression)."""
    import os

    from s3_sqs_data_ingestion_demo_spark.sources.files import read_batch

    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    d = os.path.join(str(tmp_path), "pq")
    src.repartition(3).write.parquet(d)
    files = [
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    out = read_batch(spark, files, fmt="parquet")
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_unknown_format_fails_loudly(spark):
    from s3_sqs_data_ingestion_demo_spark.sources.files import read_batch

    with pytest.raises(ValueError, match="unsupported input format"):
        read_batch(spark, ["/tmp/x"], fmt="feather")

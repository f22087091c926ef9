"""BPE merge-training: exact equality with a pure-Python reference
implementation of the classic algorithm, plus segmentation invariants."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
)
from s3_sqs_data_ingestion_demo_spark.operators.text import BPE_ISH_PATTERN

CORPUS = [
    (1, "the low lower lowest of the low"),
    (2, "new newer newest news"),
    (3, "the newer the better the lower"),
    (4, "low low low low low"),
    (5, ""),
    (6, "a b c 123 x-y!"),
]


def _py_pretokens(text):
    return re.findall(BPE_ISH_PATTERN, text.lower())


def _py_bpe(corpus, num_merges):
    wf = Counter()
    for _, text in corpus:
        for w in _py_pretokens(text):
            wf[tuple(w)] += 1
    wf = {k: v for k, v in wf.items() if len(k) >= 2}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, f in wf.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        new = Counter()
        for syms, f in wf.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new[tuple(out)] += f
        wf = dict(new)
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bpe_train_matches_reference(spark, corpus_df):
    got = bpe_train(corpus_df, num_merges=10)
    want = _py_bpe(CORPUS, 10)
    assert got == want
    # sanity on the domain: "low" appears a lot -> (l, o) merges early
    assert ("l", "o") in [(l, r) for l, r, _ in got[:3]]


def test_bpe_train_early_stop(spark):
    # single-char words only: no adjacent pairs, zero merges
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert bpe_train(df, num_merges=5) == []


def test_bpe_segment_preserves_text(spark, corpus_df):
    merges = bpe_train(corpus_df, num_merges=6)
    seg = bpe_segment(corpus_df, merges).collect()
    by_id = {r["doc_id"]: r for r in seg}
    assert set(by_id) == {i for i, _ in CORPUS}
    for doc_id, text in CORPUS:
        row = by_id[doc_id]
        # concatenating the BPE tokens reconstructs the pre-tokens
        assert "".join(row["bpe_tokens"]) == "".join(_py_pretokens(text))
        assert row["n_bpe_tokens"] == len(row["bpe_tokens"])
    # merges actually compress: fewer tokens than characters
    longest = by_id[1]
    assert 0 < longest["n_bpe_tokens"] < len(
        "".join(_py_pretokens("the low lower lowest of the low"))
    )


def test_bpe_segment_word_order(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ab")], "doc_id long, text string"
    )
    merges = [("a", "b", 2), ("c", "d", 1)]
    row = bpe_segment(df, merges).collect()[0]
    assert row["bpe_tokens"] == ["ab", "cd", "ab"]


def test_bpe_no_python_udfs(spark, corpus_df):
    """The segmentation plan must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    merges = [("t", "h", 1)]
    df = bpe_segment(corpus_df, merges)
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in tree


def test_merge_fold_quote_safe_symbols(spark):
    """Symbols containing quotes/backslashes must survive the merge
    fold — the fold is built with the DSL, not SQL interpolation, so
    parser modes like escapedStringLiterals can't break it."""
    df = spark.createDataFrame([(1, ["'", "\\", "'", "x"])], "id long, syms array<string>")
    prev = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        from s3_sqs_data_ingestion_demo_spark.operators.bpe import _merge_fold
        out = df.withColumn("syms", _merge_fold("syms", "'", "\\")).collect()[0]
        assert out["syms"] == ["'\\", "'", "x"]
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", prev)


def test_bpe_train_cached_memoizes(spark, corpus_df):
    from s3_sqs_data_ingestion_demo_spark.operators.bpe import (
        _BPE_MEMO, bpe_train, bpe_train_cached, clear_bpe_memo,
    )

    clear_bpe_memo()
    m1 = bpe_train_cached(corpus_df, num_merges=3)
    assert m1 == bpe_train(corpus_df, num_merges=3)
    assert len(_BPE_MEMO) == 1
    m2 = bpe_train_cached(corpus_df, num_merges=3)
    assert m2 is m1  # memo hit, no retrain
    clear_bpe_memo()


def test_tokenizer_fertility_counts(spark):
    from s3_sqs_data_ingestion_demo_spark.operators.bpe import (
        tokenizer_fertility,
    )

    df = spark.createDataFrame(
        [(1, "aa aa b", "en"), (2, "aa", "de")],
        "doc_id long, text string, lang string",
    )
    # merge (a,a): "aa" -> 1 token, "b" -> 1 token
    rows = {r.lang: r for r in tokenizer_fertility(df, [("a", "a", 3)]).collect()}
    en, de = rows["en"], rows["de"]
    assert (en.n_words, en.n_bpe_tokens) == (3, 3)
    assert en.fertility_ppm == 1_000_000
    assert en.chars_per_token_ppm == (5 * 1_000_000) // 3  # chars aa,aa,b
    assert (de.n_words, de.n_bpe_tokens, de.fertility_ppm) == (1, 1, 1_000_000)
    assert de.chars_per_token_ppm == 2_000_000

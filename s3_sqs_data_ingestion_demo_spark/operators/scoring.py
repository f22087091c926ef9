"""Language-model-style quality scoring for training-data pipelines.

The standard corpus-quality filter (CCNet and successors) scores each
document by the perplexity of a small LM and buckets the corpus into
quality tiers.  The distributed shape of that operator — train a model
summary with one aggregation over the corpus, join the per-token
scores back, reduce per document — is what this module implements,
with a unigram LM standing in for the external KenLM-style model so
the whole operator stays deterministic, engine-portable, and exactly
oracle-checkable (a real deployment swaps the frequency table for its
model's scores; the dataflow is identical).

Scale shape: one explode + token aggregate builds the frequency table
(vocabulary-sized, NOT corpus-sized); scoring joins tokens to that
table by token key and reduces per doc — two shuffles total.  With
``top_k_vocab`` set (the 100 TB configuration), the model is capped to
the K most frequent tokens plus a single OOV bucket holding the
residual probability mass, and the K-row table is EXPLICITLY broadcast
— the join side is bounded by construction, so the scoring pass never
shuffles the corpus on a skewed, unbounded vocabulary key.

Determinism: per-token NLL is quantized to integer micronats
(round(-ln(p)·1e6)) before aggregation, so the per-document reduction
is an EXACT integer sum — immune to floating summation order, which
differs between Spark's partial aggregation and any oracle engine.
The only float ops left (one division, one round) are on exact
integers, bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

_MICRO = 1_000_000.0


def unigram_nll_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k_vocab: int | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's
    own unigram distribution, plus an integer quality bucket.

    ``top_k_vocab=None``: full MLE vocabulary (every scored token is
    in the table by construction — no smoothing needed).  Small-corpus
    / exploratory mode.

    ``top_k_vocab=K``: the production configuration — the model keeps
    the K most frequent tokens (ties broken by token, deterministic)
    and collapses everything else into one OOV bucket whose count is
    the total residual mass, so probabilities still sum to 1.  The
    K-row vocab is explicitly ``broadcast()``: at web scale the full
    vocabulary is unbounded and Zipf-skewed — exactly what must never
    become a shuffle key.

    Returns (doc_id, n_tokens, avg_nll, nll_bucket): low buckets =
    typical text, high buckets = rare-token-heavy documents — the
    pseudo-perplexity signal quality filters threshold on.  Documents
    with zero tokens have no likelihood and are omitted, matching the
    oracle's inner explode.

    avg_nll = round(sum(micronats)/n/1e6, 4) where micronats are the
    per-token quantized NLLs — see the module docstring for why this
    is exactly engine-portable.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))

    if top_k_vocab is None:
        joined = toks.join(freq, "tok").crossJoin(F.broadcast(total))
        c_eff = F.col("c")
    else:
        # deterministic top-K (count desc, token asc) — planned as
        # TakeOrderedAndProject, never a full vocab sort
        vocab = freq.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(
            top_k_vocab
        )
        in_vocab = vocab.agg(F.sum("c").alias("n_in_vocab"))
        joined = (
            toks.join(F.broadcast(vocab), "tok", "left")
            .crossJoin(F.broadcast(total))
            .crossJoin(F.broadcast(in_vocab))
        )
        # OOV tokens share the single residual-mass bucket
        c_eff = F.coalesce(F.col("c"), F.col("n_total") - F.col("n_in_vocab"))

    nll_micro = F.round(-F.log(c_eff / F.col("n_total")) * F.lit(_MICRO)).cast(
        "long"
    )
    avg = F.round(
        F.sum(nll_micro).cast("double") / F.count(F.lit(1)) / F.lit(_MICRO), 4
    ) + F.lit(0.0)
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            avg.alias("avg_nll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "avg_nll",
            F.floor("avg_nll").cast("int").alias("nll_bucket"),
        )
    )


def bigram_nll_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram-LM pseudo-perplexity: per-document mean NLL
    under p(w2|w1) = λ·c(w1,w2)/c(w1·) + (1−λ)·c(w2)/N — one step up
    the n-gram ladder from ``unigram_nll_scores``, same train-by-agg /
    score-by-join dataflow a KenLM-backed filter runs.

    Bigrams are built JVM-side from the token array (``arrays_zip`` of
    two slices — no extra shuffle to form pairs); the model tables are
    the bigram-count aggregate and its prefix marginal.  Documents
    with fewer than two tokens have no bigrams and are omitted.

    λ must be an exact binary fraction (default 3/4) and NLLs are
    quantized to integer micronats, so the aggregation is exactly
    engine-portable (same discipline as the unigram scorer).

    Returns (doc_id, n_bigrams, avg_nll, nll_bucket).
    """
    toks = tokens(text_col)
    n_t = F.size(toks)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"), n_t.alias("_n"))
    bi = (
        base.filter(F.col("_n") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, F.col("_n") - 1).alias("w1"),
                    F.slice("_t", 2, F.col("_n") - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    # model tables: bigram counts, prefix marginals, unigram counts, N
    cb = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    c1 = cb.groupBy("w1").agg(F.sum("cb").alias("c1"))
    uni = df.select(F.explode(tokens(text_col)).alias("w2")).groupBy("w2").agg(
        F.count(F.lit(1)).alias("cu")
    )
    n_total = uni.agg(F.sum("cu").alias("n_total"))
    p = (
        F.lit(lam) * (F.col("cb") / F.col("c1"))
        + F.lit(1.0 - lam) * (F.col("cu") / F.col("n_total"))
    )
    nll_micro = F.round(-F.log(p) * F.lit(_MICRO)).cast("long")
    avg = F.round(
        F.sum(nll_micro).cast("double") / F.count(F.lit(1)) / F.lit(_MICRO), 4
    ) + F.lit(0.0)
    return (
        bi.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(n_total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            avg.alias("avg_nll"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "avg_nll",
            F.floor("avg_nll").cast("int").alias("nll_bucket"),
        )
    )

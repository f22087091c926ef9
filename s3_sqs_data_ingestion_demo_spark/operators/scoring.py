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
table by token key and reduces per doc — two shuffles total.  At
100 TB you would cap the vocabulary to top-K + an OOV bucket and
broadcast it; here the join is left to AQE, which broadcasts the
vocab side when it is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def unigram_nll_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's
    own unigram distribution (MLE — every scored token appears in the
    table by construction, so no smoothing is needed), plus an integer
    quality bucket.

    Returns (doc_id, n_tokens, avg_nll, nll_bucket): low buckets =
    typical text, high buckets = rare-token-heavy documents — the
    pseudo-perplexity signal quality filters threshold on.  Documents
    with zero tokens have no likelihood and are omitted, matching the
    oracle's inner explode.

    Determinism: the bucket floors the ROUNDED avg (round-to-4dp
    first absorbs any last-ulp libm difference in ln()/avg between
    engines).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    nll = -F.log(F.col("c") / F.col("n_total"))
    avg_r = F.round(F.avg(nll), 4) + F.lit(0.0)
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            avg_r.alias("avg_nll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "avg_nll",
            F.floor("avg_nll").cast("int").alias("nll_bucket"),
        )
    )

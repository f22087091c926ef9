"""Full-text relevance scoring: BM25 keyword search and TF-IDF terms.

The reference's query surface is whatever Spark SQL its
``transform_query`` hook accepts (reference: spark-job/job.json:19);
a corpus engine additionally needs retrieval-shaped scoring over the
document table — the "find the docs most relevant to these terms"
primitive used for targeted corpus audits, seed-set expansion, and
quality-by-topic slicing at training-data scale.

Cross-engine exactness: BM25's term-frequency saturation is a rational
function of integers once ``k1`` and ``b`` are fixed binary fractions
(k1 = 5/4, b = 3/4), so the per-(doc, term) score is computed as an
EXACT integer: the only transcendental, ``ln`` in the idf, is
quantized to integer micro-nats once per query term (a handful of
values), then ``(idf_u * num) div den`` is pure BIGINT arithmetic —
no float-summation-order or ulp sensitivity anywhere (same recipe as
the unigram-LM micronat scores in operators/scoring.py).

Scale design (100 TB):
- the term ``isin`` filter prunes the exploded token stream BEFORE the
  (doc, term) shuffle — only rows matching the handful of query terms
  shuffle;
- document lengths come from a projection of the base table (no
  explode), the corpus stats (N, total length) from one 1-row
  aggregate broadcast to all partitions;
- per-term document frequencies form a ≤|terms|-row table, joined by
  broadcast;
- the final top-k is a TakeOrderedAndProject (per-partition heaps +
  driver merge), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

# BM25 constants as exact binary fractions: k1 = K1_NUM/16, b = B_NUM/16.
# With these, tfpart = tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)
# scales to integers when multiplied through by 16*total_dl:
#   num = (16 + K1_NUM) * tf * total_dl
#   den = 16*tf*total_dl + K1_NUM*(16-B_NUM)//16*total_dl + K1_NUM*B_NUM//16*dl*N
# (with K1_NUM=20, B_NUM=12: num = 36*tf*total_dl,
#  den = 16*tf*total_dl + 5*total_dl + 15*dl*N — all BIGINT-exact).
IDF_SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    *,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25(k1=1.25, b=0.75) for ``query_terms``.

    Returns (doc_id, n_hit_terms, score_u) where ``score_u`` is the
    exact integer micro-nat score; ties broken by ``doc_id`` so the
    selected set is deterministic.
    """
    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks).alias("dl"), toks.alias("tk")
    )

    # corpus stats: 1 row, broadcast-joined onto everything downstream
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    # (doc, term) term frequencies — the isin filter runs inside the
    # generator, so only query-term hits reach the shuffle
    tf = (
        base.select("doc_id", "dl", F.explode("tk").alias("term"))
        .filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    return bm25_score_tf(tf, stats, k)


def bm25_score_tf(tf: DataFrame, stats: DataFrame, k: int) -> DataFrame:
    """BM25 scoring from a prepared (doc_id, dl, term, tf) relation
    plus a 1-row (n_docs, total_dl) stats relation — shared by the
    ad-hoc ``bm25_topk`` and the persisted-index query path
    (search_index.py), so both produce identical integer scores."""
    # per-term document frequency (≤ |query_terms| rows) + micronat idf
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats.select("n_docs"))).select(
        "term",
        F.floor(
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(IDF_SCALE)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("idf_u"),
    )

    # integer floor-division keeps the score exact cross-engine
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "CAST(idf_u * (36 * tf * total_dl) DIV "
                "(16 * tf * total_dl + 5 * total_dl + 15 * dl * n_docs) AS BIGINT)"
            ).alias("term_score_u"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("term_score_u").alias("score_u"),
        )
        .orderBy(F.col("score_u").desc(), F.col("doc_id"))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    top_n: int = 3,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``top_n`` terms by exact-integer TF-IDF.

    tfidf_u = tf * floor(ln(N / df) * 1e6 + 0.5) — the idf quantized
    to micro-nats per term, the product exact BIGINT.  Ties break on
    the term string, so the selected set is deterministic.

    Scale: one explode shuffle keyed (doc, term); the document-
    frequency aggregate is vocabulary-sized and re-joined on ``term``
    (a plain shuffle join — the vocabulary of a web corpus does not
    broadcast; AQE picks the strategy at runtime).  The per-document
    top-n is a bounded window over each document's own terms.
    """
    toks = tokens(text_col)
    base = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    tf = base.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    idf = df_t.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.floor(
            F.log(F.col("n_docs").cast("double") / F.col("df")) * F.lit(IDF_SCALE)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("idf_u"),
    )
    scored = tf.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf_u")).alias("tfidf_u")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_u").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_n)
        .select("doc_id", "term_rank", "term", "tfidf_u")
    )

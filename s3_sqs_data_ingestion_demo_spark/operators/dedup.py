"""Deduplication operators for training-data pipelines.

Exact, shingle-Jaccard near-dup, MinHash-LSH, and embedding-cosine
near-dup — each expressed as shuffle-conscious DataFrame programs:

- exact dedup: one hash-aggregate on the content hash — the minimum
  possible work; at 100 TB this is a single shuffle of (hash, id)
  pairs, never the payloads.
- shingle-Jaccard: explode → co-shingle bucket join → per-pair count.
  The join key (shingle) bounds candidate generation: only documents
  sharing a shingle ever meet, which is the LSH-lite candidate
  strategy.  Frequent-shingle caps keep hot buckets from exploding.
- MinHash-LSH: constant-size signatures (n_hashes × md5) instead of
  full shingle sets, banded so candidates collide on a band key —
  the scale path when shingle sets are large.
- embedding near-dup: delegated to ``similarity.cosine_pairs``.

All hashing uses md5 (deterministic, engine-portable) so every
operator here is oracle-checkable in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text, tokens


def exact_dedup_keys(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical (normalized) content; keep the smallest id as
    the canonical representative.

    Returns (text_hash, n_copies, keeper_id).  Filtering the corpus is
    then a broadcast/semi join against the keepers.
    """
    return (
        df.select(F.md5(normalize_text(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (built-ins only:
    split → sequence → transform → concat_ws)."""
    toks = tokens(col)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    return F.when(k < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def jaccard_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
) -> DataFrame:
    """Candidate pairs by co-shingle join, verified by exact Jaccard.

    Scale levers:
    - candidates only form inside a shingle bucket (join on shingle);
    - shingles appearing in more than ``max_shingle_freq`` docs are
      dropped before the join (stop-shingle cap — they generate
      O(freq²) pairs and carry no signal);
    - the pair aggregation counts common shingles per pair, so the
      shuffle carries (id, id, 1) triples, not shingle text.

    Returns (doc_id_a, doc_id_b, jaccard) with doc_id_a < doc_id_b and
    jaccard >= threshold, rounded to 4 for cross-engine comparison.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq_ok = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") <= max_shingle_freq)
        .select("shingle")
    )
    sh_f = sh.join(freq_ok, "shingle")
    a = sh_f.select(F.col("id").alias("id_a"), "shingle")
    b = sh_f.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").alias("doc_id_a"),
            F.col("id_b").alias("doc_id_b"),
            "jaccard",
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document: for seed s, min over shingles of
    ``md5(s || ':' || shingle)``.  md5 is a portable stand-in for a
    seeded hash family — deterministic across engines, uniform enough
    for LSH banding.

    Output: (id, h0..h{num_hashes-1}).  Signature size is constant, so
    at scale this replaces O(doc_len) shingle sets with O(num_hashes)
    per doc before any join.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("shingle")
    ).distinct()
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature and self-join on (band_idx, band_key).

    Docs agreeing on all rows of any band become a candidate pair —
    the classic LSH S-curve.  The join key is a constant-width string,
    so the shuffle is signature-sized regardless of document size.
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *parts).alias("key"))
        )
    banded = signatures.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col("id").alias("id_a"), "band", "key")
    b = banded.select(F.col("id").alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup: signatures → banded candidates
    → exact-Jaccard verification of candidates only.

    The verification join re-touches only candidate docs' shingle
    sets; at scale that is a tiny fraction of the corpus.
    Returns (doc_id_a, doc_id_b, jaccard >= threshold).
    """
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    cand = minhash_lsh_candidates(sigs, num_hashes, bands)
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_id_a"), F.col("id_b").alias("doc_id_b"), "jaccard")
    )


def dedup_keep_first(
    df: DataFrame, key: Column, id_col: str = "doc_id"
) -> DataFrame:
    """Generic 'keep lowest id per duplicate-group' filter."""
    w = Window.partitionBy(key).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

"""Corpus curation: the training-data pipeline composed end-to-end.

quality filter → exact dedup → near-dup removal → token budget —
each stage is one of this package's operators; the composition is the
standard LLM-data curation recipe, expressed as a single lazy
DataFrame program (one pipeline, no intermediate materialization
except the near-dup candidate pass).

Scale shape: quality scoring is a projection; exact dedup is one
hash-window; near-dup removal reuses the MinHash-LSH pass and demotes
to an id-set anti join — the corpus payloads are only shuffled once
(exact-dedup window).  Near-dup canonicalization offers both standard
policies: greedy drop-the-b-side (default, fully lazy) and exact
connected-component clustering (``cluster_dedup=True``, one doc kept
per transitive duplicate group).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import connected_components, minhash_dedup_pairs
from .text import bpe_ish_token_count, fingerprint, quality_features


@dataclass
class CurationReport:
    n_input: int
    n_after_quality: int
    n_after_exact: int
    n_after_near_dup: int
    total_tokens_kept: int


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.2,
    min_tokens: int = 5,
    near_dup_threshold: float = 0.5,
    cluster_dedup: bool = False,
) -> DataFrame:
    """Return the curated corpus (lazy; no driver data movement —
    except with ``cluster_dedup``, see below).

    Stages:
    1. quality gate: ``quality_score >= min_quality`` and
       ``n_tokens >= min_tokens``;
    2. exact dedup: keep the lowest id per content fingerprint;
    3. near-dup removal: MinHash-LSH pairs at ``near_dup_threshold``,
       then EITHER the greedy policy (default: drop the higher id of
       each pair — keeps any doc that is a local minimum in the pair
       graph) or ``cluster_dedup=True``: connected-component
       clustering keeps exactly ONE doc per duplicate GROUP, the
       transitive-closure policy (A~B, B~C collapse together even
       though A~C never surfaced as a pair).  Clustering runs the
       iterative fixpoint, so it is the one eager sub-step;
    4. annotate the survivors with ``bpe_ish_tokens`` for budgeting.
    """
    scored = quality_features(docs, text_col).filter(
        (F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col))
    exact = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # superset=docs: the near-dup stage indexes the RAW corpus (cached,
    # shared session-wide with the standalone near-dup operators) and
    # semi-joins down to the survivors — the filtered corpus is never
    # re-shingled
    pairs = minhash_dedup_pairs(
        exact, text_col=text_col, id_col=id_col, threshold=near_dup_threshold,
        superset=docs,
    )
    if cluster_dedup:
        cc = connected_components(pairs, "doc_id_a", "doc_id_b")
        losers = cc.filter(F.col("is_canonical") == 0).select(
            F.col("doc_id").alias(id_col)
        )
    else:
        losers = pairs.select(F.col("doc_id_b").alias(id_col)).distinct()
    kept = exact.join(losers, id_col, "left_anti")
    return kept.withColumn("bpe_ish_tokens", bpe_ish_token_count(text_col))


def curate_with_report(
    docs: DataFrame, **kwargs
) -> tuple[DataFrame, CurationReport]:
    """Curate and count every stage in ONE action.

    Per-stage counts ride the final aggregation as ``Observation``
    metrics — observed nodes sit inside the executed plan, so Spark
    collects them during the same job instead of four separate
    corpus scans (what an audit loop at 100 TB cannot afford).
    The returned DataFrame is the plain ``curate_corpus`` output
    recomputed lazily (its plan is identical minus observe nodes).
    """
    from pyspark.sql import Observation  # noqa: PLC0415

    text_col = kwargs.get("text_col", "text")
    id_col = kwargs.get("id_col", "doc_id")
    obs_in, obs_q, obs_x = Observation(), Observation(), Observation()
    scored = (
        quality_features(
            docs.observe(obs_in, F.count(F.lit(1)).alias("n")), text_col
        )
        .filter(
            (F.col("quality_score") >= kwargs.get("min_quality", 0.2))
            & (F.col("n_tokens") >= kwargs.get("min_tokens", 5))
        )
        .observe(obs_q, F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col))
    exact = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .observe(obs_x, F.count(F.lit(1)).alias("n"))
    )
    pairs = minhash_dedup_pairs(
        exact,
        text_col=text_col,
        id_col=id_col,
        threshold=kwargs.get("near_dup_threshold", 0.5),
        superset=docs,
    )
    losers = pairs.select(F.col("doc_id_b").alias(id_col)).distinct()
    kept = exact.join(losers, id_col, "left_anti").withColumn(
        "bpe_ish_tokens", bpe_ish_token_count(text_col)
    )
    final = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("bpe_ish_tokens").alias("tokens"),
    ).first()
    report = CurationReport(
        n_input=int(obs_in.get["n"]),
        n_after_quality=int(obs_q.get["n"]),
        n_after_exact=int(obs_x.get["n"]),
        n_after_near_dup=int(final.n_kept),
        total_tokens_kept=int(final.tokens or 0),
    )
    return curate_corpus(docs, **kwargs), report

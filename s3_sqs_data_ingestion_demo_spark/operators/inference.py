"""Batch model-inference plumbing for training-data pipelines.

The operator shape behind "score every document with a model" (quality
classifiers, reward models, embedding models): stream Arrow batches
through ``mapInPandas``, run a batched model forward per batch, emit
(id, score) rows.  The Spark-side contract — schema, Arrow batch
bounds, executor-memory profile, bucket derivation — is real and
tested; the MODEL is a swap point.

Stub policy (no ML runtime in this container): ``model="hash"`` is a
deterministic stand-in whose "forward pass" maps each text to a
uniform [0, 1) score via the repo's portable salted-md5 construction —
which makes the whole operator exactly oracle-checkable in DuckDB, a
property a real model obviously wouldn't have.  Any other model name
raises ``NotImplementedError`` at the call site (same fail-loud STUB
boundary as operators/multimodal.py).

Scale notes: per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (Arrow streaming),
not partition size; scores shuffle as (id, double) scalars; a real
deployment loads the model once per python worker (module-level
lazy init), exactly where ``_forward`` sits.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_SCHEMA = "doc_id long, model_score double, score_bucket int"

_HASH_BITS = 60
_DENOM = float(1 << _HASH_BITS)


def _forward(texts: pd.Series, salt: str) -> pd.Series:
    """The model swap point: batched text → score forward pass.
    The hash stub mirrors sampling.uniform_hash exactly (md5 of
    "text:salt", first 15 hex digits, / 2^60)."""
    return texts.map(
        lambda s: int(
            hashlib.md5((("" if s is None else s) + ":" + salt).encode()).hexdigest()[
                :15
            ],
            16,
        )
        / _DENOM
    )


def model_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: str = "hash",
    salt: str = "quality-v0",
    n_buckets: int = 10,
) -> DataFrame:
    """Score every row with a batched model pass; returns
    (doc_id, model_score ∈ [0,1), score_bucket ∈ [0, n_buckets)).

    ``model="hash"`` is the deterministic stub (see module docstring);
    real model names fail loudly until a runtime is plugged in.
    """
    if model != "hash":
        raise NotImplementedError(
            f"model {model!r} requires an ML runtime not present in this "
            "environment; the Arrow-batched scoring plumbing is model-agnostic"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            score = _forward(pdf[text_col], salt)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "model_score": score,
                    "score_bucket": (score * n_buckets).astype("int32"),
                }
            )

    # null text scores as empty text (coalesced JVM-side so the python
    # stub and any SQL oracle see the same value)
    src = df.select(
        F.col(id_col).alias(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
    )
    return src.mapInPandas(op, schema=SCORE_SCHEMA)


def score_filter(
    df: DataFrame,
    min_score: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    **score_kwargs,
) -> DataFrame:
    """Corpus filter on the model score (the CCNet-style 'keep the
    top quality tiers' gate): semi-join the corpus against ids whose
    score clears ``min_score`` — scores shuffle as scalars, payloads
    never move."""
    keep = model_score(df, text_col, id_col, **score_kwargs).filter(
        F.col("model_score") >= min_score
    )
    return df.join(keep.select(F.col("doc_id").alias(id_col)), id_col, "left_semi")

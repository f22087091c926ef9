"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct; all heavy per-item work (decode, resize, feature extraction,
frame sampling) runs as Arrow-batched ``mapInPandas`` operators so the
Spark-side contract — schema, partitioning, batch shape — is real and
testable even where codec libraries aren't installed.

Stub policy (this container has no image/audio codecs): the actual
byte→pixels/samples decode is isolated behind ``decode_payload``;
with ``codec="fake"`` it produces a deterministic synthetic decode
(sizeable, content-derived) so the full distributed pipeline is
exercised end-to-end; any real codec name raises ``NotImplementedError``
at the call site, never silently.

Scale notes: payloads never pass through the driver and never join
wide — metadata extraction projects only (id, len, hash) so shuffles
carry scalars, and ``mapInPandas`` streams Arrow batches, bounding
executor memory by batch size, not partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, payload_bytes long, payload_sha256 string, "
    "feature array<float>, decode_ok boolean"
)


def decode_payload(payload: bytes, modality: str, codec: str = "fake") -> list[float]:
    """Decode one media payload into a feature vector.

    ``codec="fake"``: deterministic content-derived 8-dim vector —
    exercises the full pipeline without codec libraries.
    Real codecs are NOT bundled in this environment; naming one fails
    loudly here (STUB boundary, by design).
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} requires image/audio libraries not present in "
            "this environment; the Spark plumbing is codec-agnostic"
        )
    h = hashlib.sha256((modality or "").encode() + (payload or b"")).digest()
    return [b / 255.0 for b in h[:8]]


def attach_payload_stats(df: DataFrame) -> DataFrame:
    """Cheap metadata columns computed JVM-side (no Python): byte
    length and sha256 of the payload.  This is the projection used for
    exact dedup of media — shuffles carry (id, hash), never payloads."""
    return df.withColumn("payload_bytes", F.octet_length("payload").cast("long")).withColumn(
        "payload_sha256", F.sha2(F.col("payload"), 256)
    )


def extract_features(df: DataFrame, codec: str = "fake", batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    ``mapInPandas`` streams batches of (media_id, modality, payload);
    each batch decodes in Python and emits fixed-width feature rows.
    Executor memory is bounded by ``batch_rows`` (set via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` upstream), not by
    partition size — the property that keeps this safe on 100 TB of
    media.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok, lens, hashes = [], [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload) if payload is not None else b""
                lens.append(len(raw))
                hashes.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append(decode_payload(raw, modality, codec))
                    ok.append(True)
                except NotImplementedError:
                    raise
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": lens,
                    "payload_sha256": hashes,
                    "feature": feats,
                    "decode_ok": ok,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def dedup_media_exact(df: DataFrame) -> DataFrame:
    """Exact media dedup on payload hash: (payload_sha256, n_copies,
    keeper_id) — same shape as document exact dedup."""
    return (
        attach_payload_stats(df)
        .groupBy("payload_sha256")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("keeper_id"),
        )
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, codec: str = "fake"
) -> DataFrame:
    """Frame-sampling plumbing for video rows: explodes each video into
    (media_id, frame_ts_ms) rows using metadata duration — the real
    per-frame decode is the same STUB boundary as ``decode_payload``.

    The explode happens JVM-side from metadata (sequence over
    duration), so planning a 10k-frame video costs an array of longs,
    not 10k decode calls, until a downstream operator asks for pixels.
    """
    if codec != "fake":
        raise NotImplementedError("real frame decode requires codec libraries")
    frames = df.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames

"""Multimodal column plumbing: schema, Arrow batch shape, stub
boundary, dedup, frame sampling."""

import pytest

from s3_sqs_data_ingestion_demo_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes1", ("image/png", 64, 64, None)),
        (2, "image", b"\x89PNGfakebytes1", ("image/png", 64, 64, None)),  # dup payload
        (3, "audio", b"RIFFfakeaudio", ("audio/wav", None, None, 2500)),
        (4, "video", b"\x00\x00ftypfakevideo", ("video/mp4", 640, 480, 3500)),
        (5, "image", None, ("image/png", 1, 1, None)),  # null payload
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_payload_stats_jvm_side(media):
    out = {r.media_id: r for r in M.attach_payload_stats(media).collect()}
    assert out[1].payload_bytes == len(b"\x89PNGfakebytes1")
    assert out[1].payload_sha256 == out[2].payload_sha256
    assert out[3].payload_sha256 != out[1].payload_sha256


def test_extract_features_deterministic_and_batched(media):
    out = {r.media_id: r for r in M.extract_features(media).collect()}
    assert len(out) == 5
    # deterministic: same payload+modality -> same feature
    assert out[1].feature == out[2].feature
    assert out[1].feature != out[3].feature
    assert all(len(r.feature) == 8 for r in out.values())
    assert all(r.decode_ok for r in out.values())
    assert out[5].payload_bytes == 0  # null payload handled


def test_real_codec_fails_loudly(media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, codec="libjpeg").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_dedup_media_exact(media):
    rows = {r.payload_sha256: r for r in M.dedup_media_exact(media).collect()}
    dup = [r for r in rows.values() if r.n_copies == 2]
    assert len(dup) == 1 and dup[0].keeper_id == 1


def test_sample_video_frames(media):
    frames = M.sample_video_frames(media, every_ms=1000).collect()
    ts = sorted(r.frame_ts_ms for r in frames)
    assert ts == [0, 1000, 2000, 3000]  # 3500ms video @ 1s cadence
    assert all(r.media_id == 4 for r in frames)

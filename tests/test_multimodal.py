"""Multimodal plumbing tests: binary columns + Arrow-batched stub decode."""

import pytest

from gcp_datalake_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image/fake", mm.make_fake_image(640, 480)),
        (2, "image/fake", mm.make_fake_image(1920, 1080, 4)),
        (3, "image/fake", None),
        (4, "application/octet-stream", b"\x00\x01garbage"),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2).cache()


def test_image_metadata(spark, media):
    meta = {r["media_id"]: r for r in mm.image_metadata(media).collect()}
    assert meta[1]["width"] == 640 and meta[1]["height"] == 480
    assert meta[1]["channels"] == 3 and meta[1]["decode_ok"]
    assert meta[2]["width"] == 1920 and meta[2]["channels"] == 4
    assert meta[3]["decode_ok"] is False and meta[3]["n_bytes"] is None
    assert meta[4]["decode_ok"] is False and meta[4]["n_bytes"] == 9


def test_image_features_shape_and_determinism(spark, media):
    f1 = {r["media_id"]: r["features"] for r in mm.image_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in mm.image_features(media).collect()}
    assert f1 == f2
    assert len(f1[1]) == mm.FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in f1[1])
    assert f1[3] is None and f1[4] is None


def test_resize_images(spark, media):
    ok = media.filter("media_id in (1, 2, 3)")
    resized = {
        r["media_id"]: r["content"]
        for r in mm.resize_images(ok, max_dim=960).collect()
    }
    assert resized[1].startswith(b"IMG|640|480|3|")  # under limit: unchanged
    assert resized[2].startswith(b"IMG|960|540|4|")  # 1920x1080 -> 960x540
    assert resized[3] is None


def test_resize_images_mixed_corpus_survives(spark):
    """Real-format rows (JPEG magic bytes, with no codec installed) must
    pass through unchanged with decode_ok=false — never kill the job."""
    jpeg_bytes = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + bytes(32)
    rows = [
        (1, "image/fake", mm.make_fake_image(1920, 1080)),
        (2, "image/jpeg", jpeg_bytes),
        (3, "image/fake", None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.resize_images(media, 960).collect()}
    assert out[1]["decode_ok"] and out[1]["content"].startswith(b"IMG|960|540|")
    assert out[2]["decode_ok"] is False
    assert out[2]["content"] == jpeg_bytes  # passed through, not destroyed
    assert out[3]["decode_ok"] is False and out[3]["content"] is None


def test_frame_sample_plan(spark, media):
    plan = mm.frame_sample_plan(media.filter("media_id = 1"), every_n=10)
    frames = [r["frame_index"] for r in plan.collect()]
    assert frames == sorted(frames)
    assert all(f % 10 == 0 for f in frames)


def test_audio_metadata(spark):
    rows = [
        (10, "audio/fake", mm.make_fake_audio(16000, 48000)),
        (11, "audio/fake", mm.make_fake_audio(44100, 441000)),
        (12, "audio/fake", None),
        (13, "audio/fake", b"not audio"),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in mm.audio_metadata(media).collect()}
    assert meta[10]["sample_rate"] == 16000
    assert meta[10]["duration_s"] == 3.0
    assert meta[11]["duration_s"] == 10.0
    assert meta[12]["decode_ok"] is False
    assert meta[13]["decode_ok"] is False

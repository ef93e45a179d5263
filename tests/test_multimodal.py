"""Multimodal plumbing: binary columns + metadata, mapInPandas feature
extraction (stubbed codec), relational metadata analytics, frame
sampling fanout."""

from __future__ import annotations

import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_stub,
    extract_features,
    media_stats,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "png", b"\x89PNG-fake-bytes", (64, 64, None, 15)),
        (2, "image", "jpg", b"\xff\xd8-fake", (32, 32, None, 7)),
        (3, "audio", "wav", b"RIFF-fake-audio", (None, None, 2.5, 15)),
        (4, "video", "mp4", b"ftyp-fake-video", (640, 480, 1.0, 15)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", "image")


def test_decode_stub_deterministic():
    a = decode_stub(b"hello world", "image", fake=True)
    b = decode_stub(b"hello world", "image", fake=True)
    assert a == b and len(a) == FEATURE_DIM
    assert abs(sum(a) - 1.0) < 1e-9


def test_extract_features_mapinpandas(media):
    feats = {r.media_id: r.features for r in extract_features(media).collect()}
    assert len(feats) == 4
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    assert feats[1] != feats[2]  # different bytes → different features


def test_media_stats_relational(media):
    stats = {r.modality: r for r in media_stats(media).collect()}
    assert stats["image"].n == 2 and stats["image"].total_bytes == 22
    assert stats["audio"].avg_duration_s == 2.5


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_n=2).collect()
    # 1.0s × 24fps = 24 frames, every 2nd → indices 0,2,...,22
    assert [r.frame_idx for r in frames] == list(range(0, 24, 2))
    assert all(r.media_id == 4 for r in frames)


def test_resize_images_updates_metadata_and_batches(spark, media):
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.binary_ops import (
        resize_images,
        resize_stub,
    )

    out = resize_images(media, width=32, height=32).collect()
    n_images = media.filter("modality = 'image'").count()
    assert len(out) == n_images
    for r in out:
        assert r.width == 32 and r.height == 32
        assert r.n_bytes == len(r.content) == 32 * 32 // 64

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        resize_stub(b"abc", 8, 8, fake=False)

"""Multimodal plumbing: schemas, mapInPandas batch shape, decode stub gating."""

from __future__ import annotations

import pytest

from mysql_binlog_spark.multimodal import (
    decode_image_features,
    make_media_df,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_df(spark, n=60)


def test_image_features_deterministic(spark, media):
    a = decode_image_features(media).toPandas().sort_values("media_id")
    b = decode_image_features(media).toPandas().sort_values("media_id")
    assert len(a) == 20  # 60 rows, 1/3 images
    assert (a["payload_sha256"].values == b["payload_sha256"].values).all()
    assert a["features"].map(len).eq(16).all()
    assert a["byte_len"].gt(0).all()


def test_video_frame_sampling(spark, media):
    frames = sample_video_frames(media, every_ms=5000).toPandas()
    assert frames["media_id"].nunique() > 0
    # frame cadence: ts = index * every_ms
    assert (frames["frame_ts_ms"] == frames["frame_index"] * 5000).all()
    assert frames["frame_sha256"].str.len().eq(64).all()


def test_real_decode_is_gated(spark, media):
    with pytest.raises(Exception) as exc_info:
        decode_image_features(media, real_decode=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )

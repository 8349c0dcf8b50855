"""Exact deduplication: hash-groupBy on a content digest.

Scale notes: the groupBy shuffles (digest) pairs only — content never
crosses the wire because md5/sha2 are computed map-side and the winner is
chosen with min_by on the id. At 100 TB this is one shuffle of ~32-byte
keys; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content digest: group size + representative
    (lowest id) — the survivorship rule."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (lowest id) per distinct content digest."""
    w = exact_duplicate_groups(df, text_col, id_col).select("keep_id")
    return df.join(w, df[id_col] == w["keep_id"], "left_semi")

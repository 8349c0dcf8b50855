"""Embedding-cosine near-duplicate detection.

Cosine over `array<double>` columns with built-in higher-order functions
(`zip_with` for the dot product, `aggregate` for the fold) — JVM-side, no
Python. Candidate blocking via random-hyperplane LSH (see
similarity.ann.hyperplane_bucket) keeps it off the quadratic path at scale;
the small-data variant is a plain self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql_binlog_spark.similarity.ann import cosine_expr, hyperplane_bucket


#: hard ceiling for the exact (unblocked) quadratic path — past this the
#: cross join is a scale hazard, not a verification tool
MAX_EXACT_ROWS = 10_000


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    blocked: bool = True,
) -> DataFrame:
    """(id_a < id_b, cosine) pairs with cosine >= threshold.

    blocked=True: LSH sign-bucket join (near-dups almost always share the
    bucket at high thresholds); blocked=False: exact quadratic self-join,
    verification-only — it refuses inputs above ``MAX_EXACT_ROWS`` so a
    user cannot accidentally point an O(n^2) plan at a big table.
    """
    if not blocked:
        n = df.count()
        if n > MAX_EXACT_ROWS:
            raise ValueError(
                f"exact near-dup is O(n^2) and input has {n} rows "
                f"(max {MAX_EXACT_ROWS}); use blocked=True (LSH) at scale"
            )
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if blocked:
        from mysql_binlog_spark.util import spread

        base = spread(base).withColumn(
            "bucket", hyperplane_bucket(F.col("v"), n_planes)
        )
        join_cond = (F.col("a.bucket") == F.col("b.bucket")) & (
            F.col("a.id") < F.col("b.id")
        )
    else:
        join_cond = F.col("a.id") < F.col("b.id")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, join_cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

"""Exact n-gram Jaccard similarity pairs via an inverted-index join.

jaccard(A, B) = |A ∩ B| / |A ∪ B| over word-shingle sets. Instead of the
quadratic cross join, explode (doc, shingle) into an inverted index and
count shared shingles per pair — the shuffle is on shingle tokens, and the
pair aggregation is a plain groupBy. Rare-shingle filtering bounds the
blowup from boilerplate shingles (standard df-cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_binlog_spark.functions.text import tokens_expr, word_shingles_from_tokens
from mysql_binlog_spark.util import explode_nonempty, spread


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.3,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """(id_a < id_b, jaccard) for pairs with jaccard >= threshold."""
    # tokens materialized first — see word_shingles_from_tokens' perf contract
    toked = spread(df, id_col).select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("tk")
    )
    sh = explode_nonempty(
        toked, word_shingles_from_tokens(F.col("tk"), k), "shingle", "id"
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))

    # df-cut: drop shingles appearing in too many docs (boilerplate)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sh2 = sh.join(freq.filter(F.col("df") <= max_doc_freq).select("shingle"), "shingle")

    a, b = sh2.alias("a"), sh2.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )

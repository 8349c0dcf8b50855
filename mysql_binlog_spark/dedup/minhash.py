"""MinHash + LSH near-duplicate detection: shingle -> minhash -> band ->
bucket-join.

Design (standard Broder/LSH, e.g. "Mining of Massive Datasets" ch.3):

1. shingle each doc (k-word shingles, distinct);
2. signature[p] = min over shingles s of h_p(s), p = 0..P-1. We use
   h_p(s) = md5(p || ':' || s) compared lexicographically — deterministic,
   engine-independent (the same signatures are computable in ANSI SQL,
   which is how the DuckDB oracle cross-checks this);
3. split the P signature components into B bands of R rows; docs agreeing
   on ALL components of any band are candidates (probability of agreeing
   on a band ~ jaccard^R);
4. candidates are verified with the estimated jaccard = fraction of equal
   signature components (or exact jaccard downstream).

Scale notes: the only shuffle of document payloads is none at all — the
banded self-join shuffles (band_key -> doc_id) pairs; signature computation
is map-side array math over built-in functions. Hot buckets (boilerplate
docs) are bounded by dropping buckets above ``max_bucket_size`` — the
standard guard against quadratic blowup on degenerate content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_binlog_spark.functions.text import tokens_expr, word_shingles_from_tokens
from mysql_binlog_spark.util import spread


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<string>[num_perm]) — md5-based minhash signature.

    Tokens and shingles are each materialized in their own projection so
    every downstream lambda captures a cheap column attribute: HOF lambdas
    re-evaluate captured subtrees per array element, so inlining the
    tokenizer here would re-tokenize each doc O(shingles x num_perm) times.
    """
    toked = spread(df, id_col).select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("tk")
    )
    shingled = toked.select(
        "id", word_shingles_from_tokens(F.col("tk"), k=shingle_k).alias("sh")
    )
    # explode + num_perm min-aggregates instead of per-row
    # array_min(transform(...)): the md5s run inside whole-stage codegen
    # (HOF lambdas are interpreted — ~10x slower for the same hash count),
    # and partial aggregation keeps the shuffle at <=1 row per doc per
    # partition. Docs with no shingles (len < k tokens) drop out here.
    ex = shingled.select("id", F.explode("sh").alias("s"))
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{p}:"), F.col("s")))).alias(f"mh{p}")
        for p in range(num_perm)
    ]
    agg = ex.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[f"mh{p}" for p in range(num_perm)]).alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing at least one full LSH band."""
    rows = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # guard against degenerate hot buckets (quadratic pair blowup):
    # aggregate bucket sizes, keep only pairable, non-degenerate buckets
    bucket_sizes = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    small = bucket_sizes.filter(
        (F.col("n") > 1) & (F.col("n") <= max_bucket_size)
    ).select("band", "key")
    b2 = banded.join(small, ["band", "key"])  # only buckets that can pair
    a = b2.alias("a")
    b = b2.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with estimated jaccard >= threshold.

    est_jaccard = fraction of equal minhash components (unbiased estimator
    of the true shingle-set jaccard).
    """
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k)
    cands = lsh_candidate_pairs(sigs, num_perm, bands)
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    joined = cands.join(sa, "id_a").join(sb, "id_b")
    eq = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    est = (eq / F.lit(float(num_perm))).alias("est_jaccard")
    return (
        joined.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )

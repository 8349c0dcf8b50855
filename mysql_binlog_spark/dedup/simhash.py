"""SimHash near-duplicate detection (Charikar 2002 / Manku et al. WWW'07).

simhash64(doc) = the 64-bit vector whose bit i is 1 iff the sum over tokens
of sign(bit i of hash(token)) is positive. Near-duplicates have small
Hamming distance between simhashes.

Implemented as pure built-in expressions:
- per-token 64-bit hash: xxhash64 (JVM-side);
- per-bit +/-1 contributions folded with `aggregate` over the token array
  and a 64-slot int array accumulator;
- candidate generation: split the 64 bits into 4 x 16-bit chunks; docs
  sharing any chunk are candidates (guarantees recall for Hamming
  distance <= 3 — the Manku pigeonhole trick), then verify with exact
  Hamming distance via bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql_binlog_spark.functions.text import tokens_expr
from mysql_binlog_spark.util import spread


def token_hashes(text: Column | str, weighted: bool = True) -> Column:
    """array<long> of per-token xxhash64 values (materialize this column
    BEFORE simhash_from_hashes so the hashes are computed once per row)."""
    toks = tokens_expr(text)
    units = toks if weighted else F.array_distinct(toks)
    return F.transform(units, lambda t: F.xxhash64(t))


def simhash_from_hashes(hashes: Column) -> Column:
    """Fold an array<long> of token hashes into the 64-bit simhash.

    Statically unrolled over the 64 bit positions (shift amounts must be
    literals for whole-stage codegen); each position is one `aggregate`
    over the hash array counting +1/-1 bit votes.
    """
    out = F.lit(0).cast("long")
    n = F.size(hashes)

    # NB: capture the bit index via a closure factory, NOT a default arg —
    # pyspark introspects lambda arity, and a 3-param lambda would get the
    # extra param bound as a lambda variable Column.
    def bit_votes(i: int):
        return lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(
            F.lit(1)
        ).cast("int")

    for i in range(64):
        ones = F.aggregate(hashes, F.lit(0), bit_votes(i))
        # bit votes: ones - (n - ones) > 0  <=>  2*ones > n
        bit = F.when(
            (ones * 2) > n, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(bit)
    return out


def simhash64(text: Column | str, weighted: bool = True) -> Column:
    """64-bit simhash of the document's tokens (term-frequency weighted).

    Convenience composition; in DataFrame pipelines prefer materializing
    ``token_hashes`` in a select first, then ``simhash_from_hashes`` —
    otherwise the tokenization subtree is inlined 64 times.
    """
    return simhash_from_hashes(token_hashes(text, weighted))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(id_a < id_b, hamming) pairs with simhash Hamming distance <= k.

    Blocking: 4 x 16-bit chunks — any pair within Hamming distance 3 shares
    at least one intact chunk (pigeonhole), so recall is exact for k <= 3.
    """
    hashed = spread(df, id_col).select(
        F.col(id_col).alias("id"), token_hashes(text_col).alias("hs")
    )
    sh = hashed.select("id", simhash_from_hashes(F.col("hs")).alias("sh"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("sh", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
            for c in range(4)
        ]
    )
    blocked = sh.select("id", "sh", F.explode(chunks).alias("ck")).select(
        "id", "sh", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    sizes = blocked.groupBy("chunk", "key").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket_size)).select(
        "chunk", "key"
    )
    b2 = blocked.join(ok, ["chunk", "key"])
    a, b = b2.alias("a"), b2.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

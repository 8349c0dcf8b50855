"""SimHash near-duplicate detection (Charikar 2002 / Manku et al. WWW'07).

simhash64(doc) = the 64-bit vector whose bit i is 1 iff the sum over tokens
of sign(bit i of hash(token)) is positive. Near-duplicates have small
Hamming distance between simhashes.

Two implementations:

- **portable halves (the default pair finder)**: per-token hash = two
  32-bit words from md5(token); the 64 bit-vote sums run as explode +
  codegen'd SUM aggregates (one shuffle, <=1 row per doc per partition
  after partial agg) instead of 64 interpreted `aggregate` HOF folds —
  faster AND reproducible in ANSI SQL ('0x'||substr(md5..) -> BIGINT),
  which is how the DuckDB oracle cross-checks the full pipeline. The
  sketch lives as (sh_hi, sh_lo) int64 halves so no engine touches the
  sign bit of a single 64-bit value.
- **xxhash64 + HOF fold** (``simhash64``): JVM-hash variant kept for
  API compatibility and as the cheapest single-column sketch.

Candidate generation (both): split the 64 bits into 4 x 16-bit chunks;
docs sharing any chunk are candidates (guarantees recall for Hamming
distance <= 3 — the Manku pigeonhole trick), then verify with exact
Hamming distance via bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql_binlog_spark.functions.text import tokens_expr
from mysql_binlog_spark.util import explode_nonempty, spread


#: radix packing of the bit-vote sums: each SUM aggregate accumulates 4
#: bit-counts in one long using 15-bit lanes (shifts 0/15/30/45). 15-bit
#: lanes keep the TOP lane's total (n << 45) inside signed int64 for up
#: to n = 32767 weighted tokens per doc — far beyond the corpus bound;
#: 16-bit lanes would overflow the sign bit at n > 32767 anyway. This
#: cuts the round-2 65-aggregate sketch (the dedup_simhash regression)
#: to 17 aggregates: narrower partial-agg rows in the shuffle AND fewer
#: codegen'd update expressions.
_LANES = 4
_LANE_BITS = 15
_LANE_MASK = (1 << _LANE_BITS) - 1
_GROUPS = 32 // _LANES  # per 32-bit half

SIMHASH_MAX_TOKENS = _LANE_MASK  # per-doc weighted-token bound


def simhash_halves(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weighted: bool = True,
) -> DataFrame:
    """(id, sh_hi, sh_lo) — the portable simhash as two int32-range longs.

    Explode tokens -> one md5 per token -> 17 radix-packed SUM aggregates
    (4 bit-votes per long, whole-stage codegen; map-side partial agg
    bounds the shuffle to one narrow row per doc per partition). Docs
    with zero tokens drop out (no sketch to compare); docs beyond
    ``SIMHASH_MAX_TOKENS`` weighted tokens would overflow a vote lane —
    use variant='xxhash' for such corpora.
    """
    toked = spread(df, id_col).select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("tk")
    )
    units = F.col("tk") if weighted else F.array_distinct(F.col("tk"))
    ex = explode_nonempty(toked, units, "tok", "id")
    # ONE md5 per token (minhash precedent): the digest lands in its own
    # projection and both halves derive from it. CollapseProject keeps
    # the two-step shape because md5 is non-cheap and referenced twice —
    # inlining would duplicate it (the round-2/3 "2x md5 per token").
    hx = ex.select("id", F.md5("tok").alias("h")).select(
        "id",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("h", 9, 8), 16, 10).cast("long").alias("lo"),
    )

    def packed(col: str, g: int):
        expr = None
        for j in range(_LANES):
            bit = g * _LANES + j
            t = F.shiftleft(
                F.shiftright(F.col(col), bit).bitwiseAND(F.lit(1)).cast("long"),
                _LANE_BITS * j,
            )
            expr = t if expr is None else expr + t
        return F.sum(expr)

    aggs = [F.count(F.lit(1)).alias("n")]
    for g in range(_GROUPS):
        aggs.append(packed("lo", g).alias(f"go{g}"))
        aggs.append(packed("hi", g).alias(f"gp{g}"))
    agg = hx.groupBy("id").agg(*aggs)

    def assemble(prefix: str):
        expr = F.lit(0).cast("long")
        for g in range(_GROUPS):
            for j in range(_LANES):
                bit = g * _LANES + j
                ones = F.shiftright(F.col(f"{prefix}{g}"), _LANE_BITS * j).bitwiseAND(
                    F.lit(_LANE_MASK)
                )
                expr = expr + F.when(
                    ones * 2 > F.col("n"), F.lit(1 << bit).cast("long")
                ).otherwise(F.lit(0).cast("long"))
        return expr

    # the documented lane bound, ENFORCED: a doc beyond it would silently
    # corrupt every vote above the overflowing lane, so fail the job
    # loudly instead (adds +0 to the sketch on the happy path — stays
    # inside codegen; n is already aggregated, no extra pass)
    overflow_guard = F.when(
        F.col("n") > F.lit(SIMHASH_MAX_TOKENS),
        F.raise_error(
            F.concat(
                F.lit("simhash vote-lane overflow: doc "),
                F.col("id").cast("string"),
                F.lit(
                    f" has > {SIMHASH_MAX_TOKENS} weighted tokens; "
                    "use variant='xxhash' for such corpora"
                ),
            )
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return agg.select(
        "id",
        (assemble("gp") + overflow_guard).alias("sh_hi"),
        assemble("go").alias("sh_lo"),
    )


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


def _chunk_blocked_pairs(
    sketches: DataFrame,
    chunk_exprs: list[Column],
    hamming: Column,
    max_hamming: int,
    max_bucket_size: int,
) -> DataFrame:
    """Shared 16-bit-chunk blocking join: any pair within Hamming
    distance 3 shares at least one intact chunk (pigeonhole), so recall
    is exact for k <= 3. Buckets above ``max_bucket_size`` are dropped
    (degenerate-content quadratic-blowup guard).

    The bucket-size filter is a WINDOW count over (chunk, key), not a
    separate aggregate + semi-join: the window's shuffle IS the
    partitioning the candidate self-join needs, so the whole blocking
    phase costs ONE exchange of the (tiny) sketch rows instead of three
    (agg + both join sides) — measured −35% wall on the sf0.1 bench,
    interleaved A/B. The window buffers one (chunk, key) bucket per
    group, exactly the rows the join would buffer anyway; oversized
    degenerate buckets are dropped by the cap right after counting."""
    from pyspark.sql.window import Window

    chunks = F.array(
        *[
            F.struct(F.lit(c).alias("chunk"), e.alias("key"))
            for c, e in enumerate(chunk_exprs)
        ]
    )
    blocked = sketches.select("*", F.explode(chunks).alias("ck")).select(
        "*", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    ).drop("ck")
    w = Window.partitionBy("chunk", "key")
    b2 = (
        blocked.withColumn("n", F.count(F.lit(1)).over(w))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket_size))
        .drop("n")
    )
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
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
    variant: str = "portable",
) -> DataFrame:
    """(id_a < id_b, hamming) pairs with simhash Hamming distance <= k.

    variant='portable' (default): md5-derived halves, oracle-checkable
    and codegen'd; variant='xxhash': the JVM-hash HOF-fold sketch.
    """
    if variant == "portable":
        sh = simhash_halves(df, text_col, id_col)
        chunk_exprs = [
            F.shiftright(F.col("sh_lo"), 0).bitwiseAND(F.lit(0xFFFF)),
            F.shiftright(F.col("sh_lo"), 16).bitwiseAND(F.lit(0xFFFF)),
            F.shiftright(F.col("sh_hi"), 0).bitwiseAND(F.lit(0xFFFF)),
            F.shiftright(F.col("sh_hi"), 16).bitwiseAND(F.lit(0xFFFF)),
        ]
        ham = F.bit_count(
            F.col("a.sh_lo").bitwiseXOR(F.col("b.sh_lo"))
        ) + F.bit_count(F.col("a.sh_hi").bitwiseXOR(F.col("b.sh_hi")))
        return _chunk_blocked_pairs(sh, chunk_exprs, ham, max_hamming, max_bucket_size)
    hashed = spread(df, id_col).select(
        F.col(id_col).alias("id"), token_hashes(text_col).alias("hs")
    )
    sh = hashed.select("id", simhash_from_hashes(F.col("hs")).alias("sh"))
    chunk_exprs = [
        F.shiftright(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF)) for c in range(4)
    ]
    ham = hamming64(F.col("a.sh"), F.col("b.sh"))
    return _chunk_blocked_pairs(sh, chunk_exprs, ham, max_hamming, max_bucket_size)

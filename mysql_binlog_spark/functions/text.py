"""Text-analysis expressions for training-data pipelines.

All pure built-in `pyspark.sql.functions` compositions — JVM-side,
whole-stage-codegen'd, no Python in the data path. Each function returns a
Column so it composes into any DataFrame plan (filter pushdown and column
pruning still apply).

These go beyond the reference's operator set (it has no text analytics) —
they are the document-pipeline layer a 100 TB training-data ingest needs,
applied over the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, fixed stopword list — deterministic and replicable in ANSI SQL
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "be", "this", "that", "are",
]

# crude per-language marker words for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
}


def tokens_expr(text: Column | str) -> Column:
    """Lowercased word tokens: split on non-alphanumeric runs, drop empties."""
    c = F.col(text) if isinstance(text, str) else text
    raw = F.split(F.lower(c), r"[^a-z0-9]+")
    return F.filter(raw, lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace/punct token count (the cheap tokenizer)."""
    return F.size(tokens_expr(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish proxy: counts word pieces + digit runs + punctuation marks —
    a deterministic regex stand-in for a real subword tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens_expr(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0, 1]: length band + low punctuation +
    a healthy stopword ratio (natural-language-ness)."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_ok = F.when(punct_ratio(c) < 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_ratio(c)
    sw_ok = F.when((sw > 0.05) & (sw < 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 4)


def lang_id(text: Column | str) -> Column:
    """Marker-word language heuristic: the language whose marker words hit
    the most tokens wins; ties and zero hits -> 'und' (undetermined)."""
    toks = tokens_expr(text)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def word_shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles (distinct) from an ALREADY-MATERIALIZED tokens column.

    Performance contract: ``toks`` must be a plain column attribute, not an
    expression subtree. Higher-order-function lambdas re-evaluate captured
    subtrees PER ARRAY ELEMENT (no common-subexpression elimination in the
    interpreted HOF path), so shingling over an inline ``tokens_expr(text)``
    re-tokenizes the document k times per shingle — O(len^2) per row.
    Pipelines materialize tokens in their own projection first.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)) - 0)
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    return F.when(n >= k, F.array_distinct(F.transform(idx, shingle))).otherwise(
        F.array()
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles (the MinHash/Jaccard unit), distinct.

    Convenience form; hot paths should tokenize into a column first and use
    ``word_shingles_from_tokens`` (see its performance contract).
    """
    return word_shingles_from_tokens(tokens_expr(text), k)


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the lowercased text."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    ln = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1)))
    return F.when(
        ln >= n, F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n)))
    ).otherwise(F.array())


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive 64-bit content fingerprint: xor-fold of token
    hashes (xxhash64 — the cheapest JVM-side variant; see
    ``doc_fingerprints`` for the engine-portable form)."""
    toks = F.array_distinct(tokens_expr(text))
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc.bitwiseXOR(F.xxhash64(t)),
    )


def doc_fingerprints(df, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, fingerprint) — order-insensitive 64-bit content
    fingerprint as 16 hex chars, xor-folding two md5-derived 32-bit words
    per distinct token.

    Engine-portable by construction (md5 + integer xor are identical in
    ANSI SQL), and the fold runs as a codegen'd ``bit_xor`` aggregate
    after an explode — map-side partial aggregation keeps the shuffle at
    one row per doc per partition. Zero-token docs fingerprint as all
    zeros (left join back from the source).
    """
    from mysql_binlog_spark.util import explode_nonempty

    base = df.select(F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("tk"))
    ex = explode_nonempty(base, F.array_distinct("tk"), "tok", "doc_id")
    hx = ex.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long").alias("lo"),
    )
    agg = hx.groupBy("doc_id").agg(
        F.expr("bit_xor(hi)").alias("fhi"), F.expr("bit_xor(lo)").alias("flo")
    )
    fp = F.concat(
        F.lower(F.lpad(F.hex(F.coalesce(F.col("fhi"), F.lit(0))), 8, "0")),
        F.lower(F.lpad(F.hex(F.coalesce(F.col("flo"), F.lit(0))), 8, "0")),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select("doc_id", fp.alias("fingerprint"))
    )

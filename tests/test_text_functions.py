"""Text-analysis expressions: correctness on known strings, JVM-only plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_binlog_spark.functions.text import (
    bpe_ish_token_count,
    char_ngrams,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "Hello, world! 42", token_count("text")) == 3
    assert _one(spark, "", token_count("text")) == 0


def test_bpe_ish_count(spark):
    # words + digit runs + punctuation marks
    assert _one(spark, "foo bar-42!", bpe_ish_token_count("text")) == 5


def test_punct_and_stopword_ratio(spark):
    assert _one(spark, "abcd!!", punct_ratio("text")) == 2 / 6
    v = _one(spark, "the cat and the dog", stopword_ratio("text"))
    assert abs(v - 3 / 5) < 1e-9


def test_quality_score_range(spark):
    good = "the quick brown fox jumps over the lazy dog " * 3
    bad = "!!! ### $$$ %%%"
    assert _one(spark, good, quality_score("text")) == 1.0
    assert _one(spark, bad, quality_score("text")) < 0.7


def test_lang_id(spark):
    assert _one(spark, "the cat is on the mat and it is happy", lang_id("text")) == "en"
    assert _one(spark, "der Hund und die Katze das ist gut", lang_id("text")) == "de"
    assert _one(spark, "zzz qqq xxx", lang_id("text")) == "und"


def test_word_shingles(spark):
    v = _one(spark, "a b c d", word_shingles("text", 3))
    assert sorted(v) == ["a b c", "b c d"]
    assert _one(spark, "a b", word_shingles("text", 3)) == []


def test_char_ngrams(spark):
    v = _one(spark, "abcd", char_ngrams("text", 3))
    assert sorted(v) == ["abc", "bcd"]


def test_doc_fingerprint_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", doc_fingerprint("text"))
    b = _one(spark, "gamma alpha beta", doc_fingerprint("text"))
    c = _one(spark, "alpha beta delta", doc_fingerprint("text"))
    assert a == b != c


def test_documents_table_end_to_end(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("q"),
        lang_id("text").alias("lang_guess"),
    )
    pdf = out.toPandas()
    assert (pdf["n_tokens"] > 0).all()
    assert pdf["q"].between(0, 1).all()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

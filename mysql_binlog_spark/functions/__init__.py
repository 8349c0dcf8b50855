from mysql_binlog_spark.functions.text import (  # noqa: F401
    tokens_expr,
    token_count,
    char_ngrams,
    word_shingles,
    punct_ratio,
    stopword_ratio,
    quality_score,
    lang_id,
    doc_fingerprint,
)

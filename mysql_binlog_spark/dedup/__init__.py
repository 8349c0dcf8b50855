from mysql_binlog_spark.dedup.exact import exact_dedup, exact_duplicate_groups  # noqa: F401
from mysql_binlog_spark.dedup.minhash import (  # noqa: F401
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
)
from mysql_binlog_spark.dedup.simhash import simhash64, simhash_near_dup_pairs  # noqa: F401
from mysql_binlog_spark.dedup.jaccard import ngram_jaccard_pairs  # noqa: F401
from mysql_binlog_spark.dedup.embedding import embedding_near_dup_pairs  # noqa: F401
from mysql_binlog_spark.dedup.components import (  # noqa: F401
    connected_components,
    duplicate_groups,
)

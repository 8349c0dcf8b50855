from mysql_binlog_spark.similarity.ann import (  # noqa: F401
    cosine_expr,
    brute_force_topk,
    hyperplane_bucket,
    lsh_topk,
    ivf_build_centroids,
    ivf_topk,
)

"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure at least defaultParallelism partitions for compute-heavy
    per-row work.

    A small parquet input arrives as ONE scan partition (file-size based
    splitting), which serializes expression-heavy stages (minhash/simhash)
    on a single core. At real scale inputs are already well-partitioned and
    this is a no-op; the repartition only fires when the scan under-splits.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *cols) if cols else df.repartition(target)
    return df

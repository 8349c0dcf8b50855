"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure at least defaultParallelism partitions for compute-heavy
    per-row work.

    A small parquet input arrives as ONE scan partition (file-size based
    splitting), which serializes expression-heavy stages (minhash/simhash)
    on a single core. At real scale inputs are already well-partitioned
    and the extra repartition is a cheap small shuffle; AQE coalesces it
    back if unneeded. Deliberately avoids ``df.rdd.getNumPartitions()``
    (forcing RDD conversion triggers plan analysis on the hot path and
    defeats Catalyst plan reuse).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, *cols) if cols else df.repartition(target)

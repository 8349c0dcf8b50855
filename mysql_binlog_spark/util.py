"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_nonempty(df: DataFrame, arr: Column, alias: str, *keep: str) -> DataFrame:
    """Explode an EXPRESSION-valued array without the
    InferFiltersFromGenerate trap.

    A plain ``explode(expr)`` makes Catalyst infer ``size(expr) > 0`` and
    push it below the projections with the whole array expression inlined
    — for shingle/token pipelines that inlining re-evaluates the
    tokenizer per array element inside the pushed filter (measured 2.6x
    slowdown of the minhash signature stage at sf0.1). ``explode_outer``
    is skipped by that rule; the null filter on the OUTPUT column cannot
    be pushed below the generate, so the array is computed exactly once
    per row.
    """
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())


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

"""Changelog sources: schema-enforced batch / range / stream readers.

The reference's source layer (SURVEY §2.1 S1-S4) selects binlog files by
time-range before downloading (common/client/cfs.go:365-418) and resumes
from a checkpointed position (backup/mode/remote.go:39-52). The Spark
analogs are predicate pushdown + row-group pruning on ``seq`` — these
helpers keep the pruning predicates in one place so every caller benefits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: canonical changelog schema (input_hint shape + ordering/rename columns)
EVENT_DDL = (
    "seq long, op string, repo string, path string, commit string, "
    "lang string, content string, before_content string, new_path string, "
    "statement string"
)


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Batch read with the canonical schema imposed (additive evolution:
    files written before a column existed surface it as NULL)."""
    return spark.read.schema(EVENT_DDL).parquet(path)


def read_changelog_range(
    spark: SparkSession,
    path: str,
    start_seq: int = -1,
    stop_seq: int | None = None,
) -> DataFrame:
    """Bounded (start, stop] read — the `merge` binary's range semantics
    (merge/handler/merge.go:436-452). The seq predicates reach the parquet
    scan as PushedFilters, so row groups (and at scale, seq-partitioned
    files) outside the range are never read."""
    df = read_changelog(spark, path).filter(F.col("seq") > F.lit(start_seq))
    if stop_seq is not None:
        df = df.filter(F.col("seq") <= F.lit(stop_seq))
    return df


def read_changelog_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Streaming read (the `backup` tail analog): bounded per-trigger file
    intake = the reference's bounded channels (T7 backpressure).

    ``_src_file`` carries the originating file path (from the file
    source's ``_metadata``, which does not survive into foreachBatch
    unless projected here) — the ingest fence uses it to detect
    out-of-order landing per file."""
    from pyspark.sql import functions as F

    return (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
        .withColumn("_src_file", F.col("_metadata").getField("file_path"))
    )

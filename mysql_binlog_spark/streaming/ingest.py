"""Structured-Streaming front end for the CDC ingest.

The reference's `backup` binary tails a live binlog stream with a
10240-event buffer and per-table channel fan-out
(siddontang/go-mysql/replication/binlogstreamer.go:56,
backup/handler/merge.go:458-510). Our analog: ``readStream`` over the
changelog directory (files appear in seq order, the way compacted binlog
files land on shared storage), ``foreachBatch`` running the SAME
collapse + fenced-merge path as the batch engine.

- Backpressure (T7): ``maxFilesPerTrigger`` bounds each micro-batch — the
  analog of the reference's bounded channels.
- Watermarks (T2): not needed — the source is seq-ordered by construction,
  like the reference's single ordered binlog stream; late data cannot
  occur. (For an out-of-order source you would add
  ``withWatermark("event_time", ...)`` before any windowed agg.)
- Exactly-once (T4): Spark's streaming checkpoint gives at-least-once
  foreachBatch invocation; our LakeTable epoch fence turns replayed
  batch ids into no-ops — the same protocol as the batch path, so a crash
  between Spark's checkpoint write and our commit is safe in BOTH orders.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mysql_binlog_spark.lake.table import LakeTable
from mysql_binlog_spark.operators.collapse import collapse_latest, expand_renames
from mysql_binlog_spark.sources.changelog_source import read_changelog_stream


def stream_ingest(
    spark: SparkSession,
    events_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
):
    """Stream changelog files into the lake table; returns the query.

    ``available_now=True`` drains everything currently in the directory and
    stops (bounded run — the `merge` binary analog); False keeps tailing
    (the `backup` binary analog).
    """
    src = read_changelog_stream(spark, events_dir, max_files_per_trigger)

    def apply_batch(batch_df, batch_id: int):
        batch = collapse_latest(expand_renames(batch_df))
        # epoch id = streaming batch id; replays fence out (idempotent)
        table.merge(batch, epoch=int(batch_id))

    writer = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    return q

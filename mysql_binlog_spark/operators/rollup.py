"""Multi-granularity rollup cascade (SURVEY §2.3 P2 / §2.9 T1).

The reference fans every event into four LevelDB granularities
(sec/min/hour/day) and flushes them on cascade timers — a day flush
forces hour/min/sec first (backup/binlog/repl.go:160-183,
backup/handler/merge.go:513-633, 862-917). The product is, per
granularity, the per-key net state of every window with activity.

Spark-first shape: collapse once at the FINEST granularity (the only
shuffle that sees raw events), then derive each coarser level from the
next finer one — the last event of a key in an hour is the last event
among that hour's minute-lasts, so the hour aggregation processes
<= one row per (key, minute), not the raw stream. This is the cascade
flush as dataflow: N granularities cost one full shuffle plus N-1
shuffles over already-collapsed (much smaller) data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY_COLS = ["repo", "path"]

#: cascade order: finest first; each level derives from the previous
GRANULARITIES = ["minute", "hour", "day"]


def cascade_levels(
    events: DataFrame,
    ts_col: str = "ts",
    granularities: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Per-granularity collapsed state: gran -> (wstart, repo, path,
    last: struct(seq, op, content), n_events).

    ``events`` must be normalized row events (expand_renames output) with
    an event-time column. Tombstones (last op 'D') are retained — the
    per-window state includes deletions, exactly like the reference's
    compacted per-granularity binlogs carry delete events.
    """
    grans = granularities or GRANULARITIES
    levels: dict[str, DataFrame] = {}
    finest = grans[0]
    levels[finest] = (
        events.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("wstart"), *KEY_COLS
        )
        .agg(
            F.max_by(F.struct("seq", "op", "content"), F.col("seq")).alias("last"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    for prev, gran in zip(grans, grans[1:]):
        levels[gran] = (
            levels[prev]
            .groupBy(F.date_trunc(gran, F.col("wstart")).alias("wstart"), *KEY_COLS)
            .agg(
                F.max_by(F.col("last"), F.col("last.seq")).alias("last"),
                F.sum("n_events").alias("n_events"),
            )
        )
    return levels


def _content_checksum(content: Column) -> Column:
    """Engine-portable per-row content checksum: first 32 md5 bits as a
    long (summable without overflow at any realistic window size)."""
    return F.coalesce(
        F.conv(F.substring(F.md5(content), 1, 8), 16, 10).cast("long"), F.lit(0)
    )


def cascade_summary(
    events: DataFrame,
    ts_col: str = "ts",
    granularities: list[str] | None = None,
) -> DataFrame:
    """Compact, verifiable digest of the whole cascade: one row per
    (granularity, window) with key/event counts, the high-watermark seq,
    and a checksum over the per-key last contents — any wrong per-key
    winner at any level breaks the checksum."""
    grans = granularities or GRANULARITIES
    levels = cascade_levels(events, ts_col, grans)
    outs = []
    for gran in grans:
        outs.append(
            levels[gran]
            .groupBy("wstart")
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("n_events").alias("n_events"),
                F.max("last.seq").alias("max_seq"),
                F.sum(_content_checksum(F.col("last.content"))).alias("checksum"),
            )
            .select(
                F.lit(gran).alias("gran"),
                F.col("wstart").cast("string").alias("wstart"),
                "n_keys",
                "n_events",
                "max_seq",
                "checksum",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

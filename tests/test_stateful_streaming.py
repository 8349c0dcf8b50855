"""applyInPandasWithState custom stateful operator (SURVEY §2.10 / §2.9
T3): the per-key LWW fold as true streaming state, cross-checked against
the batch collapse and the sequential oracle."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mysql_binlog_spark.changelog import ChangelogSpec
from mysql_binlog_spark.changelog.generator import EVENT_SCHEMA, generate_events_pandas
from mysql_binlog_spark.changelog.oracle import oracle_snapshot_from_pandas
from mysql_binlog_spark.operators.collapse import expand_renames
from mysql_binlog_spark.sources.changelog_source import (
    EVENT_DDL,
    read_changelog_stream,
)
from mysql_binlog_spark.streaming.stateful import stateful_collapse_stream


def test_stateful_stream_collapse_matches_oracle(spark, tmp_path):
    ev = generate_events_pandas(ChangelogSpec(n_events=3000, seed=61, n_repos=8))
    ev_dir = tmp_path / "events"
    os.makedirs(ev_dir)
    # 3 seq-ordered landing files with ascending mtimes (arrival order)
    import time as _t

    n = len(ev)
    t0 = _t.time() - 600
    for i in range(3):
        part = ev.iloc[i * n // 3 : (i + 1) * n // 3]
        p = str(ev_dir / f"part-{i:04d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(part, schema=EVENT_SCHEMA, preserve_index=False), p
        )
        os.utime(p, (t0 + i, t0 + i))

    src = read_changelog_stream(spark, str(ev_dir), max_files_per_trigger=1)
    changefeed = stateful_collapse_stream(expand_renames(src))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # parquet sink requires append; the operator runs in update mode, so
    # route batches through foreachBatch (each batch df is appendable)
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        changefeed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # the changefeed's LAST emission per key == the oracle's final state
    feed = spark.read.schema(
        "repo string, path string, seq long, op string, commit string, "
        "lang string, content string"
    ).parquet(out_dir).toPandas()
    last = (
        feed.sort_values("seq")
        .groupby(["repo", "path"], as_index=False)
        .last()
    )
    got = (
        last[last.op != "D"]
        .drop(columns=["seq", "op"])
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = oracle_snapshot_from_pandas(ev).drop(columns=["content_sha256"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # multiple batches actually ran (state carried across micro-batches)
    assert feed.groupby(["repo", "path"]).size().max() > 1

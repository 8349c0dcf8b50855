"""Structured-Streaming ingest: multi-file changelog drained with
availableNow, final state identical to the batch engine / oracle."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mysql_binlog_spark.changelog import ChangelogSpec
from mysql_binlog_spark.changelog.generator import EVENT_SCHEMA, iter_event_batches
from mysql_binlog_spark.changelog.oracle import oracle_snapshot_from_pandas
from mysql_binlog_spark.engine.pipeline import table_snapshot
from mysql_binlog_spark.lake.table import LakeTable

SNAP_COLS = ["repo", "path", "commit", "lang", "content", "content_sha256"]


def test_stream_ingest_matches_oracle(spark, tmp_path):
    from mysql_binlog_spark.streaming import stream_ingest

    spec = ChangelogSpec(n_events=3000, seed=5, n_repos=8)
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    # changelog lands as multiple seq-ordered files (like compacted binlog
    # files arriving on shared storage)
    batches = list(iter_event_batches(spec, batch_size=500))
    all_batches = []
    for i, b in enumerate(batches):
        pq.write_table(
            pa.Table.from_batches([b], schema=EVENT_SCHEMA),
            str(events_dir / f"part-{i:04d}.parquet"),
        )
        all_batches.append(b)
    ev_pandas = pa.Table.from_batches(all_batches, schema=EVENT_SCHEMA).to_pandas()

    table = LakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    q = stream_ingest(
        spark,
        str(events_dir),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        available_now=True,
    )
    q.awaitTermination(120)

    got = (
        table_snapshot(table)
        .toPandas()[SNAP_COLS]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = oracle_snapshot_from_pandas(ev_pandas)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # multiple micro-batches actually ran
    assert len(table.epochs_applied()) >= 2

"""Packed-binary codec roundtrip, changelog range source pruning, lake
time-travel and vacuum."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mysql_binlog_spark.changelog import ChangelogSpec
from mysql_binlog_spark.changelog.generator import generate_events_pandas
from mysql_binlog_spark.engine.pipeline import run_ingest, table_snapshot
from mysql_binlog_spark.lake.table import LakeTable
from mysql_binlog_spark.sources.binlog_codec import (
    decode_packed_events,
    encode_packed_events,
)
from mysql_binlog_spark.sources.changelog_source import (
    read_changelog,
    read_changelog_range,
)

EV_COLS = [
    "seq", "op", "repo", "path", "commit", "lang",
    "content", "before_content", "new_path",
]


def test_packed_codec_roundtrip(spark):
    ev = generate_events_pandas(ChangelogSpec(n_events=2000, seed=11))
    packed = encode_packed_events(ev)
    sdf = spark.createDataFrame(packed)
    back = (
        decode_packed_events(sdf)
        .toPandas()[EV_COLS]
        .sort_values("seq")
        .reset_index(drop=True)
    )
    want = ev[EV_COLS].sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, want, check_dtype=False)


def test_changelog_range_pruning(spark, tmp_path):
    ev = generate_events_pandas(ChangelogSpec(n_events=3000, seed=12))
    p = str(tmp_path / "ev.parquet")
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), p)
    df = read_changelog_range(spark, p, start_seq=999, stop_seq=1999)
    seqs = [r["seq"] for r in df.select("seq").collect()]
    assert min(seqs) == 1000 and max(seqs) == 1999 and len(seqs) == 1000
    # the predicate reaches the scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "seq" in plan


def test_time_travel_and_vacuum(spark, tmp_path):
    ev = generate_events_pandas(ChangelogSpec(n_events=4000, seed=13))
    p = str(tmp_path / "ev.parquet")
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), p)

    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    run_ingest(spark, p, t, epoch_size=2000)
    assert t.current_version() == 2

    v1 = t.read_state(version=1)
    v2 = t.read_state(version=2)
    # v1 is the state after epoch 0 only: its max seq stays below 2000
    assert v1.agg({"seq": "max"}).collect()[0][0] <= 1999
    assert v2.agg({"seq": "max"}).collect()[0][0] >= 2000

    n_v2 = v2.count()
    removed = t.vacuum(keep_versions=1)
    assert removed, "older snapshot files should be reclaimed"
    # current state unaffected
    assert t.read_state().count() == n_v2
    # final state still equals a fresh full recover
    t2 = LakeTable(spark, str(tmp_path / "lake2"), n_buckets=8)
    run_ingest(spark, p, t2, epoch_size=2000)
    a = table_snapshot(t).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = table_snapshot(t2).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_schema_imposed_read(spark, tmp_path):
    """Files written without `lang` surface it as NULL (additive
    evolution at the source layer)."""
    ev = generate_events_pandas(ChangelogSpec(n_events=500, seed=14))
    old = ev.drop(columns=["lang"])
    p = str(tmp_path / "old.parquet")
    pq.write_table(pa.Table.from_pandas(old, preserve_index=False), p)
    df = read_changelog(spark, p)
    assert "lang" in df.columns
    assert df.filter(df.lang.isNotNull()).count() == 0
    assert df.count() == 500

"""Multi-source (GTID-domain) ingest: independent per-source fences and
high watermarks in one lake table (reference per-UUID GTID sets,
common/inter/offset.go:24-33, mysql_gtid.go:342-384)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysql_binlog_spark.changelog import ChangelogSpec
from mysql_binlog_spark.changelog.generator import generate_events_pandas
from mysql_binlog_spark.changelog.oracle import oracle_snapshot_from_pandas
from mysql_binlog_spark.engine.pipeline import (
    run_ingest,
    run_multi_source_ingest,
    table_snapshot,
)
from mysql_binlog_spark.lake.table import LakeTable

SNAP_COLS = ["repo", "path", "commit", "lang", "content", "content_sha256"]


def _shard(tmp, name, seed, n=2000):
    """One upstream shard: its own seq space, repos prefixed by shard so
    key spaces are disjoint (sharded ownership)."""
    ev = generate_events_pandas(ChangelogSpec(n_events=n, seed=seed, n_repos=6))
    ev = ev.assign(repo=name + "/" + ev.repo)
    p = str(tmp / f"{name}.parquet")
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), p)
    return ev, p


@pytest.fixture()
def shards(tmp_path):
    a_ev, a_p = _shard(tmp_path, "alpha", seed=51)
    b_ev, b_p = _shard(tmp_path, "beta", seed=52, n=3000)
    return {"alpha": (a_ev, a_p), "beta": (b_ev, b_p)}


def _want(shards):
    combined = pd.concat(
        [shards["alpha"][0], shards["beta"][0]], ignore_index=True
    )
    # keys are disjoint across shards, so per-shard replay then union ==
    # any interleaving; the oracle replays each shard independently
    wa = oracle_snapshot_from_pandas(shards["alpha"][0])
    wb = oracle_snapshot_from_pandas(shards["beta"][0])
    return (
        pd.concat([wa, wb], ignore_index=True)
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_interleaved_multi_source_matches_oracle(spark, shards, tmp_path):
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    reports = run_multi_source_ingest(
        spark,
        {k: v[1] for k, v in shards.items()},
        t,
        epoch_size=1000,
    )
    assert reports["alpha"].epochs_run == 2 and reports["beta"].epochs_run == 3
    got = (
        table_snapshot(t).toPandas()[SNAP_COLS]
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _want(shards), check_dtype=False)

    # per-source watermarks are independent (seq spaces overlap numerically)
    assert t.high_watermark("alpha") == 1999
    assert t.high_watermark("beta") == 2999
    assert t.sources() == ["alpha", "beta"]
    cp = t.checkpoints().toPandas()
    assert set(cp["source"].unique()) == {"alpha", "beta"}


def test_per_source_fence_independence(spark, shards, tmp_path):
    """A crash in ONE source's stream resumes independently: the other
    source's fence is untouched, replays fence out per source."""
    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    a_p, b_p = shards["alpha"][1], shards["beta"][1]
    # beta fully ingested; alpha crashes after 1 of 2 epochs
    run_ingest(spark, b_p, t, epoch_size=1000, source="beta")
    run_ingest(spark, a_p, t, epoch_size=1000, source="alpha", stop_after_epochs=1)
    assert t.epochs_applied("beta") == [0, 1, 2]
    assert t.epochs_applied("alpha") == [0]
    assert t.high_watermark("alpha") == 999

    # resume alpha; beta replay is a fenced no-op
    r_a = run_ingest(spark, a_p, t, epoch_size=1000, source="alpha")
    r_b = run_ingest(spark, b_p, t, epoch_size=1000, source="beta")
    assert r_a.epochs_run == 1 and r_b.epochs_run == 0
    got = (
        table_snapshot(t).toPandas()[SNAP_COLS]
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _want(shards), check_dtype=False)


def test_concurrent_streaming_sources_one_table(spark, shards, tmp_path):
    """Two live streams (distinct sources, disjoint key spaces) tail into
    ONE table concurrently — per-source watermark fences + optimistic
    commit retries make the interleaved commits safe; final state equals
    the per-shard oracle union (the multi-master `backup` shape)."""
    from mysql_binlog_spark.changelog.generator import EVENT_SCHEMA
    from mysql_binlog_spark.streaming import stream_ingest

    dirs = {}
    for name in ("alpha", "beta"):
        ev = shards[name][0]
        d = tmp_path / f"stream_{name}"
        d.mkdir()
        step = len(ev) // 4
        for i in range(4):
            chunk = ev.iloc[i * step : (i + 1) * step if i < 3 else len(ev)]
            pq.write_table(
                # explicit schema: an all-null lang chunk must not infer int
                pa.Table.from_pandas(
                    chunk, schema=EVENT_SCHEMA, preserve_index=False
                ),
                str(d / f"part-{i:04d}.parquet"),
            )
        dirs[name] = str(d)

    root = str(tmp_path / "lake")
    queries = []
    for name in ("alpha", "beta"):
        t = LakeTable(spark, root, n_buckets=8)
        queries.append(
            stream_ingest(
                spark, dirs[name], t,
                checkpoint_dir=str(tmp_path / f"ckpt_{name}"),
                max_files_per_trigger=1,  # several interleaved commits each
                available_now=True, source=name,
            )
        )
    for q in queries:
        q.awaitTermination(240)

    t = LakeTable(spark, root)
    got = (
        table_snapshot(t).toPandas()[SNAP_COLS]
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _want(shards), check_dtype=False)
    assert t.high_watermark("alpha") == 1999
    assert t.high_watermark("beta") == 2999
    assert t.sources() == ["alpha", "beta"]
    # both sources committed multiple interleaved epochs
    assert len(t.epochs_applied("alpha")) >= 2
    assert len(t.epochs_applied("beta")) >= 2

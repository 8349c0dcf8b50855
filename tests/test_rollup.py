"""Multi-granularity rollup cascade (SURVEY §2.3 P2 / §2.9 T1; reference
cascade flush backup/handler/merge.go:513-633)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mysql_binlog_spark.changelog import ChangelogSpec
from mysql_binlog_spark.changelog.generator import generate_events_pandas
from mysql_binlog_spark.operators.collapse import expand_renames
from mysql_binlog_spark.operators.rollup import cascade_levels, cascade_summary


@pytest.fixture(scope="module")
def tev(spark, tmp_path_factory):
    ev = generate_events_pandas(ChangelogSpec(n_events=4000, seed=31))
    p = str(tmp_path_factory.mktemp("roll") / "ev.parquet")
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), p)
    norm = expand_renames(spark.read.parquet(p))
    return norm.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_600_000_000) + F.col("seq") * 11)
    )


def _direct(tev, gran):
    """One granularity computed directly from raw events — the cascade's
    finer-to-coarser derivation must equal this."""
    return (
        tev.groupBy(F.date_trunc(gran, "ts").alias("wstart"), "repo", "path")
        .agg(
            F.max_by(F.struct("seq", "op", "content"), F.col("seq")).alias("last"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@pytest.mark.parametrize("gran", ["hour", "day"])
def test_cascade_equals_direct(spark, tev, gran):
    levels = cascade_levels(tev)
    got = levels[gran].toPandas().sort_values(["wstart", "repo", "path"]).reset_index(drop=True)
    want = _direct(tev, gran).toPandas().sort_values(["wstart", "repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cascade_counts_conserve(spark, tev):
    """Every level partitions the same event stream: n_events sums are
    identical at every granularity."""
    s = cascade_summary(tev).toPandas()
    totals = s.groupby("gran")["n_events"].sum()
    assert totals.nunique() == 1
    # windows nest: day count <= hour count <= minute count
    counts = s.groupby("gran")["wstart"].count()
    assert counts["day"] <= counts["hour"] <= counts["minute"]


def test_cascade_single_raw_shuffle(spark, tev):
    """Only the finest level touches raw events: coarser levels aggregate
    the previous level's output (the cascade property — at 10^10 events
    the hour/day rollups never rescan the stream)."""
    levels = cascade_levels(tev)
    day_plan = levels["day"]._jdf.queryExecution().optimizedPlan().toString()
    minute_plan = levels["minute"]._jdf.queryExecution().optimizedPlan().toString()
    # exactly two more aggregates than the finest level...
    assert day_plan.count("Aggregate") == minute_plan.count("Aggregate") + 2
    # ...and NOT one extra source scan per level (expand_renames's 3-branch
    # union scans the parquet 3x in both plans; the cascade adds zero)
    assert day_plan.count("Relation") == minute_plan.count("Relation")

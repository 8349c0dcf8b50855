"""Pin the driver-side xxHash64 (functions.xxhash) bit-identical to the
JVM's F.xxhash64 — the agreement that lets LakeTable.lookup and the DDL
bloom probe skip the per-probe 1-row Spark job."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from mysql_binlog_spark.functions.xxhash import pmod, spark_xxhash64
from mysql_binlog_spark.lake.table import BLOOM_BITS, _BLOOM_SALT


def test_python_xxhash64_matches_jvm(spark):
    rng = random.Random(1234)
    alphabet = string.printable + "éü中文 "
    cases = [
        ("", ""), ("r0", "p1"), ("a" * 7, "b" * 8), ("x" * 31, "y" * 32),
        ("m" * 100, "n" * 333),
    ]
    for _ in range(400):
        cases.append(
            (
                "".join(rng.choices(alphabet, k=rng.randint(0, 70))),
                "".join(rng.choices(alphabet, k=rng.randint(0, 120))),
            )
        )
    df = spark.createDataFrame(cases, "repo string, path string")
    rows = df.select(
        "repo",
        "path",
        F.xxhash64("repo", "path").alias("h2"),
        F.xxhash64("repo").alias("h1"),
        F.xxhash64("repo", F.lit(_BLOOM_SALT)).alias("hs"),
        F.pmod(F.xxhash64("repo", "path"), F.lit(48)).cast("int").alias("b48"),
        F.pmod(F.xxhash64("repo"), F.lit(BLOOM_BITS)).cast("int").alias("p1"),
    ).collect()
    for r in rows:
        assert spark_xxhash64(r["repo"], r["path"]) == r["h2"], (r["repo"], r["path"])
        assert spark_xxhash64(r["repo"]) == r["h1"]
        assert spark_xxhash64(r["repo"], _BLOOM_SALT) == r["hs"]
        assert pmod(spark_xxhash64(r["repo"], r["path"]), 48) == r["b48"]
        assert pmod(spark_xxhash64(r["repo"]), BLOOM_BITS) == r["p1"]


def test_lookup_plans_without_spark_jobs(spark, tmp_path):
    """A full-key lookup must not launch any Spark job to PLAN (the scan
    itself is lazy): bucket + bloom positions are pure driver math."""
    from mysql_binlog_spark.lake.table import LakeTable

    t = LakeTable(spark, str(tmp_path / "lake"), n_buckets=8)
    t.merge(
        spark.createDataFrame(
            [("r1", "p1", 1, "I", "c", "body")],
            "repo string, path string, seq long, op string, commit string, "
            "content string",
        ),
        epoch=0,
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = t.lookup("r1", "p1")  # plan only
    df2 = t.lookup("absent-repo")  # bloom probe only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "lookup planning must be zero Spark jobs"
    # and the plans are still correct when executed
    assert [r["content"] for r in df.collect()] == ["body"]
    assert df2.count() == 0

"""M1: the Spark collapse reproduces the sequential oracle, and the
net-effect algebra matches every cell of SURVEY.md §2.4's transition table
(reference: backup/binlog/repl.go:190-387)."""

from __future__ import annotations

import pandas as pd
import pytest

from mysql_binlog_spark.changelog.generator import EVENT_SCHEMA
from mysql_binlog_spark.changelog.oracle import oracle_snapshot_from_pandas
from mysql_binlog_spark.operators.collapse import (
    collapse_latest,
    collapse_net_effect,
    expand_renames,
    snapshot_from_events,
)

EVENT_COLS = list(EVENT_SCHEMA.names)


def _events_df(spark, rows):
    """rows: list of (seq, repo, path, op, commit, lang, content, before, new_path)"""
    pdf = pd.DataFrame(rows, columns=EVENT_COLS)
    return spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))


def test_snapshot_matches_oracle(spark, small_changelog):
    events = spark.read.parquet(small_changelog["path"])
    got = (
        snapshot_from_events(events)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = oracle_snapshot_from_pandas(small_changelog["pandas"])
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content", "content_sha256"]],
        want,
        check_dtype=False,
    )


def _ev(seq, op, content=None, before=None, path="f", new_path=None):
    # trailing None = statement (row events carry no DDL payload)
    return (seq, "r", path, op, f"{seq:040d}", None, content, before, new_path, None)


CASES = [
    # (name, events, expected: dict key->net_op or None for annihilate)
    ("lone_insert", [_ev(1, "I", "a")], {("r", "f"): ("I", "a", None)}),
    ("lone_update", [_ev(1, "U", "a", "b")], {("r", "f"): ("U", "a", "b")}),
    ("lone_delete", [_ev(1, "D", None, "b")], {("r", "f"): ("D", None, "b")}),
    (
        "insert_update",  # insert+update = insert(after)  repl.go:217-221
        [_ev(1, "I", "a"), _ev(2, "U", "c", "a")],
        {("r", "f"): ("I", "c", None)},
    ),
    (
        "insert_delete_annihilate",  # repl.go:300-302
        [_ev(1, "I", "a"), _ev(2, "D", None, "a")],
        {},
    ),
    (
        "update_update",  # first before, last after  repl.go:223-230
        [_ev(1, "U", "x", "w"), _ev(2, "U", "a", "x")],
        {("r", "f"): ("U", "a", "w")},
    ),
    (
        "update_delete",  # delete(oldest before)  repl.go:303-313
        [_ev(1, "U", "x", "w"), _ev(2, "D", None, "x")],
        {("r", "f"): ("D", None, "w")},
    ),
    (
        "delete_insert",  # re-insert = update(w->a)  repl.go:373-387
        [_ev(1, "D", None, "w"), _ev(2, "I", "a")],
        {("r", "f"): ("U", "a", "w")},
    ),
    (
        "insert_update_delete_annihilate",
        [_ev(1, "I", "a"), _ev(2, "U", "b", "a"), _ev(3, "D", None, "b")],
        {},
    ),
    (
        "rename_chain",  # U with new_path = D(old)+I(new)  repl.go:210-235
        [_ev(1, "I", "a", path="f"), _ev(2, "U", "b", "a", path="f", new_path="g")],
        {("r", "f"): None, ("r", "g"): ("I", "b", None)},
        # old key f: I then D -> annihilate; new key g: net insert
    ),
]


@pytest.mark.parametrize("name,rows,expected", CASES, ids=[c[0] for c in CASES])
def test_net_effect_algebra(spark, name, rows, expected):
    df = _events_df(spark, rows)
    out = collapse_net_effect(expand_renames(df)).collect()
    got = {
        (r["repo"], r["path"]): (r["net_op"], r["content"], r["before_content"])
        for r in out
    }
    want = {k: v for k, v in expected.items() if v is not None}
    assert got == want


def test_latest_tombstones(spark):
    rows = [
        _ev(1, "I", "a", path="keep"),
        _ev(2, "I", "a", path="gone"),
        _ev(3, "D", None, "a", path="gone"),
    ]
    out = collapse_latest(expand_renames(_events_df(spark, rows)))
    got = {(r["repo"], r["path"]): r["op"] for r in out.collect()}
    assert got == {("r", "keep"): "I", ("r", "gone"): "D"}


def test_no_python_udf_in_plan(spark, small_changelog):
    """Hot path stays JVM-side: no BatchEvalPython / ArrowEvalPython node."""
    events = spark.read.parquet(small_changelog["path"])
    df = snapshot_from_events(events)
    df.collect()  # materialize THIS plan so AQE finalizes it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "isFinalPlan=true" in plan
    assert "*(" in plan  # whole-stage-codegen'd spans present
    # partial (map-side) aggregation before the shuffle: the property that
    # bounds shuffle traffic to <=1 row per key per input partition
    assert "partial_max_by" in plan

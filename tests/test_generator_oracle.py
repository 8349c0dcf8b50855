"""M0: the synthetic changelog generator obeys binlog validity rules and the
sequential oracle replays it into a consistent final state."""

from __future__ import annotations

import pandas as pd

from mysql_binlog_spark.changelog import ChangelogSpec
from mysql_binlog_spark.changelog.generator import generate_events_pandas
from mysql_binlog_spark.changelog.oracle import oracle_snapshot_from_pandas


def test_determinism():
    spec = ChangelogSpec(n_events=1000, seed=7)
    a = generate_events_pandas(spec)
    b = generate_events_pandas(spec)
    pd.testing.assert_frame_equal(a, b)


def test_validity_constraints(small_changelog):
    ev = small_changelog["pandas"]
    assert list(ev["seq"]) == list(range(len(ev)))  # strict monotone seq
    live: set[tuple[str, str]] = set()
    for r in ev.itertuples():
        key = (r.repo, r.path)
        if r.op == "I":
            assert key not in live, f"I on live key at seq {r.seq}"
            assert r.content is not None
            live.add(key)
        elif r.op == "U":
            assert key in live, f"U on dead key at seq {r.seq}"
            assert r.before_content is not None
            if r.new_path is not None:
                live.discard(key)
                live.add((r.repo, r.new_path))
        elif r.op == "D":
            assert key in live, f"D on dead key at seq {r.seq}"
            assert r.content is None
            live.discard(key)


def test_schema_evolution_boundary(small_changelog):
    ev = small_changelog["pandas"]
    spec = small_changelog["spec"]
    pre = ev[ev.seq < spec.evolution_seq]
    post = ev[(ev.seq >= spec.evolution_seq) & (ev.op != "D")]
    assert pre["lang"].isna().all()
    assert post["lang"].notna().all()


def test_repo_skew(small_changelog):
    ev = small_changelog["pandas"]
    spec = small_changelog["spec"]
    counts = ev["repo"].value_counts()
    n_hot = max(1, int(spec.n_repos * spec.hot_frac))
    hot_share = counts.iloc[:n_hot].sum() / counts.sum()
    assert hot_share > 0.6  # skew actually present


def test_oracle_snapshot_shape(small_changelog):
    snap = oracle_snapshot_from_pandas(small_changelog["pandas"])
    assert len(snap) > 0
    assert snap.duplicated(subset=["repo", "path"]).sum() == 0
    assert snap["content"].notna().all()
    assert snap["content_sha256"].str.len().eq(64).all()

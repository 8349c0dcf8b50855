from __future__ import annotations

import pytest

from mysql_binlog_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mysql_binlog_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def small_changelog(tmp_path_factory):
    """Deterministic 5k-event changelog parquet + its pandas copy."""
    from mysql_binlog_spark.changelog import ChangelogSpec, write_events_parquet
    from mysql_binlog_spark.changelog.generator import generate_events_pandas

    spec = ChangelogSpec(n_events=5000, seed=42, n_repos=12)
    d = tmp_path_factory.mktemp("changelog")
    path = str(d / "events.parquet")
    n = write_events_parquet(spec, path)
    assert n == 5000
    return {"spec": spec, "path": path, "pandas": generate_events_pandas(spec)}

"""Deterministic synthetic changelog (generator) + sequential-replay oracle.

These two modules encode the reference's event semantics *twice
independently*: the generator knows what a valid binlog row-event stream
looks like (reference: backup/binlog/repl.go:144-236 — insert/update/delete
row events, key-changing updates); the oracle knows how applying that stream
one event at a time mutates table state (reference: recover/res/resume.go:
592-747 — sequential replay). The Spark engine must reproduce the oracle's
final state from the same events, per-row sha256(content) equal.
"""

from mysql_binlog_spark.changelog.generator import (  # noqa: F401
    ChangelogSpec,
    EVENT_SCHEMA,
    generate_events_pandas,
    write_events_parquet,
)
from mysql_binlog_spark.changelog.oracle import (  # noqa: F401
    replay_oracle,
    snapshot_to_pandas,
)

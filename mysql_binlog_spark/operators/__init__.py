from mysql_binlog_spark.operators.collapse import (  # noqa: F401
    expand_renames,
    collapse_latest,
    collapse_net_effect,
    snapshot_from_events,
    with_salt,
)

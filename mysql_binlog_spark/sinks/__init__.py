"""Sinks: byte-format exports of the engine's change streams."""

from mysql_binlog_spark.sinks.binlog_file import (  # noqa: F401
    read_binlog_files,
    write_binlog_files,
)

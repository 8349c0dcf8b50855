"""Codec expressions: MySQL-variant base64 and BINLOG-statement export.

The reference's recover path base64-encodes raw events into
``BINLOG '<base64>'`` statements with 76-character lines (MySQL's own
encoder variant, common/utils/encode.go:96-149) and applies them in
transactions (recover/res/resume.go:592-747). Our engine's lake state
replaces that apply path, but the EXPORT format is still useful for
interop — emitting a compacted changelog as replayable statements.

Pure built-in expressions: base64 + regexp chunking, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mysql_base64(payload: Column | str, line_len: int = 76) -> Column:
    """base64 with a newline after every ``line_len`` chars (MySQL style)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    b64 = F.base64(c.cast("binary"))
    return F.regexp_replace(b64, "(.{%d})" % line_len, "$1\n")


def binlog_statement(payload: Column | str) -> Column:
    """Render a payload as a replayable ``BINLOG '<base64>';`` statement."""
    return F.concat(F.lit("BINLOG '"), mysql_base64(payload), F.lit("';"))

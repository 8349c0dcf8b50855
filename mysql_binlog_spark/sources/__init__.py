from mysql_binlog_spark.sources.binlog_codec import (  # noqa: F401
    PACKED_SCHEMA,
    decode_packed_events,
    encode_packed_events,
    write_packed_changelog,
)
from mysql_binlog_spark.sources.changelog_source import (  # noqa: F401
    EVENT_DDL,
    read_changelog,
    read_changelog_range,
    read_changelog_stream,
)

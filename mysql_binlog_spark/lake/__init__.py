from mysql_binlog_spark.lake.table import LakeTable, MergeResult  # noqa: F401

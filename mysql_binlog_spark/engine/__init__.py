from mysql_binlog_spark.engine.pipeline import (  # noqa: F401
    IngestReport,
    plan_epochs,
    run_ingest,
    recover,
)

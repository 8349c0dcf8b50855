"""mysql_binlog_spark — a from-scratch, PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference Go CDC toolchain
(NineT/mysql-binlog: backup / merge / recover over MySQL binlogs) as an
idiomatic Spark DataFrame pipeline over a lake table:

- change events are first-class DataFrame rows ``(seq, repo, path, op,
  commit, lang, content, before_content, new_path)`` — the Spark analog of
  the reference's protobuf ``BytesUnit`` keyed change events
  (reference: common/proto/unit.proto:45-57, backup/binlog/repl.go:397-430);
- the per-key net-effect collapse (reference: backup/binlog/repl.go:190-387)
  becomes a ``groupBy(key).agg(max_by/min_by)`` aggregation — pure JVM-side
  expressions, no per-row Python;
- the LevelDB state + synthetic-binlog flush (reference:
  backup/handler/merge.go:368-443, common/log/bin.go:28-207) becomes an
  atomic-snapshot, hash-bucketed, copy-on-write lake table with idempotent
  MERGE semantics (``mysql_binlog_spark.lake``);
- the position/checkpoint metadata (reference: common/db/mysql.go:198-246,
  recover/bpct/check.go:19-87) becomes per-bucket high-watermark lineage
  rows committed atomically with every snapshot.

Nothing here is a port: the reference tells us WHAT to compute; Catalyst
decides HOW.
"""

__version__ = "0.1.0"

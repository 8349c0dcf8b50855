"""The per-key collapse algebra — THE core operator (SURVEY.md §2.4).

The reference folds change events per unique key through a LevelDB
get-modify-put state machine (backup/binlog/repl.go:190-387; identical copy
merge/binlog/repl.go:102-303). Its transition table
(old stored unit x incoming event) is net-effect-preserving:

    old \\ new    insert(a)          update(b->a)        delete(b)
    (absent)     insert(a)          update(b->a)        delete(b)
    insert(x)    update(x->a)       insert(a)           ANNIHILATE (drop key)
    update(w->x) update(w->a)       update(w->a)        delete(w)
    delete(w)    update(w->a)       (invalid)           (invalid)

In Spark this whole state machine reduces to two aggregations over the
key-partitioned, seq-ordered event stream:

- ``collapse_latest`` — last-writer-wins: ``max_by(struct(...), order)``.
  Sufficient for final table state (the MERGE source). Partial aggregation
  (map-side combine) means each input partition contributes at most one row
  per key to the shuffle — the Spark analog of the reference's "state is
  bounded to <=1 unit per key" property.
- ``collapse_net_effect`` — first-op x last-op typing via ``min_by`` +
  ``max_by`` + a CASE, including insert+delete annihilation. Needed when
  emitting net-change streams (the reference's compacted binlog output,
  backup/binlog/repl.go:770-800).

Key-changing updates (rename; reference backup/binlog/repl.go:210-235) are
normalized FIRST by ``expand_renames`` into D(old key) + I(new key) pairs,
after which every event targets exactly one key and the fold is a clean
per-key aggregation.

No per-row Python anywhere: everything is JVM-side, codegen'd expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY_COLS = ["repo", "path"]
#: payload carried through the collapse into the lake table
PAYLOAD_COLS = ["commit", "lang", "content"]


def _order() -> Column:
    """Total event order within a key: (seq, sub).

    ``sub`` disambiguates the two halves of an expanded rename (the D of the
    old key sorts before the I of the new key at the same seq) — the Spark
    analog of the reference's BinlogPosition total order
    (common/inter/offset.go:56-72).
    """
    return F.struct(F.col("seq"), F.col("sub"))


def expand_renames(events: DataFrame) -> DataFrame:
    """Normalize key-changing updates into D(old key) + I(new key).

    Input: raw changelog (seq, repo, path, op, commit, lang, content,
    before_content, new_path). Output adds ``sub`` (0/1) and drops
    ``new_path``; every row now targets exactly one (repo, path).

    Implemented as filter + unionByName (3 narrow codegen'd branches over
    the same scan) rather than explode-over-array: renames are a small
    fraction of the stream, and the union form avoids allocating an
    array-of-struct per event — measurably faster at 10^7+ events, and
    Catalyst pushes the rename predicate into all three parquet scans.
    """
    is_rename = F.col("new_path").isNotNull() & (F.col("op") == "U")
    null_s = F.lit(None).cast("string")
    # event-type dispatch (F1): only row events flow into the collapse —
    # DDL ('Q') and any txn-control analogs are handled upstream
    # (engine.pipeline barriers / operators.ddl), mirroring the
    # reference's 35-way switch acting only on rows events
    # (backup/handler/merge.go:134-254)
    plain = events.filter(~is_rename & F.col("op").isin("I", "U", "D")).select(
        "seq",
        F.lit(0).alias("sub"),
        "repo",
        "path",
        "op",
        "commit",
        "lang",
        "content",
        "before_content",
    )
    renames = events.filter(is_rename)
    # D half targets the OLD key and owns the before-image
    d_half = renames.select(
        "seq",
        F.lit(0).alias("sub"),
        "repo",
        "path",
        F.lit("D").alias("op"),
        null_s.alias("commit"),
        null_s.alias("lang"),
        null_s.alias("content"),
        F.col("before_content").alias("before_content"),
    )
    # I half targets the NEW key — a fresh insert, no before-image
    i_half = renames.select(
        "seq",
        F.lit(1).alias("sub"),
        "repo",
        F.col("new_path").alias("path"),
        F.lit("I").alias("op"),
        "commit",
        "lang",
        "content",
        null_s.alias("before_content"),
    )
    return plain.unionByName(d_half).unionByName(i_half)


def collapse_latest(norm: DataFrame) -> DataFrame:
    """A1 — last-writer-wins per key over normalized events.

    Returns one row per key: (repo, path, seq, op, commit, lang, content)
    of the LAST event. ``op == 'D'`` rows are delete tombstones for the
    MERGE sink; callers building a plain snapshot filter them out.

    ``groupBy + max_by`` (not a window): partial agg runs map-side, so the
    shuffle carries <=1 row per key per input partition — at 10^10 events
    this is the difference between shuffling the whole changelog and
    shuffling ~|keys| rows.
    """
    last = F.max_by(
        F.struct("op", *PAYLOAD_COLS, "seq"),
        _order(),
    ).alias("last")
    agg = norm.groupBy(*KEY_COLS).agg(last, F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        *KEY_COLS,
        F.col("last.seq").alias("seq"),
        F.col("last.op").alias("op"),
        *[F.col(f"last.{c}").alias(c) for c in PAYLOAD_COLS],
        "n_events",
    )


def collapse_net_effect(norm: DataFrame) -> DataFrame:
    """A2 — net-effect op typing: first-op x last-op per key (SURVEY §2.4).

    Output: one row per key with ``net_op`` in ('I','U','D') plus the
    oldest before-image and the newest after-image; keys whose net effect
    is nothing (first='I' and last='D' — insert+delete annihilation,
    reference backup/binlog/repl.go:300-302) are dropped.
    """
    o = _order()
    agg = norm.groupBy(*KEY_COLS).agg(
        F.min_by(F.struct("op", "before_content"), o).alias("first"),
        F.max_by(F.struct("op", "seq", *PAYLOAD_COLS), o).alias("last"),
    )
    first_op = F.col("first.op")
    last_op = F.col("last.op")
    net_op = (
        F.when((first_op == "I") & (last_op == "D"), F.lit(None).cast("string"))
        .when(first_op == "I", F.lit("I"))
        .when(last_op == "D", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return (
        agg.select(
            *KEY_COLS,
            net_op.alias("net_op"),
            F.col("first.before_content").alias("before_content"),
            F.col("last.seq").alias("seq"),
            F.col("last.op").alias("last_op"),
            *[F.col(f"last.{c}").alias(c) for c in PAYLOAD_COLS],
        )
        .filter(F.col("net_op").isNotNull())
    )


def snapshot_from_events(events: DataFrame) -> DataFrame:
    """M1 flagship: raw changelog -> final table state.

    Equivalent to the reference's full backup->merge->recover round trip:
    the replayed table state, one row per live key, with the per-row
    sha256(content) invariant column (BASELINE.json input_hint).
    """
    latest = collapse_latest(expand_renames(events))
    return (
        latest.filter(F.col("op") != "D")
        .select(
            *KEY_COLS,
            *PAYLOAD_COLS,
            F.sha2(F.col("content"), 256).alias("content_sha256"),
        )
    )


def with_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """P3 — salt helper for skewed keys.

    The collapse itself doesn't need salting (groupBy partial-agg already
    bounds per-key shuffle traffic), but downstream per-REPO aggregations
    over hot repos do: aggregate per (repo, salt) first, then re-aggregate
    per repo — two small shuffles instead of one skewed one.
    """
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(*KEY_COLS, F.col("seq")), F.lit(n_salts))
    )

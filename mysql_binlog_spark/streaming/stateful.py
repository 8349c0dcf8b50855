"""Custom stateful streaming operator via applyInPandasWithState.

The engine's primary stateful path keeps state in the lake table itself
(foreachBatch + fenced MERGE — streaming/ingest.py), which is the right
design for durable CDC state at 100 TB. This module provides the OTHER
stateful shape Structured Streaming offers — per-key state inside
Spark's state store, updated by an arbitrary Python function over Arrow
batches (``applyInPandasWithState``) — for semantics the MERGE path
doesn't cover: emitting a live, per-batch changefeed of current key
state without any table round-trip, session-style accumulators, or
custom eviction policies.

Operator here: **streaming last-writer-wins collapse** — the per-key
fold of SURVEY §2.4 (reference LevelDB get-modify-put,
backup/binlog/repl.go:190-387) run as true streaming state. Each
micro-batch emits one row per key touched in that batch carrying the
key's CURRENT net state (seq, op, content...), i.e. the same transition
table the batch collapse implements, evaluated incrementally.

Scale notes: state is hash-partitioned by key across executors (the
shuffle Spark inserts for the groupBy); each group's fold sees Arrow
batches, not Python rows; state size is bounded by one row per live key
(delete tombstones drop state via ``state.remove()``). At 10^10-key
scale you would back this with the RocksDB state store provider —
config, not code.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: emitted row: key + current net state after applying the batch
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("seq", T.LongType(), True),
        T.StructField("op", T.StringType(), True),  # 'D' => key now dead
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

#: per-key state tuple mirrors the stored BytesUnit (net image + position)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def _collapse_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one key's batch rows into its stored state (newest seq wins;
    'D' clears the state — the annihilation/tombstone cell of the
    transition table)."""
    repo, path = key
    cur_seq, cur_commit, cur_lang, cur_content = (
        state.get if state.exists else (None, None, None, None)
    )
    alive = state.exists
    # Vectorized LWW fold: under last-writer-wins only the NEWEST event at
    # or beyond the stored seq matters — intermediate rows cannot affect
    # the final state, so the per-row walk reduces to one idxmax.
    parts = [pdf for pdf in pdfs if len(pdf)]
    if parts:
        batch = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        if cur_seq is not None:
            batch = batch[batch["seq"] > cur_seq]  # replayed/older: ignored
        if len(batch):
            w = batch.loc[batch["seq"].idxmax()]
            cur_seq = int(w["seq"])
            if w["op"] == "D":
                alive = False
                cur_commit = cur_lang = cur_content = None
            else:
                alive = True
                cur_commit, cur_lang, cur_content = (
                    w["commit"], w["lang"], w["content"],
                )
    if alive:
        state.update((cur_seq, cur_commit, cur_lang, cur_content))
    elif state.exists:
        state.remove()
    yield pd.DataFrame(
        [
            {
                "repo": repo,
                "path": path,
                "seq": cur_seq,
                "op": ("U" if alive else "D"),
                "commit": cur_commit,
                "lang": cur_lang,
                "content": cur_content,
            }
        ]
    )


def stateful_collapse_stream(events: DataFrame) -> DataFrame:
    """Streaming DF of row events -> per-batch changefeed of current key
    state (one row per key touched per micro-batch).

    Renames must be pre-normalized (expand_renames) so every row targets
    one key; DDL rows are dropped here (they belong to the barrier
    pipeline, not per-key state).
    """
    rows = events.filter(F.col("op").isin("I", "U", "D")).select(
        "repo", "path", "seq", "op", "commit", "lang", "content"
    )
    return rows.groupBy("repo", "path").applyInPandasWithState(
        _collapse_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

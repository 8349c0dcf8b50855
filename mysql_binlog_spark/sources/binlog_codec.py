"""Packed binary change-event codec — the binlog byte-parsing analog.

The reference's hot loop decodes raw binlog bytes into typed row events
(siddontang/go-mysql/replication/row_event.go:395-540: per-type dispatch,
null bitmaps, length-prefixed strings). Our engine normally reads columnar
parquet and never pays that cost; this module exists for the ingest edge
where events ARRIVE as packed binary records (the wire/archive format), and
implements the decode the Spark-first way: **vectorized over Arrow batches
via mapInPandas** — one Python call per ~10k records, zero per-row Python
(BASELINE.json input_hint: no per-row Python anywhere).

Record layout (little-endian), one event per record:

    u8 version (=2) | u64 seq | u8 op ('I'/'U'/'D'/'Q') | u8 flags
    | 8x u32 field lengths | repo | path | commit | lang | content
    | before_content | new_path | statement  (utf-8)

``flags`` bit i set => nullable field i is NULL (lang / content /
before_content / new_path / statement).
A deliberate echo of the reference's column-present/null bitmaps
(row_event.go:340-365) without copying its format. The leading version
byte makes records written by an older (or newer) codec fail loudly
instead of decoding as garbage offsets — the binlog
FORMAT_DESCRIPTION_EVENT's job (reference
siddontang/go-mysql/replication/parser.go:89-130); the decoder also
cross-checks each record's byte length against its header-implied
length, the CRC-strip analog of the reference's per-event size check.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("record", T.BinaryType(), False),
    ]
)

_FIELDS = [
    "repo", "path", "commit", "lang", "content",
    "before_content", "new_path", "statement",
]
# null-bitmap positions for the nullable fields
_NULLABLE = {"lang": 0, "content": 1, "before_content": 2, "new_path": 3, "statement": 4}

_WIRE_VERSION = 2  # bumped whenever the record layout changes
_HEAD = struct.Struct("<BQBB")  # version, seq, op, flags
_N_FIELDS = len(_FIELDS)
_LENS = struct.Struct(f"<{_N_FIELDS}I")


def _pack_one(row) -> bytes:
    flags = 0
    vals = []
    for f in _FIELDS:
        v = row[f]
        if v is None and f in _NULLABLE:
            flags |= 1 << _NULLABLE[f]
            vals.append(b"")
        else:
            vals.append((v or "").encode("utf-8"))
    head = _HEAD.pack(_WIRE_VERSION, int(row["seq"]), ord(row["op"]), flags)
    lens = _LENS.pack(*[len(v) for v in vals])
    return head + lens + b"".join(vals)


def encode_packed_events(events: pd.DataFrame) -> pd.DataFrame:
    """pandas helper: typed events -> one packed binary record per row."""
    recs = [
        _pack_one(r)
        for r in events.where(pd.notnull(events), None).to_dict("records")
    ]
    return pd.DataFrame({"record": recs})


def encode_packed_df(events: DataFrame) -> DataFrame:
    """Distributed encoder: typed changelog DataFrame -> packed binary
    records, via Arrow-batched mapInPandas (mirror of the decode side; no
    driver collect, no shuffle — encodes partition-locally)."""
    from pyspark.sql import functions as F

    sel = [
        F.col(c) if c in events.columns else F.lit(None).cast("string").alias(c)
        for c in ["seq", "op", *_FIELDS]
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield encode_packed_events(pdf)

    return events.select(*sel).mapInPandas(run, schema=PACKED_SCHEMA)


def _unpack_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out: dict[str, list] = {
        "seq": [],
        "op": [],
        **{f: [] for f in _FIELDS},
    }
    for rec in pdf["record"]:
        b = bytes(rec)
        ver, seq, op, flags = _HEAD.unpack_from(b, 0)
        if ver != _WIRE_VERSION:
            raise ValueError(
                f"packed record has wire-format version {ver}, decoder "
                f"speaks {_WIRE_VERSION} — re-encode the stream (stale "
                "archive?) instead of decoding garbage offsets"
            )
        lens = _LENS.unpack_from(b, _HEAD.size)
        if _HEAD.size + _LENS.size + sum(lens) != len(b):
            raise ValueError(
                f"packed record length {len(b)} does not match its "
                "header-implied length — corrupt or truncated record"
            )
        off = _HEAD.size + _LENS.size
        out["seq"].append(seq)
        out["op"].append(chr(op))
        for i, f in enumerate(_FIELDS):
            ln = lens[i]
            if f in _NULLABLE and flags & (1 << _NULLABLE[f]):
                out[f].append(None)
            else:
                out[f].append(b[off : off + ln].decode("utf-8"))
            off += ln
    out["seq"] = np.asarray(out["seq"], dtype="int64")
    return pd.DataFrame(out)


def decode_packed_events(packed: DataFrame) -> DataFrame:
    """packed binary records -> typed changelog DataFrame.

    Arrow-batched mapInPandas: the decode runs once per Arrow batch inside
    the Python worker, partition-locally (no shuffle); downstream collapse
    and merge stay fully JVM-side.
    """
    from mysql_binlog_spark.sources.changelog_source import EVENT_DDL

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _unpack_batch(pdf)

    return packed.mapInPandas(run, schema=EVENT_DDL)


def write_packed_changelog(events: pd.DataFrame, out_path: str) -> int:
    """Test/bench helper: write a typed pandas changelog as packed parquet
    (a binary `record` column — the archived-binlog stand-in)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    packed = encode_packed_events(events)
    pq.write_table(
        pa.Table.from_pandas(packed, preserve_index=False), out_path
    )
    return len(packed)

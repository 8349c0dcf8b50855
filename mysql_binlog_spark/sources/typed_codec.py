"""Typed packed change-event codec — full column-type decode at the
ingest edge (SURVEY §1.4 / §2.8 C9).

The reference decodes every MySQL binlog column type from raw bytes:
ints of all widths, NEWDECIMAL(p,s), FLOAT/DOUBLE, BIT/SET,
TIMESTAMP2/DATETIME2(fsp), DATE/YEAR, ENUM, BLOB, VARCHAR and binary
JSON (siddontang/go-mysql/replication/row_event.go:395-540, 571-814;
json_binary.go). The string-only codec in ``binlog_codec`` covers the
input_hint schema; this module is the typed superset, proving the engine
can carry every reference-decodable type through the wire format:

| wire field   | encoding               | MySQL analog (row_event.go)   |
|--------------|------------------------|-------------------------------|
| seq          | u64                    | LONGLONG :418-432             |
| op           | u8                     | event type                    |
| size_bytes   | i64                    | LONGLONG                      |
| mode         | i32 (signed)           | LONG/INT24 :418-432           |
| score        | i64 scaled 1e-4        | NEWDECIMAL(12,4) :433-436,571 |
| ratio        | f64                    | DOUBLE :437-442               |
| mtime        | i64 epoch micros       | DATETIME2(fsp) :456-471,686   |
| mdate        | i32 days since epoch   | DATE :486-497                 |
| flags_bits   | i64                    | BIT / SET :443-448,633        |
| meta         | utf-8 (JSON text)      | JSON :523-527; json_binary.go |
| raw          | length-prefixed bytes  | BLOB :515-516,816             |
| repo/path/commit/content | utf-8        | VARCHAR/STRING :517-522  |

NULLs travel in a u16 null bitmap — the per-row null-bitmap analog
(row_event.go:354-365).

Both directions run as Arrow-batched ``mapInPandas`` (one Python call
per batch, partition-local, no shuffle); everything downstream of the
decode is typed columns handled fully JVM-side.
"""

from __future__ import annotations

import datetime as _dt
import struct
from collections.abc import Iterator
from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType([T.StructField("record", T.BinaryType(), False)])

#: decoded (and encoder-input) schema
TYPED_EVENT_DDL = (
    "seq long, op string, repo string, path string, commit string, "
    "size_bytes long, mode int, score decimal(12,4), ratio double, "
    "mtime timestamp, mdate date, flags_bits long, meta string, "
    "raw binary, content string"
)

# null-bitmap bit positions
_NULL_BITS = {
    "commit": 0, "size_bytes": 1, "mode": 2, "score": 3, "ratio": 4,
    "mtime": 5, "mdate": 6, "flags_bits": 7, "meta": 8, "raw": 9,
    "content": 10,
}

# header + fixed-width section + 6 var-field lengths, little-endian,
# no padding: seq, op, nullbits | size, mode, score*1e4, ratio,
# mtime_us, mdate_days, flags | len(repo..content)
_FMT = struct.Struct("<QBHqiqdqiq6I")
_VAR_FIELDS = ["repo", "path", "commit", "meta", "raw", "content"]

_EPOCH_DATE = _dt.date(1970, 1, 1)


def _is_null(v) -> bool:
    if v is None:
        return True
    try:
        return bool(pd.isna(v))  # catches NaN AND NaT
    except (TypeError, ValueError):
        return False  # non-scalar (e.g. bytes)


def _pack_row(r: dict) -> bytes:
    nulls = 0

    def fx(name, conv, default=0):
        nonlocal nulls
        if _is_null(r[name]):
            nulls |= 1 << _NULL_BITS[name]
            return default
        return conv(r[name])

    size_bytes = fx("size_bytes", int)
    mode = fx("mode", int)
    score = fx("score", lambda v: int(Decimal(v).scaleb(4)))
    ratio = fx("ratio", float, 0.0)
    mtime = fx("mtime", lambda v: pd.Timestamp(v).value // 1_000)
    mdate = fx("mdate", lambda v: (v - _EPOCH_DATE).days)
    flags = fx("flags_bits", int)

    var_vals = []
    for f in _VAR_FIELDS:
        v = r[f]
        if _is_null(v):
            if f in _NULL_BITS:
                nulls |= 1 << _NULL_BITS[f]
            var_vals.append(b"")
        elif f == "raw":
            var_vals.append(bytes(v))
        else:
            var_vals.append(str(v).encode("utf-8"))

    head = _FMT.pack(
        int(r["seq"]), ord(r["op"]), nulls,
        size_bytes, mode, score, ratio, mtime, mdate, flags,
        *[len(v) for v in var_vals],
    )
    return head + b"".join(var_vals)


def _unpack_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    cols: dict[str, list] = {
        k: []
        for k in [
            "seq", "op", "repo", "path", "commit", "size_bytes", "mode",
            "score", "ratio", "mtime", "mdate", "flags_bits", "meta",
            "raw", "content",
        ]
    }
    for rec in pdf["record"]:
        b = bytes(rec)
        (
            seq, op, nulls, size_bytes, mode, score, ratio, mtime_us,
            mdate_days, flags, *lens
        ) = _FMT.unpack_from(b, 0)
        off = _FMT.size

        def nz(name, v):
            bit = _NULL_BITS.get(name)
            return None if bit is not None and nulls & (1 << bit) else v

        cols["seq"].append(seq)
        cols["op"].append(chr(op))
        cols["size_bytes"].append(nz("size_bytes", size_bytes))
        cols["mode"].append(nz("mode", mode))
        cols["score"].append(nz("score", Decimal(score).scaleb(-4)))
        cols["ratio"].append(nz("ratio", ratio))
        cols["mtime"].append(
            nz("mtime", pd.Timestamp(mtime_us, unit="us"))
        )
        cols["mdate"].append(
            nz("mdate", _EPOCH_DATE + _dt.timedelta(days=mdate_days))
        )
        cols["flags_bits"].append(nz("flags_bits", flags))
        for f, ln in zip(_VAR_FIELDS, lens):
            chunk = b[off : off + ln]
            off += ln
            if f == "raw":
                cols[f].append(nz(f, chunk))
            else:
                cols[f].append(nz(f, chunk.decode("utf-8")))
    out = pd.DataFrame(cols)
    out["seq"] = np.asarray(out["seq"], dtype="int64")
    return out


def encode_typed_events(events: DataFrame) -> DataFrame:
    """Typed changelog -> packed binary records (distributed, Arrow
    batches; the write side of the wire format)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                _pack_row(r)
                for r in pdf.where(pd.notnull(pdf), None).to_dict("records")
            ]
            yield pd.DataFrame({"record": recs})

    return events.mapInPandas(run, schema=PACKED_SCHEMA)


def decode_typed_events(packed: DataFrame) -> DataFrame:
    """Packed binary records -> fully typed changelog DataFrame (the
    read side; decimal/timestamp/date/binary/JSON all land as native
    Spark types, ready for JVM-side processing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _unpack_batch(pdf)

    return packed.mapInPandas(run, schema=TYPED_EVENT_DDL)

"""Sequential-replay oracle: apply events one at a time, in seq order.

This is the ground truth the Spark engine is measured against — the same
invariant the reference guarantees end-to-end: replaying the compacted
output against a MySQL target yields the same final table state as replaying
the original stream (reference: recover/res/resume.go:592-747 applies events
strictly in order inside transactions).

Pure Python on purpose: it shares no code with the engine, so agreement is
evidence of correctness, not of shared bugs.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable, Mapping

import pandas as pd

SNAPSHOT_COLUMNS = ["repo", "path", "commit", "lang", "content", "content_sha256"]

# --- independent (deliberately minimal) DDL interpretation -----------------
# Shares no code with operators.ddl: the oracle re-derives the semantics of
# the generator's statement formats from scratch.

_O_NAME = r"`?(?:main\s*`?\s*\.\s*)?`?([A-Za-z0-9_\-]+)`?"
_O_TRUNC = re.compile(r"^\s*TRUNCATE\s+(?:TABLE\s+)?" + _O_NAME, re.I)
_O_DROP = re.compile(r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?" + _O_NAME, re.I)
_O_RENAME = re.compile(r"^\s*RENAME\s+TABLE\s+(.*)$", re.I | re.S)
_O_PAIR = re.compile(_O_NAME + r"\s+TO\s+" + _O_NAME, re.I)


def _oracle_ddl_effects(statement: str):
    """Yield ('truncate', repo) / ('rename', old, new) for one QUERY
    payload; ALTER/CREATE/txn-control have no state effect."""
    for part in statement.split(";"):
        s = part.strip()
        if not s:
            continue
        m = _O_TRUNC.match(s) or _O_DROP.match(s)
        if m:
            yield ("truncate", m.group(1))
            continue
        m = _O_RENAME.match(s)
        if m:
            for seg in m.group(1).split(","):
                pm = _O_PAIR.search(seg)
                if pm:
                    yield ("rename", pm.group(1), pm.group(2))


def replay_oracle(events: Iterable[Mapping]) -> dict[tuple[str, str], dict]:
    """Apply events (dicts with the EVENT_SCHEMA fields, already seq-ordered)
    to an in-memory table keyed by (repo, path); returns final state."""
    state: dict[tuple[str, str], dict] = {}
    for ev in events:
        key = (ev["repo"], ev["path"])
        op = ev["op"]
        if op == "I":
            state[key] = {
                "commit": ev["commit"],
                "lang": ev["lang"],
                "content": ev["content"],
            }
        elif op == "U":
            npath = ev.get("new_path")
            if npath is not None and not (isinstance(npath, float)):
                # key-changing update: delete old key, insert under new key
                # (reference: backup/binlog/repl.go:210-235)
                state.pop(key, None)
                key = (ev["repo"], npath)
            state[key] = {
                "commit": ev["commit"],
                "lang": ev["lang"],
                "content": ev["content"],
            }
        elif op == "D":
            state.pop(key, None)
        elif op == "Q":
            # DDL: truncate/drop clears the repo's keys; rename re-keys
            # them (last-writer-wins if the target somehow collides)
            for eff in _oracle_ddl_effects(ev.get("statement") or ""):
                if eff[0] == "truncate":
                    for k in [k for k in state if k[0] == eff[1]]:
                        del state[k]
                else:
                    _, old, new = eff
                    for k in [k for k in state if k[0] == old]:
                        state[(new, k[1])] = state.pop(k)
        else:  # pragma: no cover
            raise ValueError(f"bad op {op!r}")
    return state


def snapshot_to_pandas(state: dict[tuple[str, str], dict]) -> pd.DataFrame:
    rows = []
    for (repo, path), v in state.items():
        content = v["content"]
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": v["commit"],
                "lang": v["lang"],
                "content": content,
                "content_sha256": hashlib.sha256(content.encode()).hexdigest()
                if content is not None
                else None,
            }
        )
    df = pd.DataFrame(rows, columns=SNAPSHOT_COLUMNS)
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def oracle_snapshot_from_pandas(events_df: pd.DataFrame) -> pd.DataFrame:
    """events pandas DataFrame (any order) -> expected final snapshot."""
    ordered = events_df.sort_values("seq")
    recs = ordered.to_dict("records")
    for r in recs:  # normalize pandas NaN -> None
        for k, v in list(r.items()):
            if isinstance(v, float) and pd.isna(v):
                r[k] = None
    return snapshot_to_pandas(replay_oracle(recs))

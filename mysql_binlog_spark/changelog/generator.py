"""Deterministic, seeded change-event stream generator.

Produces the changelog table of BASELINE.json's input_hint —
``(seq, repo, path, op, commit, lang, content, before_content, new_path)``
— with the validity constraints a real MySQL binlog row-event stream obeys
(reference semantics: backup/binlog/repl.go:144-236):

- the first event for a dead key is 'I' (WRITE_ROWS);
- 'U' / 'D' (UPDATE_ROWS / DELETE_ROWS) only target live keys;
- no 'I' on a live key; 'I' after 'D' (re-insert) is allowed;
- key-changing updates ("renames") carry ``new_path`` and are semantically
  D(repo, path) + I(repo, new_path) — exactly how the reference handles a
  unique-key-changing UPDATE (backup/binlog/repl.go:210-235);
- ``lang`` is NULL for seq < evolution_seq and populated after — the
  additive schema-evolution case (SURVEY.md §2.9 T8);
- repos are skewed: ``hot_frac`` of repos receive ``hot_weight`` of events
  (the per-table hot-spot the reference serializes on a single goroutine,
  backup/handler/merge.go:236-238 — the thing our salting must beat).

Everything is a pure function of (spec.seed, spec.n_events): re-running is
bit-identical, which is what makes resume / exactly-once tests hermetic.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from random import Random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EVENT_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64(), nullable=False),
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("op", pa.string(), nullable=False),  # 'I' | 'U' | 'D' | 'Q'
        pa.field("commit", pa.string(), nullable=False),  # 40-hex
        pa.field("lang", pa.string(), nullable=True),
        pa.field("content", pa.string(), nullable=True),  # null when op='D'
        pa.field("before_content", pa.string(), nullable=True),  # null when op='I'
        pa.field("new_path", pa.string(), nullable=True),  # non-null on rename
        pa.field("statement", pa.string(), nullable=True),  # non-null when op='Q'
    ]
)

_EXTENSIONS = [
    ("py", "python"),
    ("go", "go"),
    ("rs", "rust"),
    ("java", "java"),
    ("md", "markdown"),
    ("c", "c"),
]


@dataclass(frozen=True)
class ChangelogSpec:
    n_events: int
    seed: int = 42
    n_repos: int = 50
    hot_frac: float = 0.2  # fraction of repos that are "hot"
    hot_weight: float = 0.8  # fraction of events landing on hot repos
    evolution_frac: float = 0.5  # seq >= n_events*evolution_frac carry lang
    p_insert: float = 0.50
    p_update: float = 0.35
    p_delete: float = 0.10
    p_rename: float = 0.05
    #: probability a slot becomes a DDL QUERY event (op='Q'): TRUNCATE /
    #: DROP TABLE / RENAME TABLE (repo-level) / ALTER noise, with the
    #: statement rendered in the format variants the reference's regex
    #: layer must handle (common/regx/regular_test.go). 0 by default so
    #: non-DDL fixtures/benches are unchanged.
    p_ddl: float = 0.0

    @property
    def evolution_seq(self) -> int:
        return int(self.n_events * self.evolution_frac)


def _commit_for(seed: int, seq: int) -> str:
    return hashlib.sha1(f"{seed}:{seq}".encode()).hexdigest()


def _content_for(repo: str, path: str, commit: str, version: int) -> str:
    # Deterministic ~130-char payload; varied per (key, version).
    return f"// {repo}/{path} rev{version}\n{commit}\n{commit[::-1]}\n{commit[:20]}*{version}\n"


def _lang_for(path: str) -> str:
    ext = path.rsplit(".", 1)[-1]
    for e, lang in _EXTENSIONS:
        if e == ext:
            return lang
    return "text"


class _KeyState:
    """O(1) sample/add/remove over the live-key set (list + index map)."""

    __slots__ = ("keys", "pos", "content", "version")

    def __init__(self) -> None:
        self.keys: list[tuple[str, str]] = []
        self.pos: dict[tuple[str, str], int] = {}
        self.content: dict[tuple[str, str], str] = {}
        self.version: dict[tuple[str, str], int] = {}

    def add(self, k: tuple[str, str], content: str, version: int) -> None:
        self.pos[k] = len(self.keys)
        self.keys.append(k)
        self.content[k] = content
        self.version[k] = version

    def remove(self, k: tuple[str, str]) -> None:
        i = self.pos.pop(k)
        last = self.keys.pop()
        if last != k:
            self.keys[i] = last
            self.pos[last] = i
        del self.content[k]
        del self.version[k]

    def sample(self, rnd: Random) -> tuple[str, str]:
        return self.keys[rnd.randrange(len(self.keys))]

    def __len__(self) -> int:
        return len(self.keys)


def iter_event_batches(spec: ChangelogSpec, batch_size: int = 1_000_000):
    """Yield pyarrow RecordBatches of events in strict seq order."""
    rnd = Random(spec.seed)
    n_hot = max(1, int(spec.n_repos * spec.hot_frac))
    repos = [f"repo-{i:04d}" for i in range(spec.n_repos)]
    hot, cold = repos[:n_hot], repos[n_hot:] or repos[:1]

    state = _KeyState()
    path_counter: dict[str, int] = {}
    dead_pool: list[tuple[str, str]] = []  # candidates for re-insert
    renamed_counter = 0

    cols: dict[str, list] = {name: [] for name in EVENT_SCHEMA.names}

    def new_path(repo: str) -> str:
        # skip names that are currently live: a renamed-away repo takes its
        # path counter with it, so an implicitly re-created repo (dead-key
        # re-insert) restarts numbering and could otherwise collide
        while True:
            c = path_counter.get(repo, 0)
            path_counter[repo] = c + 1
            ext = _EXTENSIONS[c % len(_EXTENSIONS)][0]
            p = f"src/dir{c % 7}/file_{c:06d}.{ext}"
            if (repo, p) not in state.pos:
                return p

    def emit(seq, repo, path, op, commit, lang, content, before, npath, stmt=None):
        cols["seq"].append(seq)
        cols["repo"].append(repo)
        cols["path"].append(path)
        cols["op"].append(op)
        cols["commit"].append(commit)
        cols["lang"].append(lang)
        cols["content"].append(content)
        cols["before_content"].append(before)
        cols["new_path"].append(npath)
        cols["statement"].append(stmt)

    def fmt_table(repo: str) -> str:
        """Render a table name in one of the quoting/qualification variants
        the reference's regex layer handles (regular_test.go cases)."""
        style = rnd.randrange(6)
        return [
            f"`{repo}`",
            repo,
            f"main.{repo}",
            f"`main`.`{repo}`",
            f"`main.{repo}`",
            f"main.`{repo}`",
        ][style]

    def truncate_repo_state(repo: str) -> None:
        for k in [k for k in state.keys if k[0] == repo]:
            state.remove(k)
            dead_pool.append(k)

    def rename_repo_state(old: str, new: str) -> None:
        for k in [k for k in state.keys if k[0] == old]:
            content, ver = state.content[k], state.version[k]
            state.remove(k)
            state.add((new, k[1]), content, ver)
        for lst in (hot, cold):
            if old in lst:
                lst[lst.index(old)] = new
        if old in path_counter:
            path_counter[new] = path_counter.pop(old)

    def emit_ddl(seq: int, commit: str) -> None:
        nonlocal renamed_counter
        live_repos = sorted({k[0] for k in state.keys})
        target = rnd.choice(live_repos) if live_repos else rnd.choice(hot + cold)
        choice = rnd.random()
        if choice < 0.30:  # TRUNCATE
            stmt = rnd.choice(["TRUNCATE TABLE ", "truncate ", "TRUNCATE  TABLE  "])
            stmt += fmt_table(target)
            truncate_repo_state(target)
        elif choice < 0.45:  # DROP
            stmt = rnd.choice(
                ["DROP TABLE ", "drop table ", "DROP TABLE IF EXISTS ",
                 "DROP   table  if exists "]
            )
            stmt += fmt_table(target)
            if rnd.random() < 0.3:
                stmt += " /* generated by server */"
            truncate_repo_state(target)
        elif choice < 0.70:  # RENAME (sometimes multi-pair)
            pairs = []
            n_pairs = 2 if (rnd.random() < 0.3 and len(live_repos) >= 2) else 1
            olds = rnd.sample(live_repos, n_pairs) if live_repos else [target]
            for old in olds[:n_pairs]:
                new = f"repo-rn{renamed_counter:04d}"
                renamed_counter += 1
                pairs.append(f"{fmt_table(old)} TO {fmt_table(new)}")
                rename_repo_state(old, new)
            head = rnd.choice(["RENAME TABLE ", "rename table ", "RENAME  TABLE "])
            stmt = head + ", ".join(pairs)
        else:  # barrier-only noise: per-table (ALTER/CREATE/CREATE INDEX)
            # and table-less 'public'-stream statements (CREATE DATABASE /
            # GRANT / ANALYZE) that the engine must carry as global
            # barriers, never drop (recover/main.go:148-181)
            stmt = rnd.choice(
                [
                    f"ALTER TABLE {fmt_table(target)} ADD `lang` VARCHAR(32) NULL",
                    f"ALTER TABLE {fmt_table(target)} ADD COLUMN score INT DEFAULT 0",
                    f"CREATE TABLE IF NOT EXISTS {fmt_table(target)} (`id` bigint(20) NOT NULL)",
                    f"CREATE INDEX k_1 ON {fmt_table(target)}(path)",
                    "CREATE DATABASE IF NOT EXISTS archive",
                    "GRANT SELECT ON main.* TO 'replica'@'%'",
                    f"ANALYZE TABLE {fmt_table(target)}",
                ]
            )
        # multi-statement form: occasionally bundle a txn-control no-op or
        # a second harmless DDL in the same QUERY event (reference splits
        # on ';', backup/handler/merge.go:147-166)
        if rnd.random() < 0.2:
            stmt = rnd.choice(
                [
                    stmt + f"; ALTER TABLE {fmt_table(target)} ADD x INT",
                    "SAVEPOINT sp1; " + stmt,
                ]
            )
        emit(seq, target, "", "Q", commit, None, None, None, None, stmt)

    p_ddl = spec.p_ddl
    for seq in range(spec.n_events):
        commit = _commit_for(spec.seed, seq)
        r = rnd.random()
        if len(state) == 0:
            op = "I"
        elif r < p_ddl:
            op = "Q"
        elif r < p_ddl + spec.p_insert:
            op = "I"
        elif r < p_ddl + spec.p_insert + spec.p_update:
            op = "U"
        elif r < p_ddl + spec.p_insert + spec.p_update + spec.p_delete:
            op = "D"
        else:
            op = "R"  # rename: emitted as op='U' with new_path

        if op == "Q":
            emit_ddl(seq, commit)
        elif op == "I":
            repo = rnd.choice(hot) if rnd.random() < spec.hot_weight else rnd.choice(cold)
            if dead_pool and rnd.random() < 0.2:
                key = dead_pool.pop(rnd.randrange(len(dead_pool)))
                if key in state.pos:  # re-inserted already
                    key = (repo, new_path(repo))
            else:
                key = (repo, new_path(repo))
            version = 0
            content = _content_for(key[0], key[1], commit, version)
            lang = _lang_for(key[1]) if seq >= spec.evolution_seq else None
            emit(seq, key[0], key[1], "I", commit, lang, content, None, None)
            state.add(key, content, version)
        elif op == "U":
            key = state.sample(rnd)
            before = state.content[key]
            version = state.version[key] + 1
            content = _content_for(key[0], key[1], commit, version)
            lang = _lang_for(key[1]) if seq >= spec.evolution_seq else None
            emit(seq, key[0], key[1], "U", commit, lang, content, before, None)
            state.content[key] = content
            state.version[key] = version
        elif op == "D":
            key = state.sample(rnd)
            before = state.content[key]
            emit(seq, key[0], key[1], "D", commit, None, None, before, None)
            state.remove(key)
            dead_pool.append(key)
            if len(dead_pool) > 10_000:
                dead_pool = dead_pool[-5_000:]
        else:  # rename
            key = state.sample(rnd)
            before = state.content[key]
            repo = key[0]
            npath = new_path(repo)
            version = state.version[key] + 1
            commit2 = commit
            content = _content_for(repo, npath, commit2, version)
            lang = _lang_for(npath) if seq >= spec.evolution_seq else None
            emit(seq, repo, key[1], "U", commit2, lang, content, before, npath)
            state.remove(key)
            state.add((repo, npath), content, version)

        if len(cols["seq"]) >= batch_size:
            yield pa.RecordBatch.from_pydict(cols, schema=EVENT_SCHEMA)
            cols = {name: [] for name in EVENT_SCHEMA.names}

    if cols["seq"]:
        yield pa.RecordBatch.from_pydict(cols, schema=EVENT_SCHEMA)


def generate_events_pandas(spec: ChangelogSpec) -> pd.DataFrame:
    """Small-scale convenience: full event table as pandas (tests/oracle)."""
    batches = list(iter_event_batches(spec))
    return pa.Table.from_batches(batches, schema=EVENT_SCHEMA).to_pandas()


def write_events_parquet(
    spec: ChangelogSpec, out_path: str, row_group_size: int = 1_000_000
) -> int:
    """Stream events to a parquet file; returns event count.

    Row groups of 1M rows keep parquet min/max stats on ``seq`` tight so
    the engine's per-epoch ``seq BETWEEN`` filters prune row groups at scan
    time (the Spark analog of the reference's file-range selection before
    download, common/client/cfs.go:365-418).
    """
    n = 0
    with pq.ParquetWriter(out_path, EVENT_SCHEMA, compression="zstd") as w:
        for batch in iter_event_batches(spec, batch_size=row_group_size):
            w.write_batch(batch)
            n += batch.num_rows
    return n


def write_events_parquet_dir(
    spec: ChangelogSpec,
    out_dir: str,
    events_per_file: int = 125_000,
    row_group_size: int = 31_250,
) -> int:
    """Stream events to a DIRECTORY of seq-ordered parquet files.

    This is the realistic landing shape (compacted binlog chunks arriving on
    shared storage, reference common/client/cfs.go:39-171) and what the scan
    parallelism needs: one ~10-25 MB file per chunk lets Spark assign one
    task per file instead of serializing a single big file onto 2-3 tasks.
    Small row groups keep seq min/max stats tight for per-epoch pruning.

    DDL (op='Q') rows are ADDITIONALLY copied to ``<dir>/_ddl.parquet`` —
    the landing-time side stream (the reference keeps its DDL/'public'
    stream as separate files too, recover/main.go:148-181). The leading
    underscore hides it from Spark's directory scan, and the planner's
    ``extract_ddl_ops_for_path`` reads the tiny side file instead of
    pushing an op='Q' filter through every changelog footer per ingest
    cycle.
    """
    import os

    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    file_idx = 0
    writer: pq.ParquetWriter | None = None
    in_file = 0
    ddl_batches = []
    max_seq = -1
    n_files = 0
    for batch in iter_event_batches(spec, batch_size=row_group_size):
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(out_dir, f"part-{file_idx:05d}.parquet"),
                EVENT_SCHEMA,
                compression="zstd",
            )
            n_files += 1
        writer.write_batch(batch)
        q = batch.filter(pc.equal(batch.column("op"), "Q"))
        if q.num_rows:
            ddl_batches.append(q)
        n += batch.num_rows
        in_file += batch.num_rows
        max_seq = max(max_seq, pc.max(batch.column("seq")).as_py())
        if in_file >= events_per_file:
            writer.close()
            writer = None
            in_file = 0
            file_idx += 1
    if writer is not None:
        writer.close()
    # Side-file completeness stamp: the landing state (part-file count +
    # max landed seq) it was derived from. extract_ddl_ops_for_path
    # cross-checks this against the directory and falls back to the full
    # scan when files landed AFTER the side file was written — a stale
    # side stream must degrade to the slow path, never drop a barrier.
    side = (
        pa.Table.from_batches(ddl_batches, schema=EVENT_SCHEMA)
        if ddl_batches
        else EVENT_SCHEMA.empty_table()
    ).replace_schema_metadata(
        {"n_event_files": str(n_files), "max_seq": str(max_seq)}
    )
    pq.write_table(
        side, os.path.join(out_dir, "_ddl.parquet"), compression="zstd"
    )
    return n

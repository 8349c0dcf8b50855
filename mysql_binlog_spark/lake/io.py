"""Pluggable table-metadata I/O — the storage interface behind LakeTable.

The reference abstracts storage behind ``IFile``/``IClient``
(common/inter/store.go:10-24) so backup/merge/recover run against CFS or
local disk unchanged. Our analog: LakeTable's *data* files already go
through Spark's Hadoop filesystem layer; this module routes the remaining
driver-side metadata operations (manifest create, listing, vacuum deletes)
through the same kind of interface, so the commit protocol works on
local disk, HDFS, or any Hadoop-FS-compatible store.

Commit-protocol note (why there is no "current pointer" file): the commit
linearization point is the **atomic exclusive create of the manifest file
itself** (``v{N+1}.json``); the current version is the highest committed
manifest. This is exactly Iceberg's rename-if-absent metadata commit on
HDFS. Exclusive create is atomic on POSIX (O_EXCL) and on HDFS
(create(path, overwrite=false)); object stores without atomic
create-if-absent (plain S3) need a conditional-put or a lock service —
the seam to add one is ``create_exclusive``.
"""

from __future__ import annotations

import os
import uuid


class LocalTableIO:
    """POSIX-filesystem implementation (the default)."""

    def normalize_root(self, root: str) -> str:
        # realpath: manifest-recorded paths must compare equal across
        # relative/absolute/symlinked spellings of the same table root,
        # and the JVM write path must agree with driver-side listings.
        return os.path.realpath(root)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def create_exclusive(self, path: str, data: str) -> None:
        """Atomically create ``path`` with ``data``; FileExistsError if it
        already exists. THE commit linearization point."""
        with open(path, "x") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())

    def list_names(self, dirpath: str) -> list[str]:
        try:
            return os.listdir(dirpath)
        except FileNotFoundError:
            return []

    def walk_files(self, root: str, suffix: str = ".parquet") -> list[str]:
        out: list[str] = []
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                if fn.endswith(suffix):
                    out.append(os.path.join(dirpath, fn))
        return out

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)


class HadoopTableIO:
    """Hadoop-FileSystem implementation (hdfs://, file://, s3a://, ...).

    Driver-side metadata ops go through the JVM's
    ``org.apache.hadoop.fs.FileSystem`` — the same FS layer Spark's
    executors use for the data files, so one storage config covers both.

    ``create_exclusive`` maps to ``FileSystem.create(path, overwrite=false)``
    which is atomic on HDFS; on S3A it is check-then-create (document /
    replace with an S3 conditional-put for strict multi-writer safety —
    single-writer-per-table deployments are safe as-is).
    """

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._path(p).getFileSystem(self._conf)

    def normalize_root(self, root: str) -> str:
        # qualify with scheme+authority so recorded paths are stable no
        # matter how the caller spelled the root
        jp = self._path(root)
        fs = jp.getFileSystem(self._conf)
        return fs.makeQualified(jp).toString()

    def makedirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def read_text(self, path: str) -> str:
        fs = self._fs(path)
        jp = self._path(path)
        if not fs.exists(jp):
            raise FileNotFoundError(path)
        stream = fs.open(jp)
        try:
            util = self._jvm.org.apache.commons.io.IOUtils
            return util.toString(stream, "UTF-8")
        finally:
            stream.close()

    def create_exclusive(self, path: str, data: str) -> None:
        fs = self._fs(path)
        jp = self._path(path)
        try:
            out = fs.create(jp, False)  # overwrite=false: atomic on HDFS
        except Exception as e:  # py4j wraps FileAlreadyExistsException
            if "AlreadyExists" in str(e) or "already exists" in str(e):
                raise FileExistsError(path) from e
            raise
        try:
            out.write(bytearray(data.encode("utf-8")))
            out.hflush()
        finally:
            out.close()

    def list_names(self, dirpath: str) -> list[str]:
        fs = self._fs(dirpath)
        jp = self._path(dirpath)
        if not fs.exists(jp):
            return []
        return [st.getPath().getName() for st in fs.listStatus(jp)]

    def walk_files(self, root: str, suffix: str = ".parquet") -> list[str]:
        fs = self._fs(root)
        jp = self._path(root)
        if not fs.exists(jp):
            return []
        out: list[str] = []
        it = fs.listFiles(jp, True)  # recursive
        while it.hasNext():
            p = it.next().getPath().toString()
            if p.endswith(suffix):
                out.append(p)
        return out

    def delete(self, path: str) -> None:
        self._fs(path).delete(self._path(path), False)

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._path(path))

    def isdir(self, path: str) -> bool:
        fs = self._fs(path)
        jp = self._path(path)
        return fs.exists(jp) and fs.getFileStatus(jp).isDirectory()


def io_for_root(spark, root: str):
    """Pick the IO impl from the root's scheme: plain paths -> POSIX;
    any URI scheme (file://, hdfs://, s3a://...) -> Hadoop FS."""
    if "://" in root or root.startswith("file:/"):
        return HadoopTableIO(spark)
    return LocalTableIO()

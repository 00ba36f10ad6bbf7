"""Data-plane filesystem access for LakeTable.

Two implementations behind one small surface:

* POSIX fast path (default for plain local paths) — ``os`` calls.
* Hadoop FileSystem (for ``file:``/``hdfs:``/``s3a:``/... URI roots) —
  the SAME filesystem layer Spark's executors write Parquet through,
  reached from the driver over the live session's JVM. No extra
  dependency: if Spark can write the table's data files there, the
  driver can list and GC them there.

This is the data-plane counterpart of the metadata commit point
(:mod:`.metadata_io`): metadata wants an atomic CAS (catalog /
conditional PUT), while the data plane only needs list/delete —
which Hadoop FS gives uniformly for every scheme Spark supports.

Footer-dependent niceties (per-bucket row counts in lineage, the
auto-salt signal derived from them) read local Parquet footers and
degrade gracefully on URI roots: lineage falls back to the in-plan
winner counts and auto-salt simply doesn't engage (documented in
RunnerConfig).
"""

from __future__ import annotations

import os


def is_uri(root: str) -> bool:
    return "://" in root or root.startswith("file:")


class PosixDataFS:
    """Local-path fast path."""

    def list_names(self, dirpath: str) -> list[str]:
        try:
            return sorted(os.listdir(dirpath))
        except FileNotFoundError:
            return []

    def list_files_recursive(self, dirpath: str) -> list[str]:
        out = []
        for dp, _dirs, files in os.walk(dirpath):
            out.extend(os.path.join(dp, f) for f in files)
        return sorted(out)

    def delete(self, path: str) -> None:
        os.remove(path)

    def cleanup_empty_dirs(self, dirpath: str) -> None:
        for dp, _dirs, _files in os.walk(dirpath, topdown=False):
            try:
                os.rmdir(dp)
            except OSError:
                pass

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)


class HadoopDataFS:
    """URI roots, via the session JVM's Hadoop FileSystem — the exact
    filesystem the executors wrote through."""

    def __init__(self, spark, root_uri: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI(root_uri), self._conf
        )

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def list_names(self, dirpath: str) -> list[str]:
        p = self._path(dirpath)
        if not self._fs.exists(p):
            return []
        return sorted(s.getPath().getName() for s in self._fs.listStatus(p))

    def list_files_recursive(self, dirpath: str) -> list[str]:
        p = self._path(dirpath)
        if not self._fs.exists(p):
            return []
        out = []
        it = self._fs.listFiles(p, True)
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return sorted(out)

    def delete(self, path: str) -> None:
        self._fs.delete(self._path(path), False)

    def cleanup_empty_dirs(self, dirpath: str) -> None:
        pass  # object stores have no empty dirs; Hadoop FS tolerates them

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._path(path))

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._path(path)).getLen())


def data_fs(spark, root: str):
    return HadoopDataFS(spark, root) if is_uri(root) else PosixDataFS()

"""Pluggable metadata IO for :class:`~..lake.table.LakeTable` — the
table's *commit point*.

A LakeTable commit is: write an immutable snapshot manifest, then
atomically swap the VERSION pointer. Everything that must be shared
across drivers for a multi-writer-safe / multi-driver deployment goes
through this interface; the DATA files are written by executors through
Spark's own Hadoop-filesystem layer and never touch it.

Reference analog: the reference's shared commit point is its Postgres
database (``application.properties:1-7`` — every loader node talks to
the same DB); here the equivalent seam is this protocol. Deployments
choose an implementation:

* :class:`PosixMetadataIO` (default) — local disk or a shared POSIX
  mount (NFS/EFS). Atomicity via write-temp + ``os.rename``.
* :class:`HadoopMetadataIO` — any Hadoop-FileSystem URI (``file:``,
  ``hdfs:``, ``s3a:``, ...), reached through the live Spark session's
  JVM (the same filesystem layer the executors write Parquet through).
  Atomicity via ``FileContext.rename`` with ``Options.Rename``:
  ``OVERWRITE`` for the pointer swap, ``NONE`` for the claim — both
  server-side atomic on HDFS. On S3A, rename is copy+delete and the
  existence check in NONE-rename is not atomic — for object stores
  prefer a conditional-PUT / catalog client implementing this same
  protocol.
* An object-store/catalog client — S3 conditional-PUT (If-Match) for
  :meth:`~MetadataIO.swap_pointer`, or an Iceberg/Hive/Glue catalog's
  compare-and-swap table-pointer API. Not shipped here (no object
  store in this sandbox); :class:`InMemoryMetadataIO` in the tests
  proves the table runs create→merge→resume against a non-POSIX
  implementation.

Paths handed to the interface are opaque keys (POSIX-joined strings);
implementations may map them to object keys verbatim.
"""

from __future__ import annotations

import os
import re
import uuid


class MetadataIO:
    """Interface: durable small-object IO with one atomic primitive.

    ``swap_pointer`` is the single operation whose atomicity the
    exactly-once contract depends on — a torn commit must be invisible
    to readers, and (for multi-writer deployments) two concurrent swaps
    must serialize. Everything else is plain read/write/list/remove of
    small immutable JSON objects.
    """

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        """Read a small object; raises FileNotFoundError if absent."""
        raise NotImplementedError

    def write_atomic(self, path: str, text: str) -> None:
        """Durably write an immutable object (manifests are write-once;
        overwriting an identical retry is allowed)."""
        raise NotImplementedError

    def create_exclusive(self, path: str, text: str) -> bool:
        """Atomically create the object IFF it doesn't exist. Returns
        True on claim, False if something already claimed it — the
        optimistic-concurrency primitive (POSIX O_EXCL; an object
        store's If-None-Match PUT; a catalog's INSERT)."""
        raise NotImplementedError

    def swap_pointer(self, path: str, text: str) -> None:
        """Atomically replace the pointer object: readers see either
        the old or the new content, never a torn write."""
        raise NotImplementedError

    def list(self, dirpath: str) -> list[str]:
        """Names (not paths) of objects under ``dirpath``; empty list
        if the prefix doesn't exist."""
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError


class PosixMetadataIO(MetadataIO):
    """Local-disk / shared-POSIX-mount implementation (the default).

    ``swap_pointer`` = fsync'd temp file + ``os.rename`` — atomic on
    POSIX filesystems, the same primitive single-node Iceberg
    HadoopTables uses for ``version-hint.text``. ``file:`` URIs (the
    Hadoop local scheme a URI-rooted table uses for its data plane)
    are accepted and mapped to their local path; any other scheme
    needs a real object-store/catalog implementation injected."""

    @staticmethod
    def _local(path: str) -> str:
        if path.startswith("file:"):
            rest = path[len("file:"):]
            while rest.startswith("//"):
                rest = rest[1:]
            return rest
        # NB: must check the raw path — "s3a://b/x".split("/", 1)[0] is
        # "s3a:" (the first "/" belongs to "://"), which made an earlier
        # guard dead code and let non-local roots silently write to a
        # local dir literally named "s3a:".
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://", path):
            raise ValueError(
                f"PosixMetadataIO cannot serve {path!r}; inject an "
                "object-store/catalog MetadataIO for non-local roots"
            )
        return path

    def makedirs(self, path: str) -> None:
        os.makedirs(self._local(path), exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._local(path))

    def read_text(self, path: str) -> str:
        with open(self._local(path)) as f:
            return f.read()

    def _write_tmp(self, path: str, text: str) -> str:
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".{os.path.basename(path)}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        return tmp

    def write_atomic(self, path: str, text: str) -> None:
        # fsync'd temp + rename: a crash mid-write can never leave the
        # object torn (readers see old-or-new, matching the contract)
        path = self._local(path)
        os.rename(self._write_tmp(path, text), path)

    def create_exclusive(self, path: str, text: str) -> bool:
        # content lands durably in a temp file FIRST; os.link is the
        # atomic claim (EEXIST if someone else holds it) and only ever
        # publishes a complete object — a kill anywhere leaves either
        # no claim or a whole one, never a torn file
        path = self._local(path)
        tmp = self._write_tmp(path, text)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def swap_pointer(self, path: str, text: str) -> None:
        path = self._local(path)
        os.rename(self._write_tmp(path, text), path)  # atomic pointer swap

    def list(self, dirpath: str) -> list[str]:
        try:
            return sorted(os.listdir(self._local(dirpath)))
        except FileNotFoundError:
            return []

    def remove(self, path: str) -> None:
        os.remove(self._local(path))


class HadoopMetadataIO(MetadataIO):
    """Commit point on the Hadoop FileSystem API — the metadata-plane
    counterpart of ``lake/fs.py``'s :class:`HadoopDataFS`, so a URI
    table root runs BOTH planes off POSIX with no extra dependency.

    Atomicity is scheme-aware, because Hadoop's CLIENT-side rename
    paths are weaker than they look:

    * **local (``file:``) roots delegate every primitive to POSIX
      syscalls** on the mapped path. The generic ``FileContext.rename``
      on LocalFs is getFileStatus + delete + rename client-side — a
      kill in the middle leaves NO pointer, and two racing NONE-renames
      can both pass the existence check. ``os.rename`` (atomic swap),
      ``os.link`` (atomic claim, EEXIST on loss) and ``os.fsync``
      restore the exact PosixMetadataIO guarantees the chaos harness
      certifies.
    * **HDFS roots** use ``FileContext.rename(OVERWRITE|NONE)`` — both
      are NameNode-side atomic — with ``hsync()`` (not just hflush) on
      the temp write so the bytes are on-disk before publish.
    * **S3-like stores**: rename is copy+delete and NONE-rename's
      existence check is not atomic — inject a conditional-PUT /
      catalog client instead (docstring at module top).

    Reference analog: the shared DB commit point every loader node
    talks to (``application.properties:1-7``)."""

    def __init__(self, spark, root_uri: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._gw = spark.sparkContext._gateway
        conf = spark._jsc.hadoopConfiguration()
        uri = jvm.java.net.URI(root_uri)
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
        self._fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(uri, conf)
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._Rename = getattr(jvm.org.apache.hadoop.fs.Options, "Rename")
        # file: scheme -> POSIX syscalls for the atomic primitives (see
        # class docstring); the delegate maps file:/x paths itself
        self._posix = (
            PosixMetadataIO() if str(self._fs.getScheme()) == "file" else None
        )

    def _rename(self, src: str, dst: str, opt) -> None:
        arr = self._gw.new_array(self._Rename, 1)
        arr[0] = opt
        self._fc.rename(self._Path(src), self._Path(dst), arr)

    def _write_tmp(self, path: str, text: str) -> str:
        tmp = f"{os.path.dirname(path)}/.{os.path.basename(path)}.{uuid.uuid4().hex}"
        out = self._fs.create(self._Path(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
            out.hsync()  # persistence barrier; hflush alone is memory-only
        finally:
            out.close()
        return tmp

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def read_text(self, path: str) -> str:
        p = self._Path(path)
        try:
            stream = self._fs.open(p)
        except Exception as e:
            # no TOCTOU exists() probe: map the (possibly concurrent)
            # miss to the typed error the Posix contract promises
            if "FileNotFoundException" in str(e):
                raise FileNotFoundError(path) from None
            raise
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def write_atomic(self, path: str, text: str) -> None:
        if self._posix is not None:
            self._posix.write_atomic(path, text)
            return
        self._rename(self._write_tmp(path, text), path, self._Rename.OVERWRITE)

    def create_exclusive(self, path: str, text: str) -> bool:
        if self._posix is not None:
            return self._posix.create_exclusive(path, text)
        tmp = self._write_tmp(path, text)
        try:
            self._rename(tmp, path, self._Rename.NONE)
            return True
        except Exception as e:  # py4j-wrapped FileAlreadyExistsException
            if "FileAlreadyExistsException" in str(e):
                try:
                    self._fs.delete(self._Path(tmp), False)
                except Exception:
                    pass  # orphan temp: invisible (dot-prefixed), GC'able
                return False
            raise

    def swap_pointer(self, path: str, text: str) -> None:
        self.write_atomic(path, text)  # same primitive, distinct contract

    def list(self, dirpath: str) -> list[str]:
        p = self._Path(dirpath)
        if not self._fs.exists(p):
            return []
        return sorted(s.getPath().getName() for s in self._fs.listStatus(p))

    def remove(self, path: str) -> None:
        p = self._Path(path)
        if not self._fs.delete(p, False):
            # delete()==False is ambiguous in the Hadoop API: the path
            # may be gone (missing — POSIX contract says raise
            # FileNotFoundError) or still present (permissions /
            # transient FS failure). Swallowing the latter would let
            # vacuum believe a superseded manifest was removed when it
            # was not.
            if not self._fs.exists(p):
                raise FileNotFoundError(path)
            raise OSError(f"delete failed but path still exists: {path}")


class InMemoryMetadataIO(MetadataIO):
    """Dict-backed non-POSIX implementation — the test double standing
    in for an object-store/catalog commit point. Shared by handing the
    same ``store`` dict to several LakeTable handles (the way several
    drivers would share one catalog)."""

    def __init__(self, store: dict[str, str] | None = None):
        self.store: dict[str, str] = store if store is not None else {}
        self.swaps = 0  # observability for tests

    def makedirs(self, path: str) -> None:
        pass  # keyspace is flat

    def exists(self, path: str) -> bool:
        return path in self.store

    def read_text(self, path: str) -> str:
        if path not in self.store:
            raise FileNotFoundError(path)
        return self.store[path]

    def write_atomic(self, path: str, text: str) -> None:
        self.store[path] = text

    def create_exclusive(self, path: str, text: str) -> bool:
        if path in self.store:
            return False
        self.store[path] = text
        return True

    def swap_pointer(self, path: str, text: str) -> None:
        self.swaps += 1
        self.store[path] = text  # dict assignment is the CAS stand-in

    def list(self, dirpath: str) -> list[str]:
        prefix = dirpath.rstrip("/") + "/"
        return sorted(
            {k[len(prefix):].split("/", 1)[0] for k in self.store if k.startswith(prefix)}
        )

    def remove(self, path: str) -> None:
        self.store.pop(path, None)

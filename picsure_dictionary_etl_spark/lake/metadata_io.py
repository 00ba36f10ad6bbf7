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

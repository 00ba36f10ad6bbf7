"""Structured-Streaming SINK for the lake: ``writeStream.format("lake")``.

Completes the DataSource symmetry with the ``lake_cdf`` source — a
stream of change events (key + payload + ``_op`` + ``_lsn``) lands in a
LakeTable as per-epoch merge-on-read delta appends with an atomic
manifest commit, no ``foreachBatch`` glue::

    spark.dataSource.register(LakeTableSinkDataSource)
    (df.writeStream.format("lake").option("path", table_root)
       .option("checkpointLocation", ckpt).start())

``spark.read``'s batch twin (``df.write.format("lake").mode("append")``)
applies one batch the same way.

Semantics — an append-only CDC ingest (the MOR fast path):

* **Rows append as per-bucket delta files**; readers resolve LWW at
  read time exactly like every other MOR write. No LWW reduce runs in
  the sink (a Python datasource writer cannot shuffle), so one key may
  appear in several epochs' files — ``resolve_live`` picks the winner
  by ``(_lsn, tie-hash)`` regardless. Compaction happens on the next
  ``merge_into`` touching the bucket, or via table maintenance.
* **Bucket placement is exact**: if the stream carries a ``_bucket``
  column (add it JVM-side with :func:`with_bucket` — recommended), the
  sink trusts it; otherwise each executor computes
  ``pmod(xxhash64(bucket_by), bucket_count)`` with the engine's
  bit-equal Python twin (per-row Python — fine for modest streams,
  the documented slow path at scale).
* **Exactly-once on the resolved state** (the engine's standard
  model): executors drop rows at-or-below the table's committed
  watermark (read per task from the manifest, version-cached per
  worker process), so a replayed epoch re-writes nothing; the driver
  commit carries a batch id (``sink-<sinkid>-<epoch>``) through the
  lake's applied-batch dedup, so a retried COMMIT of the same epoch is
  a committed no-op. Crash between data write and manifest commit
  leaves unreferenced orphan files that ``vacuum`` GCs — identical to
  the engine's merge path. Non-monotone sources note: like
  ``merge_into``, a late row with ``_lsn`` ≤ the watermark is dropped
  (stale inserts must never resurrect physical deletes).
* **Empty epochs commit nothing** — no version churn on idle streams.
* **Composes with the source**: appends change bucket file lists, so
  ``table_changes`` and a downstream ``lake_cdf`` stream see exactly
  the resolved-state diff.

v1 seams (typed errors at plan time): POSIX table roots only (the
driver-side commit runs in a plain Python worker — no JVM for
HadoopMetadataIO; the pyarrow.fs data plane could lift this like the
source's, the COMMIT point is the hard part on object stores),
row-policy tables only (field-wise ``_pu`` deltas carry marker
semantics the sink does not synthesize), append mode only.

Reference analog: the reference's core is exactly this sink — JDBC
``ON CONFLICT`` upserts (``loading/service/ColumnMetaMapper.java``) —
re-expressed as snapshot-committed bucket appends.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

from picsure_dictionary_etl_spark.lake.table import (
    BUCKET_COL,
    META_DIR,
    VERSION_FILE,
    LakeTable,
    Snapshot,
)

OP_COL = "_op"
LSN_COL = "_lsn"


@dataclass
class _SinkCommit(WriterCommitMessage):
    files: dict = field(default_factory=dict)  # bucket -> [rel paths]
    sizes: dict = field(default_factory=dict)  # rel path -> bytes
    rows: int = 0
    max_lsn: int | None = None
    dropped_stale: int = 0


def _is_uri(root: str) -> bool:
    return "://" in root or root.startswith("file:")


def _posix_root(root: str) -> str:
    """Strip a ``file:`` scheme (a file: URI IS a POSIX path) — shared
    by the writer and :func:`with_bucket` so both accept the same root
    strings."""
    if root.startswith("file:"):
        p = root[5:]
        root = "/" + p.lstrip("/") if p.startswith("/") else p
    return root


def _read_meta_text(root: str, *rel: str) -> str:
    from picsure_dictionary_etl_spark.lake.metadata_io import PosixMetadataIO

    return PosixMetadataIO().read_text(os.path.join(root, META_DIR, *rel))


# worker-process cache: root -> (version, watermark). VERSION is a tiny
# read per task; the manifest (O(files) JSON) re-reads only when the
# version moved.
_WM_CACHE: dict = {}


def _current_watermark(root: str) -> int:
    v = int(_read_meta_text(root, VERSION_FILE).strip())
    hit = _WM_CACHE.get(root)
    if hit is not None and hit[0] == v:
        return hit[1]
    snap = Snapshot.from_json(_read_meta_text(root, f"snap-{v:08d}.json"))
    wm = int(snap.properties.get("watermark_lsn", -1))
    _WM_CACHE[root] = (v, wm)
    return wm


class _LakeSinkWriter(DataSourceStreamArrowWriter):
    """Executor write + driver commit for the ``lake`` sink (doubles as
    the batch writer through :class:`_LakeBatchWriter`)."""

    def __init__(self, options, schema, overwrite: bool):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("lake sink requires .option('path', <table_root>)")
        self.root = _posix_root(self.root)
        if _is_uri(self.root):
            raise NotImplementedError(
                "lake sink v1 commits through PosixMetadataIO (datasource "
                "callbacks have no JVM for the Hadoop commit point); use "
                "foreachBatch + merge_into for non-file URI table roots"
            )
        if overwrite:
            raise NotImplementedError(
                "lake sink supports append output only; use "
                "LakeTable.truncate() + append for a full rewrite"
            )
        self.root = os.path.abspath(self.root)
        snap = LakeTable(None, self.root).current()
        tschema = snap.schema
        names = {f.name for f in tschema.fields}
        if "_pu" in names or "_del_lsn" in names:
            raise NotImplementedError(
                "lake sink v1 appends row-policy deltas; table "
                f"{self.root} carries field-wise history (_pu) — use "
                "merge_into(update_policy=...) for partial updates"
            )
        want = {f.name: f.dataType.simpleString() for f in tschema.fields}
        got = {f.name: f.dataType.simpleString() for f in schema.fields}
        extra_bucket = got.pop(BUCKET_COL, None)
        if extra_bucket not in (None, "int", "bigint"):
            raise ValueError(
                f"lake sink: {BUCKET_COL} must be int/bigint, got "
                f"{extra_bucket}"
            )
        if got != want:
            raise ValueError(
                f"lake sink: input columns {sorted(got.items())} must "
                f"match table schema {sorted(want.items())} exactly "
                f"(plus an optional precomputed {BUCKET_COL} — see "
                f"with_bucket())"
            )
        self.has_bucket = extra_bucket is not None
        self.cols = [f.name for f in tschema.fields]  # write order
        self.keys = snap.key_cols
        self.bucket_by = snap.bucket_by
        self.bucket_count = snap.bucket_count
        self.bucket_dtypes = [want[c] for c in snap.bucket_by]
        # per-query suffix: restarted queries get a fresh writer (and
        # suffix), so a replayed epoch is deduped by the WATERMARK
        # guard, not the batch id; the id dedups same-run commit
        # retries. .option("sinkid", ...) pins it across restarts.
        self.sinkid = options.get("sinkid") or uuid.uuid4().hex[:8]

    # ---------- executor side ----------

    def _bucket_ids(self, batch):
        """int64 numpy bucket id per row: trust a precomputed _bucket,
        else the engine's bit-equal hash twin (per-row Python — the
        documented slow path; with_bucket() keeps it JVM-side)."""
        import numpy as np

        if self.has_bucket:
            arr = batch.column(batch.schema.names.index(BUCKET_COL))
            return arr.to_numpy(zero_copy_only=False).astype("int64")
        from picsure_dictionary_etl_spark.streaming.cdf_source import (
            spark_xxhash64,
        )

        cols = [
            batch.column(batch.schema.names.index(c)).to_pylist()
            for c in self.bucket_by
        ]
        n = self.bucket_count
        return np.fromiter(
            (
                ((spark_xxhash64(vals, self.bucket_dtypes) % n) + n) % n
                for vals in zip(*cols)
            ),
            dtype="int64",
            count=batch.num_rows,
        )

    def write(self, iterator):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        wm = _current_watermark(self.root)
        per_bucket: dict[int, list] = {}
        rows = 0
        dropped = 0
        max_lsn = None
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            lsn = batch.column(batch.schema.names.index(LSN_COL))
            keep = pc.greater(lsn, pa.scalar(wm, type=lsn.type))
            kept_n = pc.sum(keep).as_py() or 0
            dropped += batch.num_rows - kept_n
            if kept_n == 0:
                continue
            if kept_n < batch.num_rows:
                batch = batch.filter(keep)
            buckets = self._bucket_ids(batch)
            tbl = pa.Table.from_batches([batch]).select(self.cols)
            m = pc.max(tbl.column(LSN_COL)).as_py()
            if m is not None:
                max_lsn = m if max_lsn is None else max(max_lsn, m)
            rows += tbl.num_rows
            # stable argsort + contiguous zero-copy slices per bucket run
            order = np.argsort(buckets, kind="stable")
            sorted_tbl = tbl.take(pa.array(order))
            sb = buckets[order]
            bounds = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1], True])
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                per_bucket.setdefault(int(sb[lo]), []).append(
                    sorted_tbl.slice(lo, hi - lo)
                )
        if not per_bucket:
            return _SinkCommit(dropped_stale=dropped)
        # attempt-unique dir per task: racing/replayed attempts can
        # never clobber committed files (the engine's data-dir rule)
        rel_dir = f"data/s-{uuid.uuid4().hex[:8]}/delta"
        files: dict[str, list[str]] = {}
        sizes: dict[str, int] = {}
        for b, tables in sorted(per_bucket.items()):
            rel = (
                f"{rel_dir}/{BUCKET_COL}={b}/"
                f"part-00000-{uuid.uuid4().hex}.zstd.parquet"
            )
            full = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            pq.write_table(
                pa.concat_tables(tables), full, compression="zstd"
            )
            files[str(b)] = [rel]
            sizes[rel] = os.path.getsize(full)
        return _SinkCommit(
            files=files, sizes=sizes, rows=rows,
            max_lsn=max_lsn, dropped_stale=dropped,
        )

    # ---------- driver side ----------

    @staticmethod
    def _pending_claim(t, version):
        """The unswapped manifest claim at ``version``, if any (a
        crashed commit's leftover); None when absent or torn."""
        path = os.path.join(t.root, META_DIR, f"snap-{version:08d}.json")
        try:
            from picsure_dictionary_etl_spark.lake.table import Snapshot

            return Snapshot.from_json(t.io.read_text(path))
        except Exception:
            return None

    def _commit(self, messages, batch_id: str, epoch=None) -> None:
        appends: dict[str, list[str]] = {}
        sizes: dict[str, int] = {}
        rows = 0
        dropped = 0
        max_lsn = None
        for m in messages:
            if m is None:
                continue
            for b, fl in m.files.items():
                appends.setdefault(b, []).extend(fl)
            sizes.update(m.sizes)
            rows += m.rows
            dropped += m.dropped_stale
            if m.max_lsn is not None:
                max_lsn = (
                    m.max_lsn if max_lsn is None else max(max_lsn, m.max_lsn)
                )
        if not appends:
            return  # empty/fully-stale epoch: no version churn
        t = LakeTable(None, self.root)
        prev = t.current()
        if batch_id in prev.properties.get("applied_batches", []):
            return  # same-run commit retry: committed no-op
        # Crashed-claim takeover (the engine rule: same-batch claim =>
        # resume): a driver killed between create_exclusive(snap-vN+1)
        # and the pointer swap leaves a claim. A RESTARTED query gets a
        # fresh random sinkid, so its batch id differs and the claim
        # compare would raise ConcurrentCommitError forever. If the
        # pending claim is a SINK commit for this same EPOCH of this
        # same table, adopt ITS batch id — the commit then matches the
        # claim's intent and takes it over; the crashed attempt's data
        # files (attempt-unique) become vacuum-able orphans.
        if epoch is not None:
            claim = self._pending_claim(t, prev.version + 1)
            if (
                claim is not None
                and claim.lineage.get("stream_sink")
                and claim.lineage.get("epoch") == epoch
            ):
                batch_id = claim.lineage.get("batch_id", batch_id)
        props = t.exactly_once_props(
            batch_id,
            max_lsn if max_lsn is not None else -1,
            prev_properties=prev.properties,
        )
        lineage = {
            "batch_id": batch_id,
            "stream_sink": True,
            "rows_written": rows,
            "dropped_stale": dropped,
            "buckets_touched": len(appends),
        }
        if epoch is not None:
            lineage["epoch"] = epoch
        t.commit(appends, {}, props, lineage, prev=prev, file_sizes_hint=sizes)

    def commit(self, messages, batchId: int) -> None:
        self._commit(messages, f"sink-{self.sinkid}-{batchId}", epoch=batchId)

    def abort(self, messages, batchId: int) -> None:
        # written files are unreferenced by any manifest — orphans that
        # vacuum GCs; best-effort eager cleanup here
        for m in messages:
            if m is None:
                continue
            for fl in m.files.values():
                for rel in fl:
                    try:
                        os.remove(os.path.join(self.root, rel))
                    except OSError:
                        pass


class _LakeBatchWriter(DataSourceArrowWriter):
    """``df.write.format("lake").mode("append")`` — one batch through
    the same executor path; the batch id is attempt-unique (the
    watermark guard still drops redelivered stale rows)."""

    def __init__(self, options, schema, overwrite: bool):
        self._w = _LakeSinkWriter(options, schema, overwrite)

    def write(self, iterator):
        return self._w.write(iterator)

    def commit(self, messages):
        # attempt-unique id, NEVER the (possibly pinned) sinkid: a
        # batch write has no replay concept, and a constant id would
        # make a SECOND append under the same sinkid a silent
        # committed no-op that drops its rows (review finding). The
        # watermark guard still provides redelivery protection.
        self._w._commit(messages, f"sink-{uuid.uuid4().hex[:8]}-batch")

    def abort(self, messages):
        self._w.abort(messages, -1)


class LakeTableSinkDataSource(DataSource):
    """``format("lake")`` — streaming + batch append sink over a
    LakeTable root (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "lake"

    def streamWriter(self, schema, overwrite):
        return _LakeSinkWriter(self.options, schema, overwrite)

    def writer(self, schema, overwrite):
        return _LakeBatchWriter(self.options, schema, overwrite)


def with_bucket(df, root: str, repartition: bool = False):
    """Add the table's ``_bucket`` column JVM-side (the sink's fast
    path: vectorized ``xxhash64`` in the plan, no per-row Python in the
    executors). Reads the bucket config from the current manifest —
    metadata-only, driver-side.

    ``repartition=True`` additionally hash-partitions the stream on
    ``_bucket`` so each bucket lands in ONE task per epoch — file count
    drops from O(tasks × buckets) to O(buckets) per epoch (4× measured
    in BENCH/sink_bench.py) at the cost of one shuffle per epoch.
    Leave it off for low-latency small epochs; turn it on when epochs
    are large or compaction cadence is slow."""
    from pyspark.sql import functions as F

    from picsure_dictionary_etl_spark.lake.table import bucket_expr

    snap = LakeTable(None, os.path.abspath(_posix_root(root))).current()
    out = df.withColumn(
        BUCKET_COL, bucket_expr(snap.bucket_by, snap.bucket_count)
    )
    if repartition:
        out = out.repartition(F.col(BUCKET_COL))
    return out

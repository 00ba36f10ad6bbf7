"""Structured-Streaming source for the lake's change data feed.

Registers a PySpark 4 Python DataSource (``lake_cdf``) so the change
feed is a FIRST-CLASS stream — checkpointed offsets, triggers,
``availableNow`` catch-up — instead of the hand-rolled poll/ack loop of
:class:`~picsure_dictionary_etl_spark.lake.consume.ChangeFeedConsumer`::

    spark.dataSource.register(LakeChangeFeedDataSource)
    (spark.readStream.format("lake_cdf").option("path", table_root).load()
          .writeStream...)

Scale design (mirrors :func:`~..lake.merge.table_changes` exactly):

* **Offsets are table versions** — tiny dict checkpoints, replayable.
* **Planning is metadata-only** — ``partitions(start, end)`` diffs the
  two manifests' per-bucket FILE LISTS; only buckets whose lists differ
  become input partitions. A commit touching 1 of 1024 buckets streams
  1 partition, not the table.
* **Executors read only that bucket's files** (old + new list) via
  pyarrow — no Spark-in-Spark, no driver collects; per-bucket work is
  bounded by bucket sizing exactly like the batch CDF.
* **LWW parity is bit-exact**: the per-bucket resolve orders rows by
  ``(_lsn, xxhash64(payload..., _op))`` using a pure-Python
  Spark-compatible XXH64 (verified against ``F.xxhash64`` in tests), so
  equal-LSN ties pick the SAME winner the engine does — never bare-LSN
  ordering (the r3 determinism rule).

Documented v1 seams (typed errors, not silent wrongness): row-policy
tables only (field-wise ``_pu`` tables raise), POSIX roots only (the
datasource callbacks have no JVM to reach Hadoop FileSystems).

Reference analog: the reference's consumers re-read whole Postgres
tables after every load (README.md:247-260); this streams only the
diff, continuously.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from picsure_dictionary_etl_spark.lake.table import META_DIR, VERSION_FILE, Snapshot

# ---------------------------------------------------------------------------
# Spark-compatible XXH64 (pure python; verified against F.xxhash64)
# ---------------------------------------------------------------------------

_M = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _hash_int(v: int, seed: int) -> int:
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _hash_long(v: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _hash_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        acc = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed & _M,
            (seed - _P1) & _M,
        ]
        while i <= n - 32:
            for lane in range(4):
                k = int.from_bytes(data[i + 8 * lane : i + 8 * lane + 8], "little")
                acc[lane] = (_rotl((acc[lane] + k * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (
            _rotl(acc[0], 1) + _rotl(acc[1], 7) + _rotl(acc[2], 12) + _rotl(acc[3], 18)
        ) & _M
        for v in acc:
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def spark_xxhash64(values, dtypes, seed: int = 42) -> int:
    """``F.xxhash64(c1, c2, ...)`` twin: seed-chained per column, null
    leaves the running hash unchanged, SIGNED int64 result. ``dtypes``
    are Spark simpleString type names ('string', 'long', 'integer',
    'timestamp', 'boolean', 'double', ...). A NaN in a DOUBLE column is
    a VALUE (Spark hashes doubleToLongBits' canonical NaN), so pass
    pandas nullable dtypes upstream (:func:`_read_bucket` does) — a
    plain-float64 NaN in any other declared type is treated as null."""
    import pandas as pd

    h = seed
    for v, t in zip(values, dtypes):
        if v is None or v is pd.NA or (v != v and t != "double"):
            continue
        if t == "string":
            h = _hash_bytes(str(v).encode("utf-8"), h)
        elif t in ("long", "bigint"):
            h = _hash_long(int(v) & _M, h)
        elif t in ("integer", "int", "short", "smallint", "byte", "tinyint"):
            h = _hash_int(int(v) & 0xFFFFFFFF, h)
        elif t == "boolean":
            h = _hash_int(1 if v else 0, h)
        elif t == "timestamp":
            # Spark hashes timestamps as their micros-since-epoch long
            import pandas as pd

            ts = pd.Timestamp(v)
            if ts.tzinfo is None:
                ts = ts.tz_localize("UTC")
            h = _hash_long(int(ts.value // 1000) & _M, h)
        elif t == "double":
            import struct as _struct

            if v != v:  # Java doubleToLongBits collapses every NaN
                h = _hash_long(0x7FF8000000000000, h)
            else:
                d = 0.0 if v == 0.0 else float(v)  # -0.0 normalizes
                h = _hash_long(
                    int.from_bytes(_struct.pack("<d", d), "little"), h
                )
        else:
            raise NotImplementedError(f"xxhash64 twin: unsupported type {t}")
    return h - (1 << 64) if h >= 1 << 63 else h


# ---------------------------------------------------------------------------
# per-bucket resolve + diff (executor side, pyarrow/pandas)
# ---------------------------------------------------------------------------


@dataclass
class _BucketTask(InputPartition):
    root: str
    keys: list[str]
    payload: list[str]
    dtypes: dict[str, str]  # column -> spark simpleString
    old_files: list[str]
    new_files: list[str]


def _read_bucket(root: str, rel_files: list[str], cols: list[str], dtypes):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    # nullable pandas dtypes keep parquet NULL distinct from a real NaN
    # double (plain float64 collapses both to nan — the tie-break and
    # diff would then treat a stored NaN as null, diverging from the
    # engine, which hashes NaN and stringifies it as a value)
    mapper = {
        pa.int64(): pd.Int64Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.float64(): pd.Float64Dtype(),
        pa.float32(): pd.Float32Dtype(),
        pa.bool_(): pd.BooleanDtype(),
    }.get
    frames = []
    for rel in rel_files:
        tbl = pq.read_table(os.path.join(root, rel))
        keep = [c for c in cols if c in tbl.column_names]
        frames.append(tbl.select(keep).to_pandas(types_mapper=mapper))
    if not frames:
        return pd.DataFrame(columns=cols)
    df = pd.concat(frames, ignore_index=True)
    for c in cols:  # additive schema evolution: older files lack the col
        if c not in df.columns:
            df[c] = None
    return df[cols]


def _resolve_live_pd(df, keys: list[str], payload: list[str], dtypes):
    """Row-policy LWW twin of :func:`~..lake.merge.resolve_live`: winner
    per key by (_lsn, xxhash64(payload..., _op)); tombstone winners drop.
    The tie-break hash is computed ONLY for rows in (key, _lsn) tie
    groups — the common unique-LSN path never pays the python hash."""
    import pandas as pd

    if df.empty:
        return df.iloc[0:0][keys + payload + ["_lsn"]]
    df = df.reset_index(drop=True)
    tie = df.duplicated(subset=keys + ["_lsn"], keep=False)
    hcol = pd.Series(0, index=df.index, dtype="int64")
    if tie.any():
        ptypes = [dtypes[c] for c in payload] + ["string"]
        hcol.loc[tie] = [
            spark_xxhash64(
                [df.at[i, c] for c in payload] + [df.at[i, "_op"]], ptypes
            )
            for i in df.index[tie]
        ]
    df = df.assign(_tie=hcol).sort_values(
        keys + ["_lsn", "_tie"], kind="stable"
    )
    win = df.groupby(keys, as_index=False, sort=False, dropna=False).tail(1)
    live = win[win["_op"] != "D"]
    return live[keys + payload + ["_lsn"]].reset_index(drop=True)


def _to_py(v, dtype: str):
    """Pandas/numpy value -> what the Python worker serializes for the
    declared Spark type. Parquet timestamps read back tz-NAIVE (their
    stored micros are session-UTC); the arrow output path requires
    tz-AWARE, so localize — never convert — to UTC."""
    import pandas as pd

    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
        return None
    if dtype == "timestamp":
        ts = pd.Timestamp(v)
        ts = ts.tz_localize("UTC") if ts.tzinfo is None else ts.tz_convert("UTC")
        return ts.to_pydatetime()
    if dtype in ("long", "bigint", "integer", "int", "short", "smallint"):
        return int(v)
    if dtype == "double" or dtype == "float":
        return float(v)
    if dtype == "boolean":
        return bool(v)
    return v


def _diff_states(old, new, keys: list[str], payload: list[str], dtypes):
    """``state_diff`` twin: rows (_change, keys, new-side payload, lsn)."""
    import pandas as pd

    merged = old.merge(
        new, on=keys, how="outer", suffixes=("_o", "_n"), indicator=True
    )
    rows = []
    for _, r in merged.iterrows():
        if r["_merge"] == "right_only":
            change = "I"
        elif r["_merge"] == "left_only":
            change = "D"
        else:
            same = all(
                (pd.isna(r[f"{c}_o"]) and pd.isna(r[f"{c}_n"]))
                or (
                    not pd.isna(r[f"{c}_o"])
                    and not pd.isna(r[f"{c}_n"])
                    and r[f"{c}_o"] == r[f"{c}_n"]
                )
                for c in payload
            )
            if same:
                continue
            change = "U"
        key_vals = [_to_py(r[k], dtypes[k]) for k in keys]
        pay_vals = [
            None if change == "D" else _to_py(r[f"{c}_n"], dtypes[c])
            for c in payload
        ]
        lsn = r["_lsn_n"] if change != "D" else r["_lsn_o"]
        rows.append((change, *key_vals, *pay_vals, int(lsn)))
    return rows


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


def _meta_io():
    # driver-side callbacks route through the same MetadataIO the
    # engine uses (never bare open() under _meta — CLAUDE.md rule);
    # POSIX is the only supported plane here (see _check_supported)
    from picsure_dictionary_etl_spark.lake.metadata_io import PosixMetadataIO

    return PosixMetadataIO()


def _load_snapshot(root: str, version: int) -> Snapshot:
    from picsure_dictionary_etl_spark.lake.consume import ChangeFeedRetentionError

    p = os.path.join(root, META_DIR, f"snap-{version:08d}.json")
    try:
        return Snapshot.from_json(_meta_io().read_text(p))
    except FileNotFoundError:
        raise ChangeFeedRetentionError(
            f"snapshot v{version} of {root} is beyond retention (vacuumed). "
            f"Start a fresh stream with .option('startversion', <oldest "
            f"retained version>) — list {os.path.join(root, META_DIR)} for "
            f"the surviving snap-*.json — or raise vacuum keep_snapshots to "
            f"cover the slowest stream's lag"
        ) from None


def _current_version(root: str) -> int:
    return int(
        _meta_io().read_text(os.path.join(root, META_DIR, VERSION_FILE)).strip()
    )


def _check_supported(root: str, snap: Snapshot) -> None:
    if "://" in root or root.startswith("file:"):
        raise NotImplementedError(
            "lake_cdf streams POSIX roots only (datasource callbacks have "
            "no JVM for Hadoop FileSystems); use ChangeFeedConsumer on URI roots"
        )
    if snap.properties.get("update_policy", "row") != "row" or any(
        f.name == "_pu" for f in snap.schema.fields
    ):
        raise NotImplementedError(
            "lake_cdf v1 resolves row-policy tables only; field-wise (_pu) "
            "tables need the engine-side reduce — use table_changes()/"
            "ChangeFeedConsumer"
        )


class _CdfStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema=None):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("lake_cdf requires .option('path', <table_root>)")
        self.start_version = int(options.get("startversion", 0))
        # columns are PINNED at stream start (the Structured Streaming
        # contract: a source's schema is fixed for the query's
        # lifetime). An additive evolve() mid-stream keeps streaming the
        # declared columns — rows that only changed in a NEW column
        # classify as unchanged until the stream restarts with the wider
        # schema. Deriving per-batch from snap_to instead would emit
        # tuples wider than the declared schema and fail the batch.
        snap = _load_snapshot(self.root, _current_version(self.root))
        self.keys = snap.key_cols
        if schema is not None:
            cols = [f.name for f in schema.fields]
            self.dtypes = {
                f.name: f.dataType.simpleString() for f in schema.fields
            }
        else:  # offsets-only use (tests); mirror schema() from the snapshot
            cols = [f.name for f in snap.schema.fields]
            self.dtypes = {
                f.name: f.dataType.simpleString() for f in snap.schema.fields
            }
        self.payload = [
            c
            for c in cols
            if c not in set(self.keys)
            and c not in ("_change", "_op", "_lsn", "_del_lsn", "_pu")
        ]
        self.dtypes.setdefault("_op", "string")
        self.dtypes.setdefault("_lsn", "bigint")

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self.root)}

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["version"]), int(end["version"])
        snap_from = _load_snapshot(self.root, sv)
        snap_to = _load_snapshot(self.root, ev)
        _check_supported(self.root, snap_to)
        same_layout = (
            snap_from.bucket_count == snap_to.bucket_count
            and snap_from.bucket_by == snap_to.bucket_by
        )
        if not same_layout:
            # a rebucket inside the span moves keys across buckets: a
            # per-bucket diff would emit spurious D+I for every moved
            # key. Collapse to ONE global-diff task — exactly
            # table_changes' semantics (it unions all buckets before
            # diffing). Rebuckets are rare one-time maintenance; the
            # next ordinary span fans back out per bucket.
            return [
                _BucketTask(
                    root=self.root,
                    keys=self.keys,
                    payload=self.payload,
                    dtypes=self.dtypes,
                    old_files=snap_from.all_files(),
                    new_files=snap_to.all_files(),
                )
            ]
        changed = sorted(
            b
            for b in set(snap_from.files) | set(snap_to.files)
            if snap_from.files.get(b) != snap_to.files.get(b)
        )
        return [
            _BucketTask(
                root=self.root,
                keys=self.keys,
                payload=self.payload,
                dtypes=self.dtypes,
                old_files=snap_from.files.get(b, []),
                new_files=snap_to.files.get(b, []),
            )
            for b in changed
        ]

    def read(self, partition: _BucketTask):
        cols = (
            partition.keys + partition.payload + ["_op", "_lsn"]
        )
        old = _resolve_live_pd(
            _read_bucket(partition.root, partition.old_files, cols, partition.dtypes),
            partition.keys,
            partition.payload,
            partition.dtypes,
        )
        new = _resolve_live_pd(
            _read_bucket(partition.root, partition.new_files, cols, partition.dtypes),
            partition.keys,
            partition.payload,
            partition.dtypes,
        )
        yield from _diff_states(
            old, new, partition.keys, partition.payload, partition.dtypes
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing table-side to ack


class LakeChangeFeedDataSource(DataSource):
    """``spark.readStream.format("lake_cdf")`` over a LakeTable root."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self):
        root = self.options.get("path")
        if not root:
            raise ValueError("lake_cdf requires .option('path', <table_root>)")
        snap = _load_snapshot(root, _current_version(root))
        _check_supported(root, snap)
        by_name = {f.name: f for f in snap.schema.fields}
        # field order must mirror state_diff/_diff_states tuples exactly:
        # _change, keys in KEY_COLS order, payload in schema order, _lsn
        fields = [T.StructField("_change", T.StringType(), False)]
        fields += [by_name[k] for k in snap.key_cols]
        fields += [
            f
            for f in snap.schema.fields
            if f.name not in set(snap.key_cols)
            and f.name not in ("_op", "_lsn", "_del_lsn", "_pu")
        ]
        fields.append(T.StructField("_lsn", T.LongType(), True))
        return T.StructType(fields)

    def streamReader(self, schema):
        return _CdfStreamReader(self.options, schema)

"""The ``lake`` streaming/batch SINK datasource: per-epoch MOR delta
appends with atomic manifest commits, watermark-guard exactly-once,
engine-bit-equal bucket placement, and composition with merge_into and
the lake_cdf source."""

import datetime
import glob
import os

import pytest

from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
from picsure_dictionary_etl_spark.lake.merge import (
    merge_into,
    resolve_live,
    table_changes,
)
from picsure_dictionary_etl_spark.lake.table import LakeTable, bucket_expr
from picsure_dictionary_etl_spark.streaming.lake_sink import (
    LakeTableSinkDataSource,
    with_bucket,
)

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)
PAYLOAD = ["role", "text", "tool", "ts"]
KEYS = ["conv_id", "turn_idx"]


def _ev(spark, rows):
    return spark.createDataFrame(rows, change_event_schema())


def _mk_table(spark, tmp_path, name="t", buckets=4):
    from picsure_dictionary_etl_spark.cdc.envelope import (
        TRANSCRIPT_KEY,
        transcript_table_schema,
    )

    root = str(tmp_path / name)
    LakeTable.create(spark, root, schema=transcript_table_schema(),
                     key_cols=TRANSCRIPT_KEY, bucket_by=["conv_id"],
                     bucket_count=buckets)
    return root


def _run_sink(spark, src_dir, root, ckpt, prebucket=False):
    df = spark.readStream.schema(change_event_schema()).parquet(src_dir)
    if prebucket:
        df = with_bucket(df, root)
    q = (df.writeStream.format("lake").option("path", root)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)


def _state(spark, root):
    t = LakeTable.load(spark, root)
    live = resolve_live(t.read(), KEYS, PAYLOAD)
    return {tuple(r) for r in
            live.select("conv_id", "turn_idx", "text", "_lsn").collect()}


def test_stream_sink_appends_and_is_exactly_once(spark, tmp_path):
    """availableNow pass lands the WAL as MOR deltas (resolved state =
    LWW incl. D tombstones); a second pass from the same checkpoint is
    a no-op; NEW source data streams incrementally; a FRESH checkpoint
    over already-applied data is fully dropped by the watermark guard
    (no version churn, state unchanged)."""
    spark.dataSource.register(LakeTableSinkDataSource)
    root = _mk_table(spark, tmp_path)
    src = str(tmp_path / "src")
    _ev(spark, [
        (1, "I", "c1", 0, "user", "hello", None, TS),
        (2, "I", "c2", 0, "user", "hi", None, TS),
        (3, "U", "c1", 0, "user", "hello EDITED", None, TS),
        (4, "D", "c2", 0, None, None, None, None),
    ]).coalesce(1).write.mode("append").parquet(src)

    ckpt = str(tmp_path / "ck")
    _run_sink(spark, src, root, ckpt)
    assert _state(spark, root) == {("c1", 0, "hello EDITED", 3)}
    t = LakeTable.load(spark, root)
    v_after = t.current_version()
    assert v_after == 1  # one non-empty epoch = one commit
    assert t.watermark() == 4

    # same checkpoint, no new data: empty epoch, no commit
    _run_sink(spark, src, root, ckpt)
    assert LakeTable.load(spark, root).current_version() == v_after

    # new source data: incremental epoch
    _ev(spark, [
        (5, "I", "c3", 0, "user", "new", None, TS),
        (6, "U", "c1", 0, "user", "hello v3", None, TS),
    ]).coalesce(1).write.mode("append").parquet(src)
    _run_sink(spark, src, root, ckpt)
    assert _state(spark, root) == {
        ("c1", 0, "hello v3", 6), ("c3", 0, "new", 5)}
    assert LakeTable.load(spark, root).watermark() == 6

    # fresh checkpoint over the SAME source: every row is at-or-below
    # the committed watermark -> guard drops all, nothing commits
    v_before = LakeTable.load(spark, root).current_version()
    _run_sink(spark, src, root, str(tmp_path / "ck2"))
    t = LakeTable.load(spark, root)
    assert t.current_version() == v_before
    assert _state(spark, root) == {
        ("c1", 0, "hello v3", 6), ("c3", 0, "new", 5)}


@pytest.mark.parametrize("prebucket", [False, True])
def test_sink_bucket_placement_is_engine_bit_equal(spark, tmp_path,
                                                   prebucket):
    """Every sink-written file sits under the _bucket dir the engine's
    own bucket_expr assigns its rows — for BOTH paths: the executor-side
    Python hash twin and the JVM-side with_bucket() fast path."""
    from pyspark.sql import functions as F

    spark.dataSource.register(LakeTableSinkDataSource)
    root = _mk_table(spark, tmp_path, name=f"t{int(prebucket)}", buckets=4)
    src = str(tmp_path / f"src{int(prebucket)}")
    rows = [(i, "I", f"c{i}", i % 3, "user", f"txt {i}", None, TS)
            for i in range(1, 41)]
    _ev(spark, rows).write.mode("append").parquet(src)
    _run_sink(spark, src, root,
              str(tmp_path / f"ck{int(prebucket)}"), prebucket=prebucket)

    files = glob.glob(os.path.join(root, "data", "s-*", "delta",
                                   "_bucket=*", "*.parquet"))
    assert files
    for f in files:
        b = int(f.split("_bucket=")[1].split(os.sep)[0])
        got = (spark.read.parquet(f)
               .select(F.pmod(F.xxhash64("conv_id"), F.lit(4)).alias("b"))
               .distinct().collect())
        assert [r["b"] for r in got] == [b], f
    # and the table resolves all 40 keys
    assert len(_state(spark, root)) == 40


def test_sink_composes_with_merge_and_cdf(spark, tmp_path):
    """Sink appends interleave with engine merge_into commits (shared
    watermark/batch bookkeeping), and the lake_cdf source streams the
    sink-written table exactly as table_changes reports it."""
    from picsure_dictionary_etl_spark.streaming.cdf_source import (
        LakeChangeFeedDataSource,
    )

    spark.dataSource.register(LakeTableSinkDataSource)
    spark.dataSource.register(LakeChangeFeedDataSource)
    root = _mk_table(spark, tmp_path)
    src = str(tmp_path / "src")
    _ev(spark, [
        (1, "I", "c1", 0, "user", "a", None, TS),
        (2, "I", "c2", 0, "user", "b", None, TS),
    ]).coalesce(1).write.mode("append").parquet(src)
    _run_sink(spark, src, root, str(tmp_path / "ck"))

    t = LakeTable.load(spark, root)
    merge_into(t, _ev(spark, [
        (3, "U", "c1", 0, "user", "a v2", None, TS),
        (4, "I", "c3", 0, "user", "c", None, TS),
    ]), "engine-b1")
    assert _state(spark, root) == {
        ("c1", 0, "a v2", 3), ("c2", 0, "b", 2), ("c3", 0, "c", 4)}

    cur = t.current_version()
    want = {tuple(r) for r in table_changes(t, 0, cur)
            .select("_change", "conv_id", "text", "_lsn").collect()}
    batch = {tuple(r) for r in
             spark.read.format("lake_cdf").option("path", root).load()
             .select("_change", "conv_id", "text", "_lsn").collect()}
    assert batch == want and len(want) == 3


def test_batch_writer_and_typed_errors(spark, tmp_path):
    """df.write.format('lake').mode('append') applies one batch through
    the same path; URI roots, field-wise tables, schema drift, and
    overwrite mode fail typed at plan time."""
    from pyspark.sql import types as T

    from picsure_dictionary_etl_spark.streaming.lake_sink import (
        _LakeSinkWriter,
    )

    spark.dataSource.register(LakeTableSinkDataSource)
    root = _mk_table(spark, tmp_path)
    _ev(spark, [
        (1, "I", "c1", 0, "user", "x", None, TS),
    ]).write.format("lake").mode("append").option("path", root).save()
    assert _state(spark, root) == {("c1", 0, "x", 1)}

    sch = change_event_schema()
    with pytest.raises(NotImplementedError, match="URI table roots"):
        _LakeSinkWriter({"path": "s3a://b/t"}, sch, False)
    # file: URIs ARE POSIX paths — accepted, same table
    w = _LakeSinkWriter({"path": "file://" + root}, sch, False)
    assert w.root == root
    with pytest.raises(NotImplementedError, match="append output only"):
        _LakeSinkWriter({"path": root}, sch, True)
    bad = T.StructType([f for f in sch.fields if f.name != "text"])
    with pytest.raises(ValueError, match="match table schema"):
        _LakeSinkWriter({"path": root}, bad, False)

    # field-wise table: carries _pu in schema -> typed seam
    t = LakeTable.load(spark, root)
    merge_into(t, _ev(spark, [
        (2, "U", "c1", 0, None, "y", None, None),
    ]), "pu-b", update_policy="coalesce")
    assert "_pu" in [f.name for f in t.current().schema.fields]
    with pytest.raises(NotImplementedError, match="field-wise"):
        _LakeSinkWriter({"path": root}, sch, False)


def test_sink_restart_takes_over_crashed_commit_claim(spark, tmp_path,
                                                      monkeypatch):
    """A driver killed between create_exclusive(claim) and the pointer
    swap leaves an unswapped manifest claim. A RESTARTED query gets a
    fresh random sinkid — its batch id differs, so without claim
    adoption every retry would die on ConcurrentCommitError forever
    (review finding). The commit must recognize the pending claim as a
    SINK commit for the same epoch, adopt its batch id, and take it
    over; the crashed attempt's files publish, the retry's become
    vacuum-able orphans."""
    import pyarrow as pa

    from picsure_dictionary_etl_spark.lake.metadata_io import PosixMetadataIO
    from picsure_dictionary_etl_spark.streaming.lake_sink import (
        _LakeSinkWriter,
    )

    root = _mk_table(spark, tmp_path)
    sch = change_event_schema()
    rows = _ev(spark, [
        (1, "I", "c1", 0, "user", "a", None, TS),
        (2, "I", "c2", 0, "user", "b", None, TS),
    ])
    batches = rows.toArrow().to_batches()

    # attempt 1: write + crash INSIDE commit (after the claim is
    # created, before the pointer swap)
    w1 = _LakeSinkWriter({"path": root}, sch, False)
    msg1 = w1.write(iter(batches))

    real_swap = PosixMetadataIO.swap_pointer

    def crash(self, path, value):
        raise RuntimeError("injected crash between claim and swap")

    monkeypatch.setattr(PosixMetadataIO, "swap_pointer", crash)
    with pytest.raises(RuntimeError, match="injected crash"):
        w1._commit([msg1], f"sink-{w1.sinkid}-0", epoch=0)
    monkeypatch.setattr(PosixMetadataIO, "swap_pointer", real_swap)

    # restart: fresh writer = fresh random sinkid; same epoch replayed
    # (rows are NOT stale — the crashed commit never advanced the
    # watermark). Without adoption this raises ConcurrentCommitError.
    w2 = _LakeSinkWriter({"path": root}, sch, False)
    assert w2.sinkid != w1.sinkid
    msg2 = w2.write(iter(rows.toArrow().to_batches()))
    w2._commit([msg2], f"sink-{w2.sinkid}-0", epoch=0)

    t = LakeTable.load(spark, root)
    assert _state(spark, root) == {("c1", 0, "a", 1), ("c2", 0, "b", 2)}
    assert t.watermark() == 2
    # the adopted commit carries attempt 1's batch id
    assert f"sink-{w1.sinkid}-0" in t.applied_batch_ids()
    # the retry's duplicate files are unreferenced orphans -> vacuumed
    gc = t.vacuum(keep_snapshots=1)
    assert gc["files_removed"] >= 1
    assert _state(spark, root) == {("c1", 0, "a", 1), ("c2", 0, "b", 2)}


def test_batch_writer_sequential_appends_both_land(spark, tmp_path):
    """Two sequential df.write appends under ONE pinned sinkid must
    BOTH commit — batch ids are attempt-unique, never the sinkid
    (review finding: a constant id made the second append a silent
    committed no-op); with_bucket accepts the same file:-scheme root
    the writer does."""
    spark.dataSource.register(LakeTableSinkDataSource)
    root = _mk_table(spark, tmp_path)
    for lsn, conv, txt in [(1, "c1", "a"), (2, "c2", "b")]:
        df = with_bucket(
            _ev(spark, [(lsn, "I", conv, 0, "user", txt, None, TS)]),
            "file://" + root)  # file: root through the fast path too
        (df.write.format("lake").mode("append")
           .option("path", root).option("sinkid", "pinned").save())
    assert _state(spark, root) == {("c1", 0, "a", 1), ("c2", 0, "b", 2)}

"""applyInPandasWithState cross-batch LWW prefilter: redelivered /
stale events are dropped by keyed state BEFORE the merge, across
micro-batches and across a checkpoint-restored restart."""

import os

from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
from picsure_dictionary_etl_spark.streaming.stateful import dedup_stream_by_lsn


def _write_wal(spark, path, rows, mode):
    spark.createDataFrame(rows, change_event_schema()).coalesce(1).write.mode(
        mode
    ).parquet(path)


def _run(spark, src, ckpt, sink_dir):
    stream = spark.readStream.schema(change_event_schema()).parquet(src)
    deduped = dedup_stream_by_lsn(stream, ["conv_id", "turn_idx"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_lsn_dedup_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    TS = __import__("datetime").datetime(2025, 1, 1)

    # batch 1: two keys; lsn 1 is novel (never delivered before) so it
    # passes — in-batch thinning is the merge's LWW reduce's job
    _write_wal(
        spark,
        src,
        [
            (3, "U", "c1", 0, "user", "v3", None, TS),
            (1, "U", "c1", 0, "user", "v1", None, TS),
            (5, "I", "c2", 0, "user", "w5", None, TS),
        ],
        "overwrite",
    )
    _run(spark, src, ckpt, sink)
    got = {
        (r["conv_id"], r["_lsn"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {("c1", 3), ("c1", 1), ("c2", 5)}

    # batch 2 after a RESTART (state restored from checkpoint):
    # a redelivered lsn<=3 for c1 must be dropped; a fresh lsn passes
    _write_wal(
        spark,
        src,
        [
            (2, "U", "c1", 0, "user", "redelivered", None, TS),
            (7, "U", "c1", 0, "user", "v7", None, TS),
        ],
        "append",
    )
    _run(spark, src, ckpt, sink)
    got = {
        (r["conv_id"], r["_lsn"])
        for r in spark.read.parquet(sink).collect()
    }
    assert ("c1", 7) in got
    assert ("c1", 2) not in got  # cross-restart state dedup
    assert {l for c, l in got if c == "c1"} == {1, 3, 7}

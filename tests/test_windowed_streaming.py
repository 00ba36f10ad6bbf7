"""Watermarked tumbling-window aggregation: windows finalize exactly
once (append mode), rows later than a finalized window are discarded,
and the watermark survives checkpointed restarts."""

import datetime

from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
from picsure_dictionary_etl_spark.streaming.windows import windowed_event_counts


def _t(h, m, s=0):
    return datetime.datetime(2025, 1, 1, h, m, s)


def _write(spark, path, rows, mode):
    spark.createDataFrame(rows, change_event_schema()).coalesce(1).write.mode(
        mode
    ).parquet(path)


def _run(spark, src, ckpt, sink):
    # one file per micro-batch: Spark applies the watermark computed
    # from batch N-1 to batch N, so multi-batch runs advance and apply
    # the watermark deterministically
    stream = (
        spark.readStream.schema(change_event_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = windowed_event_counts(
        stream, ts_col="ts", window="10 minutes", watermark="5 minutes"
    )
    q = (
        counts.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_counts_with_late_data(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("wal", "ckpt", "out"))

    def row(lsn, h, m):
        return (lsn, "I", f"c{lsn}", 0, "user", "x", None, _t(h, m))

    # run 1, three micro-batches: watermark reaches 10:30-5m = 10:25,
    # finalizing [10:00,10:10) (2 events) and [10:10,10:20) (1 event)
    _write(spark, src, [row(1, 10, 0), row(2, 10, 1)], "overwrite")
    _write(spark, src, [row(3, 10, 11)], "append")
    _write(spark, src, [row(4, 10, 30)], "append")
    _run(spark, src, ckpt, sink)

    rows = spark.read.parquet(sink).collect()
    got = {(r["window_start"], r["window_end"]): r["n_events"] for r in rows}
    assert got[(_t(10, 0), _t(10, 10))] == 2
    assert got[(_t(10, 10), _t(10, 20))] == 1
    # open window [10:30,10:40) not emitted (end 10:40 > wm 10:25)
    assert (_t(10, 30), _t(10, 40)) not in got

    # run 2 (restart; watermark 10:25 restored from checkpoint): a row
    # at 10:02 lands in an already-FINALIZED window -> discarded; a row
    # in the open [10:30,10:40) window aggregates normally; 10:50
    # advances the watermark to 10:45, finalizing [10:30,10:40)
    _write(spark, src, [row(5, 10, 2), row(6, 10, 31)], "append")
    _write(spark, src, [row(7, 10, 50)], "append")
    _run(spark, src, ckpt, sink)

    rows = spark.read.parquet(sink).collect()
    per_window = {}
    for r in rows:
        per_window.setdefault((r["window_start"], r["window_end"]), []).append(
            r["n_events"]
        )
    # exactly-once emission: the finalized window was NOT re-emitted by
    # the too-late row (still one row, count still 2)
    assert per_window[(_t(10, 0), _t(10, 10))] == [2]
    # the open-window late row counted: 10:30 and 10:31
    assert per_window[(_t(10, 30), _t(10, 40))] == [2]


def test_streaming_batch_parity_under_late_data(spark, tmp_path):
    """SURVEY §J late-data parity: the streaming windowed aggregation
    (watermark + append mode) must equal the BATCH twin — the same
    F.window groupBy — computed over the event set MINUS the rows the
    watermark contract discards, restricted to finalized windows. Also
    proves the drop is real: batch over ALL events differs."""
    src, ckpt, sink = (str(tmp_path / d) for d in ("wal2", "ckpt2", "out2"))

    def row(lsn, h, m):
        return (lsn, "I", f"c{lsn}", 0, "user", "x", None, _t(h, m))

    # micro-batches in file order. The watermark EFFECTIVE in batch N is
    # the one planned before it runs — computed from data through batch
    # N-1 — so a too-late row must arrive a full batch after the
    # watermark-advancing data to be discarded (empirically pinned: a
    # late row in the SAME batch that advances the watermark past its
    # window still aggregates).
    batches = [
        [row(1, 10, 0), row(2, 10, 4)],   # W1 x2             eff wm epoch
        [row(3, 10, 12), row(4, 10, 7)],  # W2; W1 open late   eff 09:59
        [row(5, 10, 22), row(6, 10, 5)],  # W3; W1 open late   eff 10:07
        [row(8, 10, 14)],                 # W2 open late       eff 10:17 (W1 final x4)
        [row(7, 10, 8), row(9, 10, 35)],  # W1 FINALIZED -> 7 dropped; W4. eff 10:17
        [row(10, 10, 55)],                # eff 10:30 (W2 x2, W3 final)
        # trailing empty batch: eff 10:50 finalizes W4; W5 stays open
    ]
    for i, b in enumerate(batches):
        _write(spark, src, b, "overwrite" if i == 0 else "append")
    _run(spark, src, ckpt, sink)

    streamed = {
        (r["window_start"], r["window_end"]): r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }

    from pyspark.sql import functions as F

    all_rows = [r for b in batches for r in b]
    dropped_lsns = {7}          # the only row later than a finalized window
    final_wm = _t(10, 50)       # 10:55 - 5m

    def batch_twin(rows):
        df = spark.createDataFrame(rows, change_event_schema())
        out = df.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
            F.count(F.lit(1)).alias("n_events"))
        return {
            (r["w"]["start"], r["w"]["end"]): r["n_events"]
            for r in out.collect()
            if r["w"]["end"] <= final_wm  # append mode: open windows unemitted
        }

    kept = [r for r in all_rows if r[0] not in dropped_lsns]
    assert streamed == batch_twin(kept)
    # the discard is load-bearing: without it W1 counts 5, not 4
    assert streamed != batch_twin(all_rows)
    assert streamed[(_t(10, 0), _t(10, 10))] == 4

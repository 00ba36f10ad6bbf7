"""Structured Streaming front-end for the CDC runner (SURVEY.md §2.J).

The batch replay path (``CdcRunner.replay``) slices a bounded stream by
LSN range; this module runs the SAME apply path under Spark Structured
Streaming for unbounded sources: ``readStream -> foreachBatch(apply)``.

Exactly-once composition: Spark's checkpointed epoch id gives at-least-
once foreachBatch delivery; the engine's batch-id dedup + LSN watermark
guard (``lake/merge.py``) turn that into exactly-once commits — the same
contract Iceberg's streaming sink documents.

Reference analog: the batch-over-stream pull iterator + single-flight
lock (``loading/ColumnMetaSource.java:40-100``,
``loading/DictionaryLoaderController.java:58``) — replaced by the
streaming engine's own micro-batch loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from picsure_dictionary_etl_spark.cdc.runner import CdcRunner


def stream_into_table(
    events_stream: DataFrame,
    runner: CdcRunner,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach a streaming change-event DataFrame to the lake table.

    ``events_stream`` must carry the CDC envelope columns (``_op``,
    ``_lsn``, keys, payload). Each micro-batch flows through the full
    apply path (normalize -> dead-letter -> LWW MERGE -> lineage).
    """

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        runner.apply_batch(batch_df, batch_id=f"stream-epoch-{epoch_id}")

    writer = (
        events_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    t = trigger or {"availableNow": True}
    return writer.trigger(**t).start()


def file_change_stream(spark, path: str, schema) -> DataFrame:
    """A file-drop WAL tail: new parquet files under ``path`` become
    micro-batches (the reference's "new CSV appeared" ingest trigger,
    generalized)."""
    return spark.readStream.schema(schema).parquet(path)

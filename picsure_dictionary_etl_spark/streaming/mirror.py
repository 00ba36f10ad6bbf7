"""CDC relay: mirror one lake table into another through the `lake_cdf`
streaming source — the classic downstream of a change feed (replicate a
table across storage roots / clusters without ever re-reading it).

Shape: ``readStream.format("lake_cdf")`` (optionally paced via
``maxversionsperbatch`` / ``maxbytesperbatch``) → ``foreachBatch`` →
:func:`picsure_dictionary_etl_spark.lake.merge.merge_into` on the
mirror table. Exactly-once falls out of machinery that already exists
on both sides: Spark's offset log makes each source span at-most-once
per epoch, and the lake's batch-id dedup + watermark guard make each
epoch's merge idempotent — a redelivered epoch is a committed no-op.

The LSN remap is the one piece of real design here. Feed rows carry
the SOURCE table's ``_lsn``, but those cannot be replayed into the
mirror directly: a delete change is stamped with the deleted row's
last live LSN (the D-preimage rule documented on ``table_changes``),
so "update at L, then delete" arrives as U@L in one span and D@L in a
later span — and the mirror's watermark guard would drop the D as
already-applied. Instead each micro-batch is re-enveloped with
``_lsn = epoch_id``: valid because a micro-batch is exactly ONE span
diff (at most one row per key — no intra-batch ties to break), and
Spark's checkpointed epoch ids are monotone across restarts, so
cross-batch LWW ordering is preserved by construction.

Mirrors are row-policy materializations: a field-wise (``_pu``) source
streams its RESOLVED state through the feed, so the mirror holds the
same live rows without needing the field-wise machinery.

Reference seam: the reference's consumers re-read whole tables after
each load (README.md:247-260); this relay is the O(change) replacement.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.lake.merge import (
    LSN_COL,
    OP_COL,
    MergeResult,
    _payload_cols,
    merge_into,
)
from picsure_dictionary_etl_spark.lake.table import LakeTable


def apply_feed_batch(
    dst: LakeTable,
    feed: DataFrame,
    epoch_id: int,
    batch_prefix: str = "cdf-mirror",
    **merge_kwargs: Any,
) -> MergeResult:
    """Apply ONE `lake_cdf` micro-batch (one span diff) to the mirror.

    Usable directly as a ``foreachBatch`` body. Rows are re-enveloped
    with ``_op = _change`` and ``_lsn = epoch_id`` (see module
    docstring for why the source LSNs must not be replayed verbatim).
    Redelivering an epoch is a committed no-op (batch-id dedup).
    """
    snap = dst.current()
    src = feed.select(
        F.col("_change").alias(OP_COL),
        F.lit(int(epoch_id)).cast("long").alias(LSN_COL),
        *[F.col(k) for k in snap.key_cols],
        *[F.col(c) for c in _payload_cols(snap)],
    )
    return merge_into(
        dst, src, batch_id=f"{batch_prefix}-{int(epoch_id)}", **merge_kwargs
    )


def mirror_table(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    checkpoint_dir: str,
    *,
    reader_options: dict[str, str] | None = None,
    merge_kwargs: dict[str, Any] | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the relay query: changes of ``src_root`` → ``dst_root``.

    Creates the mirror on first use with the source's schema, keys and
    bucket layout (payload + ``_op``/``_lsn`` system columns — a
    row-policy materialization). Returns the ``StreamingQuery``; with
    the default ``available_now=True`` one call drains everything
    currently pending (pass ``reader_options={"maxversionsperbatch":
    "N"}`` to bound each micro-batch; Python sources run ONE micro-batch
    per availableNow pass, so paced catch-up takes several calls on the
    same checkpoint — each pass picks up exactly where the offset log
    left off). To mirror a table whose early history is vacuumed, pass
    ``reader_options={"initialsnapshot": "true"}`` — the first epoch
    applies the source's full resolved state as inserts, later epochs
    stream incrementally (streaming/cdf_source.py bootstrap).
    """
    from picsure_dictionary_etl_spark.streaming.cdf_source import (
        LakeChangeFeedDataSource,
    )

    spark.dataSource.register(LakeChangeFeedDataSource)
    src_snap = LakeTable.load(spark, src_root).current()
    if LakeTable.exists(dst_root):
        dst = LakeTable.load(spark, dst_root)
    else:
        import pyspark.sql.types as T

        # row-policy materialization: field-wise system extras stay out
        schema = T.StructType(
            [f for f in src_snap.schema.fields if f.name not in ("_pu", "_del_lsn")]
        )
        dst = LakeTable.create(
            spark,
            dst_root,
            schema=schema,
            key_cols=list(src_snap.key_cols),
            bucket_by=list(src_snap.bucket_by),
            bucket_count=src_snap.bucket_count,
        )

    reader = spark.readStream.format("lake_cdf").option("path", src_root)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_feed_batch(dst, batch_df, epoch_id, **(merge_kwargs or {}))

    writer = (
        reader.load()
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

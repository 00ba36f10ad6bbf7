"""Structured Streaming front-end: file-drop WAL tail -> foreachBatch
apply -> exactly-once lake commits."""

import os

from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
from picsure_dictionary_etl_spark.cdc.generator import change_events
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
from picsure_dictionary_etl_spark.streaming.microbatch import (
    file_change_stream,
    stream_into_table,
)


def test_stream_apply_available_now(spark, tmp_path):
    src = str(tmp_path / "wal")
    ev = change_events(spark, 500, n_convs=10, delete_ratio=0.1)
    ev.write.mode("overwrite").parquet(src)

    runner = CdcRunner(spark, RunnerConfig(table_root=str(tmp_path / "t"), bucket_count=4))
    stream = file_change_stream(spark, src, change_event_schema())
    q = stream_into_table(stream, runner, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    n1 = runner.state().count()
    assert n1 > 0

    # drop more WAL files; a restarted stream picks up only the new ones
    ev2 = change_events(spark, 500, n_convs=10, start_lsn=500)
    ev2.write.mode("append").parquet(src)
    q2 = stream_into_table(
        file_change_stream(spark, src, change_event_schema()),
        runner,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    n2 = runner.state().count()
    assert n2 >= n1
    assert runner.watermark() == 999


def test_stream_partial_update_policy(spark, tmp_path):
    """A partial-update CDC stream through the Structured Streaming
    front-end: RunnerConfig(update_policy='coalesce') rides foreachBatch
    into field-wise MOR deltas; unspecified fields survive."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "wal")
    seed = spark.createDataFrame(
        [(1, "I", "c1", 0, "user", "hello", "cli", None)], change_event_schema()
    )
    partial = spark.createDataFrame(
        [(2, "U", "c1", 0, None, "edited", None, None)], change_event_schema()
    )
    seed.unionByName(partial).write.mode("overwrite").parquet(src)

    runner = CdcRunner(spark, RunnerConfig(
        table_root=str(tmp_path / "t"), bucket_count=4, normalize=False,
        update_policy="coalesce"))
    q = stream_into_table(
        file_change_stream(spark, src, change_event_schema()),
        runner, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    row = runner.state().filter(F.col("conv_id") == "c1").collect()[0]
    # both events land in one micro-batch: the field-wise reduce keeps
    # role/tool from the seed, text from the partial
    assert (row["role"], row["text"], row["tool"]) == ("user", "edited", "cli")

"""URI table roots: the data plane runs through Hadoop FileSystem (the
layer Spark's executors write through), exercised end-to-end on the
``file:`` scheme — create -> merge -> resume -> point lookup -> vacuum,
plus the documented degrades (footer lineage -> winner counts)."""

import os

from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
from picsure_dictionary_etl_spark.lake.table import LakeTable


def _ev(spark, rows):
    return spark.createDataFrame(rows, change_event_schema())


def test_file_uri_root_full_lifecycle(spark, tmp_path):
    root = f"file:{tmp_path}/t"
    r = CdcRunner(spark, RunnerConfig(table_root=root, bucket_count=4,
                                      normalize=False))
    m = r.apply_batch(_ev(spark, [
        (1, "I", "c1", 0, "user", "hello", None, None),
        (2, "I", "c2", 0, "user", "bye", None, None),
        (3, "D", "c2", 0, None, None, None, None),
    ]), "b1").metrics
    # footer lineage degrades to the in-plan winner count on URI roots
    assert m["per_bucket_rows"] == {} and m["rows_written"] == m["winners"] == 2
    assert {(x["conv_id"], x["turn_idx"]) for x in r.state().collect()} == {("c1", 0)}

    # resume through a fresh handle on the URI root
    r2 = CdcRunner(spark, RunnerConfig(table_root=root, bucket_count=4,
                                       normalize=False))
    assert r2.watermark() == 3
    assert r2.apply_batch(_ev(spark, [
        (1, "I", "c1", 0, "user", "hello", None, None)]), "b1"
    ).metrics.get("skipped_duplicate_batch")

    # point lookup + conversation work through the Hadoop listing
    assert r2.conversation("c1").count() == 1
    got = LakeTable.load(spark, root).read_keys(["c1"]).count()
    assert got == 1


def test_file_uri_vacuum_gc(spark, tmp_path):
    root = f"file:{tmp_path}/v"
    r = CdcRunner(spark, RunnerConfig(table_root=root, bucket_count=2,
                                      normalize=False, compact_threshold=1))
    for i in range(4):
        r.apply_batch(_ev(spark, [
            (i + 1, "I", f"c{i}", 0, "user", "x", None, None)]), f"b{i}")
    stats = r.table.vacuum(keep_snapshots=2)
    assert stats["files_removed"] >= 1  # superseded deltas GC'd via Hadoop FS
    assert r.state().count() == 4
    # only referenced parquet files remain on disk
    local = str(tmp_path / "v")
    on_disk = {
        os.path.relpath(os.path.join(dp, f), local)
        for dp, _d, fs in os.walk(os.path.join(local, "data")) for f in fs
        # Hadoop LocalFileSystem checksum siblings (.part-*.crc) are
        # hidden from its listings and travel with their data file;
        # object stores don't have them — exclude from the GC check
        if not f.startswith((".", "_"))
    }
    cur = r.table.current_version()
    referenced = set()
    for v in (cur - 1, cur):  # keep_snapshots=2
        referenced.update(r.table.snapshot(v).all_files())
    assert on_disk <= referenced
    assert all(f.endswith(".parquet") for f in on_disk)  # side-files GC'd


def test_file_uri_fieldwise_partial_updates(spark, tmp_path):
    """Field-wise MOR deltas (schema evolution + _pu tagging +
    compaction) through the Hadoop data plane on a file: root."""
    root = f"file:{tmp_path}/pu"
    r = CdcRunner(spark, RunnerConfig(table_root=root, bucket_count=2,
                                      normalize=False, update_policy="coalesce",
                                      compact_threshold=2))
    r.apply_batch(_ev(spark, [
        (1, "I", "c1", 0, "user", "hello", "cli", None)]), "seed")
    for i, patch in enumerate([
        (2, "U", "c1", 0, None, "e1", None, None),
        (3, "U", "c1", 0, "adm", None, None, None),
        (4, "U", "c1", 0, None, None, "web", None),
    ]):
        r.apply_batch(_ev(spark, [patch]), f"p{i}")
    row = r.state().collect()[0]
    assert (row["role"], row["text"], row["tool"]) == ("adm", "e1", "web")
    # compaction ran through the URI listing (threshold 2, 4 commits)
    assert any(
        r.table.snapshot(v).lineage.get("buckets_compacted")
        for v in range(2, r.table.current_version() + 1)
        if r.table.snapshot(v).lineage
    )

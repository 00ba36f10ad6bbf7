"""Adaptive skew salting: per-bucket lineage from batch N engages
salting for batch N+1 when one bucket dominates, final state unchanged."""

import json

from picsure_dictionary_etl_spark.cdc.generator import (
    change_events,
    expected_final_state,
)
from picsure_dictionary_etl_spark.cdc.normalize import normalize_events, split_dead_letter
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig


def test_auto_salt_engages_on_skew_and_state_is_unchanged(spark, tmp_path):
    # Winner-level skew is what the write path feels: event-count skew
    # alone collapses in the map-side LWW combine, so the hot conv also
    # needs many distinct turns (winners) to load its bucket.
    events = change_events(
        spark, 9000, n_convs=8, turns_per_conv=256,
        hot_fraction=0.9, hot_convs=1,
    )
    lineage = str(tmp_path / "lineage.jsonl")
    runner = CdcRunner(
        spark,
        RunnerConfig(
            table_root=str(tmp_path / "t"),
            lineage_path=lineage,
            bucket_count=8,
            auto_salt=True,
            auto_salt_min_rows=500,
            auto_salt_factor=3.0,
        ),
    )
    runner.replay(events, lsn_step=3000)

    lines = [json.loads(l) for l in open(lineage)]
    assert len(lines) == 3
    # batch 1 runs unsalted (no skew observed yet); the 90%-hot-conv
    # bucket then trips the detector for subsequent batches
    assert lines[0]["salt_partitions"] is None
    assert any(l["salt_partitions"] for l in lines[1:])

    # correctness is orthogonal to the physical salting decision
    valid, _ = split_dead_letter(normalize_events(events))
    want = expected_final_state(valid.toPandas())
    got = (
        runner.state()
        .toPandas()[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got,
        want[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True),
        check_dtype=False,
    )


def test_auto_salt_stays_off_without_skew(spark, tmp_path):
    events = change_events(spark, 6000, n_convs=300, hot_fraction=0.0)
    lineage = str(tmp_path / "lineage.jsonl")
    runner = CdcRunner(
        spark,
        RunnerConfig(
            table_root=str(tmp_path / "t"),
            lineage_path=lineage,
            bucket_count=8,
            auto_salt=True,
            auto_salt_min_rows=500,
        ),
    )
    runner.replay(events, lsn_step=3000)
    lines = [json.loads(l) for l in open(lineage)]
    assert all(not l["salt_partitions"] for l in lines)


def test_auto_vacuum_bounds_disk(spark, tmp_path):
    """vacuum_every GC's superseded files mid-replay; state unaffected."""
    import os

    events = change_events(spark, 4000, n_convs=20, turns_per_conv=20, update_ratio=0.6)
    root = str(tmp_path / "t")
    runner = CdcRunner(
        spark,
        RunnerConfig(
            table_root=root,
            lineage_path=str(tmp_path / "lineage.jsonl"),
            bucket_count=4,
            compact_threshold=1,  # compact constantly -> superseded deltas
            vacuum_every=2,
            vacuum_keep_snapshots=2,
        ),
    )
    runner.replay(events, lsn_step=500)

    lines = [json.loads(l) for l in open(tmp_path / "lineage.jsonl")]
    vacs = [l["vacuum"] for l in lines if "vacuum" in l]
    assert vacs and any(v["files_removed"] > 0 for v in vacs)

    # every file still on disk is referenced by a retained snapshot,
    # and the live state is intact
    snap = runner.table.current()
    referenced = set(snap.all_files())
    for prev in range(max(0, snap.version - 1), snap.version):
        referenced |= set(runner.table.snapshot(prev).all_files())
    on_disk = {
        os.path.relpath(os.path.join(dp, f), root)
        for dp, _, fs in os.walk(os.path.join(root, "data"))
        for f in fs
        if f.endswith(".parquet")
    }
    assert on_disk <= referenced | set()  # no unreferenced leftovers beyond horizon
    assert set(snap.all_files()) <= on_disk  # nothing referenced is missing
    assert runner.state().count() > 0
    assert runner.watermark() == 3999


def test_auto_combine_first_engages_on_duplicate_storm(spark, tmp_path):
    """The hot-KEY storm signal auto-salt can't see: duplicate factor
    rows_in/winners from the conflict lineage flips the NEXT batch to
    the map-side combine-first plan, and flips back when it subsides."""
    from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
    from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig

    r = CdcRunner(spark, RunnerConfig(
        table_root=str(tmp_path / "t"), bucket_count=4, normalize=False,
        auto_combine_first=True, auto_salt_min_rows=100))
    # batch 1: a 10x-duplicate storm on one key
    storm = [(i + 1, "U", "hot", 0, "user", f"v{i}", None, None)
             for i in range(900)] + [
        (1000 + i, "I", f"c{i}", 0, "user", "x", None, None) for i in range(100)
    ]
    m1 = r.apply_batch(
        spark.createDataFrame(storm, change_event_schema()), "b1").metrics
    assert m1["lww_conflicts"] >= 899
    assert r._auto_combine_active is True  # engaged for the NEXT batch

    # batch 2 runs combine-first (lineage records it), but is well-spread
    spread = [(2000 + i, "I", f"d{i}", 0, "user", "y", None, None)
              for i in range(200)]
    m2 = r.apply_batch(
        spark.createDataFrame(spread, change_event_schema()), "b2").metrics
    assert m2["combine_first"] is True
    assert r._auto_combine_active is None  # storm subsided: back to 1-shuffle

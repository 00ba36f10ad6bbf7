"""Lake maintenance: time travel, vacuum, kill -9 crash recovery,
LWW property test (hypothesis)."""

import os
import signal
import subprocess
import sys
import time

import pandas as pd

from picsure_dictionary_etl_spark.cdc.generator import change_events, expected_final_state
from picsure_dictionary_etl_spark.cdc.normalize import normalize_events, split_dead_letter
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
from picsure_dictionary_etl_spark.lake.merge import resolve_live


def test_time_travel_and_vacuum(spark, tmp_path):
    events = change_events(spark, 1200, n_convs=15, delete_ratio=0.1)
    runner = CdcRunner(
        spark,
        RunnerConfig(table_root=str(tmp_path / "t"), bucket_count=4, compact_threshold=2),
    )
    runner.replay(events, lsn_step=400)
    t = runner.table
    v_final = t.current_version()
    assert v_final >= 3

    # time travel: version 1 state differs from final, both readable
    keys, payload = ["conv_id", "turn_idx"], ["role", "text", "tool", "ts"]
    v1_rows = resolve_live(t.read_version(1), keys, payload).count()
    final_rows = runner.state().count()
    assert v1_rows > 0 and v1_rows != final_rows

    # vacuum keeps the last 2 snapshots; older manifests + orphans go
    n_parquet_before = sum(
        len(fs) for _, _, fs in os.walk(tmp_path / "t" / "data") for f in [fs]
    )
    stats = t.vacuum(keep_snapshots=2)
    assert stats["snapshots_kept"] == 2
    # current state unchanged after vacuum
    assert runner.state().count() == final_rows
    # old snapshot no longer readable
    import pytest

    with pytest.raises(FileNotFoundError):
        t.snapshot(v_final - 2)
    _ = n_parquet_before


KILL_WORKER = """
import sys
sys.path.insert(0, {repo!r})
from picsure_dictionary_etl_spark.session import get_spark
from picsure_dictionary_etl_spark.cdc.generator import change_events
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
spark = get_spark("kill-worker", master="local[2]", shuffle_partitions=4)
events = change_events(spark, 3000, n_convs=30, delete_ratio=0.1)
r = CdcRunner(spark, RunnerConfig(table_root={root!r}, bucket_count=4))
r.replay(events, lsn_step=300)
print("REPLAY_DONE", flush=True)
"""


def test_kill9_midreplay_then_resume(spark, tmp_path):
    """SIGKILL the replay process once a commit lands; a fresh runner
    resumes from the committed watermark and converges to the oracle."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "t")
    code = KILL_WORKER.format(repo=repo, root=root)
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    version_file = os.path.join(root, "_meta", "VERSION")
    deadline = time.time() + 240
    while time.time() < deadline:
        if os.path.exists(version_file):
            with open(version_file) as f:
                if int(f.read().strip() or 0) >= 2:
                    break
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid (weaker) run
        time.sleep(0.2)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()

    events = change_events(spark, 3000, n_convs=30, delete_ratio=0.1)
    runner = CdcRunner(spark, RunnerConfig(table_root=root, bucket_count=4))
    assert runner.watermark() >= -1
    runner.replay(events, lsn_step=300)

    valid, _ = split_dead_letter(normalize_events(events))
    oracle = expected_final_state(valid.toPandas())
    got = (
        runner.state()
        .toPandas()[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lww_property_hypothesis(spark):
    """Property: for ANY event sequence, engine LWW+delete semantics
    equal the sequential pandas oracle."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
    from picsure_dictionary_etl_spark.lake.merge import OP_COL, lww_winners
    from pyspark.sql import functions as F

    event = st.tuples(
        st.integers(0, 3),               # conv
        st.integers(0, 3),               # turn
        st.sampled_from(["I", "U", "D"]),
        st.text(alphabet="abc ", max_size=5),
    )

    @given(st.lists(event, min_size=1, max_size=25))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(seq):
        rows = [
            (i, op, f"c{conv}", turn, "user", text, None, None)
            for i, (conv, turn, op, text) in enumerate(seq)
        ]
        df = spark.createDataFrame(rows, change_event_schema())
        live = (
            lww_winners(df, ["conv_id", "turn_idx"], ["role", "text", "tool", "ts"])
            .filter(F.col(OP_COL) != "D")
        )
        got = {
            (r["conv_id"], r["turn_idx"]): r["text"] for r in live.collect()
        }
        state = {}
        for i, (conv, turn, op, text) in enumerate(seq):
            key = (f"c{conv}", turn)
            if op == "D":
                state.pop(key, None)
            else:
                state[key] = text
        assert got == state

    check()


def test_fieldwise_property_hypothesis(spark):
    """Property: for ANY partial-event sequence, the field-wise reduce
    (D7 coalesce semantics) equals the sequential pandas oracle — each
    field keeps the latest SPECIFIED value, deletes reset all fields."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from picsure_dictionary_etl_spark.cdc.envelope import change_event_schema
    from picsure_dictionary_etl_spark.lake.merge import OP_COL, lww_winners_fieldwise
    from pyspark.sql import functions as F

    event = st.tuples(
        st.integers(0, 2),                              # conv
        st.integers(0, 2),                              # turn
        st.sampled_from(["I", "U", "U", "D"]),
        st.one_of(st.none(), st.text(alphabet="ab", max_size=3)),   # text
        st.one_of(st.none(), st.sampled_from(["user", "tool"])),    # role
    )

    @given(st.lists(event, min_size=1, max_size=25))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(seq):
        rows = [
            (i, op, f"c{conv}", turn, role, text, None, None)
            for i, (conv, turn, op, text, role) in enumerate(seq)
        ]
        df = spark.createDataFrame(rows, change_event_schema())
        live = lww_winners_fieldwise(
            df, ["conv_id", "turn_idx"], ["role", "text", "tool", "ts"],
            policy="coalesce",
        ).filter(F.col(OP_COL) != "D")
        got = {
            (r["conv_id"], r["turn_idx"]): (r["text"], r["role"])
            for r in live.collect()
        }
        state = {}
        last_op = {}
        for i, (conv, turn, op, text, role) in enumerate(seq):
            key = (f"c{conv}", turn)
            if op == "D":
                state.pop(key, None)
                last_op[key] = "D"
                continue
            cur = state.get(key, (None, None))
            state[key] = (text if text is not None else cur[0],
                          role if role is not None else cur[1])
            last_op[key] = op
        want = {k: v for k, v in state.items() if last_op[k] != "D"}
        assert got == want

    check()

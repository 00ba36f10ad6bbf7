"""Everything-at-once integration: mid-replay additive schema
evolution + adaptive salting + inline compaction + a simulated crash
(new runner process state) — final state must still equal the
sequential pandas oracle, per-turn text equality under stable
ordering (BASELINE.json north_rule's replay contract)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from picsure_dictionary_etl_spark.cdc.generator import change_events, expected_final_state
from picsure_dictionary_etl_spark.cdc.normalize import normalize_events, split_dead_letter
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig


def test_evolution_salt_compaction_crash_resume(spark, tmp_path):
    # winner-skewed stream: one hot conversation with many turns
    ev1 = change_events(
        spark, 4000, n_convs=8, turns_per_conv=200,
        hot_fraction=0.8, hot_convs=1, delete_ratio=0.08, malformed_ratio=0.01,
    )
    # second half arrives with a NEW column (additive evolution)
    ev2 = change_events(
        spark, 4000, n_convs=8, turns_per_conv=200,
        hot_fraction=0.8, hot_convs=1, delete_ratio=0.08, malformed_ratio=0.01,
        start_lsn=4000,
    ).withColumn("model", F.concat(F.lit("m-"), (F.col("_lsn") % 3).cast("string")))

    cfg = dict(
        table_root=str(tmp_path / "t"),
        lineage_path=str(tmp_path / "lineage.jsonl"),
        bucket_count=8,
        compact_threshold=2,  # force inline compactions
        auto_salt=True,
        auto_salt_min_rows=300,
        auto_salt_factor=3.0,
    )
    runner = CdcRunner(spark, RunnerConfig(**cfg))
    runner.replay(ev1, lsn_step=1000)
    assert runner.watermark() == 3999

    # "crash": a brand-new runner (fresh adaptive-salt state, table
    # reloaded from disk) continues the replay with the evolved stream
    runner2 = CdcRunner(spark, RunnerConfig(**cfg))
    runner2.replay(ev2, lsn_step=1000)
    assert runner2.watermark() == 7999
    assert "model" in [f.name for f in runner2.table.current().schema.fields]

    # oracle: sequential pandas apply over the full normalized stream
    both = ev1.withColumn("model", F.lit(None).cast(T.StringType())).unionByName(ev2)
    valid, _ = split_dead_letter(normalize_events(both))
    want = expected_final_state(valid.toPandas())

    got = (
        runner2.state()
        .toPandas()[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want_t = (
        want[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want_t, check_dtype=False)

    # pre-evolution rows read back with null model; evolved rows keep it
    models = runner2.state().select("model").distinct().collect()
    assert any(r["model"] is None for r in models)
    assert any(r["model"] is not None for r in models)

    # the adaptive salter engaged at least once, and compaction ran
    import json

    lines = [json.loads(l) for l in open(cfg["lineage_path"])]
    assert any(l.get("salt_partitions") for l in lines)
    assert any(l.get("buckets_compacted") for l in lines)

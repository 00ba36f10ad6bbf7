"""Coverage closers for the remaining partial rows of SURVEY.md §2:
A7 curated-JSON source, H1/A14 truncate, H3 subtree delete."""

import json

import pytest
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.cdc.generator import change_events
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig
from picsure_dictionary_etl_spark.operators.paths import delete_subtree, subtree
from picsure_dictionary_etl_spark.sources.csv import read_curated_json


# --- A7: curated-JSON concept source ---------------------------------------


def test_read_curated_json(spark, tmp_path):
    payload = [
        {
            "name": "SEX\nOF PARTICIPANT",
            "concept_path": "\\study\\demo\\SEX\\",
            "display": "Sex",
            "metadata": {"description": "participant sex", "unit": ""},
        },
        {
            # no display -> defaults to name; numeric metadata values
            # arrive as their JSON token strings (JSONObject.toString)
            "name": "AGE",
            "concept_path": "\\study\\demo\\AGE\\",
            "metadata": {"max": "85"},
        },
    ]
    p = tmp_path / "curated.json"
    p.write_text(json.dumps(payload))

    concepts, meta = read_curated_json(spark, str(p), "study")
    rows = {r["concept_path"]: r for r in concepts.collect()}
    assert rows["\\study\\demo\\SEX\\"]["display"] == "Sex"
    # newline normalized to space (ConceptController.java:289)
    assert rows["\\study\\demo\\SEX\\"]["name"] == "SEX OF PARTICIPANT"
    assert rows["\\study\\demo\\AGE\\"]["display"] == "AGE"
    assert all(r["concept_type"] == "categorical" for r in rows.values())
    assert all(r["dataset_ref"] == "study" for r in rows.values())

    m = {(r["concept_path"], r["key"]): r["value"] for r in meta.collect()}
    assert m[("\\study\\demo\\SEX\\", "description")] == "participant sex"
    assert m[("\\study\\demo\\AGE\\", "max")] == "85"


# --- H1/A14: truncate -------------------------------------------------------


def test_truncate_clean_slate_replay(spark, tmp_path):
    events = change_events(spark, 1000, n_convs=10, delete_ratio=0.1)
    runner = CdcRunner(spark, RunnerConfig(table_root=str(tmp_path / "t"), bucket_count=4))
    runner.replay(events, lsn_step=500)
    before = runner.state().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(before) > 0
    v_before = runner.table.current_version()

    snap = runner.table.truncate()
    assert snap.files == {}
    assert runner.state().count() == 0
    assert runner.watermark() == -1
    # metadata-only: prior snapshot still time-travel readable
    assert runner.table.read_version(v_before).count() > 0

    # the same WAL replays from scratch to the identical state
    runner.replay(events, lsn_step=500)
    after = runner.state().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(before, after, check_dtype=False)


def test_truncate_keep_bookkeeping(spark, tmp_path):
    events = change_events(spark, 500, n_convs=5)
    runner = CdcRunner(spark, RunnerConfig(table_root=str(tmp_path / "t"), bucket_count=4))
    runner.replay(events, lsn_step=500)
    wm = runner.watermark()
    runner.table.truncate(reset_exactly_once=False)
    assert runner.state().count() == 0
    assert runner.watermark() == wm  # update_info preserved
    # replay is a no-op: everything is at or below the watermark
    results = runner.replay(events, lsn_step=500)
    assert results == [] or all(r.metrics.get("rows_in") in (0, None) for r in results)
    assert runner.state().count() == 0


# --- H3: subtree delete ------------------------------------------------------


@pytest.fixture(scope="module")
def tree(spark):
    rows = [
        ("\\s\\lab\\",),
        ("\\s\\lab\\glucose\\",),
        ("\\s\\lab\\glucose\\fasting\\",),
        ("\\s\\lab\\insulin\\",),
        ("\\s\\demo\\age\\",),
        # sibling whose name shares the prefix STRING but not the node
        ("\\s\\lab\\glucose_alt\\",),
    ]
    return spark.createDataFrame(rows, ["concept_path"])


def test_subtree_collect(spark, tree):
    got = {r["concept_path"] for r in subtree(tree, "\\s\\lab\\glucose\\").collect()}
    assert got == {"\\s\\lab\\glucose\\", "\\s\\lab\\glucose\\fasting\\"}


def test_delete_subtree_survivors(spark, tree):
    got = {r["concept_path"] for r in delete_subtree(tree, "\\s\\lab\\glucose\\").collect()}
    assert "\\s\\lab\\glucose\\" not in got
    assert "\\s\\lab\\glucose\\fasting\\" not in got
    # trailing-backslash-rooted prefix keeps glucose_alt (not a descendant)
    assert "\\s\\lab\\glucose_alt\\" in got
    assert len(got) == 4

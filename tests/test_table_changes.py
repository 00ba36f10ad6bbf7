"""Change data feed between snapshots (the Iceberg/Delta CDF analog):
inserted / updated / deleted keys classified from two resolved
snapshots, chainable by downstream incremental consumers."""

import datetime

from picsure_dictionary_etl_spark.cdc.envelope import (
    TRANSCRIPT_KEY,
    change_event_schema,
    transcript_table_schema,
)
from picsure_dictionary_etl_spark.lake.merge import merge_into, table_changes
from picsure_dictionary_etl_spark.lake.table import LakeTable

TS = datetime.datetime(2025, 1, 1)


def test_table_changes_classification(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema=transcript_table_schema(),
        key_cols=TRANSCRIPT_KEY,
        bucket_by=["conv_id"],
        bucket_count=4,
    )

    def ev(rows):
        return spark.createDataFrame(rows, change_event_schema())

    merge_into(
        t,
        ev(
            [
                (1, "I", "a", 0, "user", "hello", None, TS),
                (2, "I", "a", 1, "assistant", "hi", None, TS),
                (3, "I", "b", 0, "user", "yo", None, TS),
            ]
        ),
        "b1",
    )
    v1 = t.current().version
    merge_into(
        t,
        ev(
            [
                (4, "U", "a", 0, "user", "hello-edited", None, TS),  # update
                (5, "D", "a", 1, None, None, None, None),            # delete
                (6, "I", "c", 0, "user", "new", None, TS),           # insert
                (7, "U", "b", 0, "user", "yo", None, TS),            # no-op value
            ]
        ),
        "b2",
    )
    v2 = t.current().version

    got = {
        (r["_change"], r["conv_id"], r["turn_idx"]): r["text"]
        for r in table_changes(t, v1, v2).collect()
    }
    # (b,0) rewrote the same values at a higher LSN -> NOT a change
    assert got == {
        ("U", "a", 0): "hello-edited",
        ("D", "a", 1): None,
        ("I", "c", 0): "new",
    }

    # self-diff is empty; full-history diff is all inserts
    assert table_changes(t, v2, v2).count() == 0
    first = table_changes(t, 0, v2)
    assert {r["_change"] for r in first.collect()} == {"I"}
    assert first.count() == 3

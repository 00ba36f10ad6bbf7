"""Round-trip: replay -> export -> re-ingest into a fresh table ->
identical state (the reference's own replay-reproduces-state check,
``export/DictionaryCSVServiceTest.java:105-179``)."""

import pandas as pd
import pytest

from picsure_dictionary_etl_spark.cdc.export import export_state, import_as_change_stream
from picsure_dictionary_etl_spark.cdc.generator import change_events
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig


@pytest.mark.parametrize("fmt", ["csv", "parquet"])
def test_export_reingest_roundtrip(spark, tmp_path, fmt):
    events = change_events(spark, 1500, n_convs=25, delete_ratio=0.1, hot_fraction=0.3)
    r1 = CdcRunner(spark, RunnerConfig(table_root=str(tmp_path / "t1"), bucket_count=4))
    r1.replay(events, lsn_step=500)
    export_state(r1, str(tmp_path / "export"), fmt=fmt)

    stream = import_as_change_stream(spark, str(tmp_path / "export"), fmt=fmt)
    r2 = CdcRunner(
        spark,
        RunnerConfig(table_root=str(tmp_path / "t2"), bucket_count=4, normalize=False),
    )
    r2.apply_batch(stream, "reingest")

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = r1.state().toPandas()[cols].sort_values(cols[:2]).reset_index(drop=True)
    b = r2.state().toPandas()[cols].sort_values(cols[:2]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

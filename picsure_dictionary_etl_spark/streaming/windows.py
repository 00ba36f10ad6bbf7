"""Event-time windowed aggregation with watermarks (SURVEY.md §2.J):
the late-data story for stream-side rollups (per-window event counts,
ingest-rate monitoring, per-conversation activity windows).

Semantics (Spark's standard watermark contract): a window finalizes —
is emitted once (append mode) and its state evicted — when the
watermark (max event time seen minus the delay) passes its END; a late
row whose window has already finalized is DISCARDED, while a late row
whose window is still open is aggregated normally. Downstream
consumers therefore see each window exactly once (idempotent re-read).

Scale note: the state store holds only open windows (bounded by
watermark horizon x key cardinality); partial aggregation combines
map-side before the keyed-state shuffle, same as the batch LWW reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.lake.merge import LSN_COL


def windowed_event_counts(
    events_stream: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window event counts (optionally per ``group_cols``)
    with late-data drop. Output: window_start, window_end, group cols,
    n_events, max_lsn."""
    groups = [F.window(F.col(ts_col), window)] + [F.col(c) for c in group_cols or []]
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if LSN_COL in events_stream.columns:
        aggs.append(F.max(LSN_COL).alias("max_lsn"))
    out = events_stream.withWatermark(ts_col, watermark).groupBy(*groups).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(group_cols or []),
        *[c for c in ("n_events", "max_lsn") if c in out.columns],
    )

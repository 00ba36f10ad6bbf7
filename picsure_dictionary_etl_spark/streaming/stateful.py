"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.J — the arbitrary-state API for semantics windowed aggs
can't express).

``dedup_stream_by_lsn`` — a cross-batch LWW *prefilter*: per key, state
holds the max LSN already emitted; any event at or below it is dropped
before it ever reaches the shuffle/merge. On redelivery-heavy sources
(at-least-once upstreams replaying WAL segments) this cuts the merge's
input volume at the cost of keyed state. The lake merge itself stays
idempotent without it (watermark guard, ``lake/merge.py``) — this
operator is an *optimization*, not a correctness requirement, which is
exactly how a 1000-executor deployment would want it: state is
per-key-group, partitioned by the stream's groupBy hash, checkpointed
by Spark's state store, and sized O(distinct keys x 8 bytes).

Reference analog: the reference dedups re-POSTed payloads with
DB-unique-constraint upserts (``concept/ConceptService.java:180-211``);
under a stream the same guarantee moves into keyed operator state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from picsure_dictionary_etl_spark.lake.merge import LSN_COL


def dedup_stream_by_lsn(
    events_stream: DataFrame,
    key_cols: list[str],
    lsn_col: str = LSN_COL,
) -> DataFrame:
    """Drop events at or below the max LSN emitted for their key in any
    PRIOR micro-batch — such events (redeliveries, or stragglers already
    superseded in applied state) cannot affect LWW final state. Events
    within one micro-batch are not reordered or thinned against each
    other; the merge's in-batch LWW reduce owns that. Arrow-batched;
    state = one long per key."""
    out_schema = events_stream.schema

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Filter every chunk against the PRIOR-batch watermark only —
        # later Arrow chunks of the same micro-batch must not be thinned
        # against earlier chunks' max (a lower-LSN event specifying a
        # different field matters under field-wise merge policies); the
        # new max is tracked separately and committed after the loop.
        prior = state.get[0] if state.exists else -1
        new_max = prior
        for pdf in pdfs:
            keep = pdf[pdf[lsn_col] > prior]
            if len(keep):
                new_max = max(new_max, int(keep[lsn_col].max()))
                yield keep
        state.update((new_max,))

    return events_stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="max_lsn long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Schemas for the transcripts table and its CDC envelope.

Authoritative shape (BASELINE.json ``input_hint``): transcripts are
multi-turn conversation/agent records keyed ``(conv_id, turn_idx)`` with
``role, text, tool, ts``; the change stream wraps them in a binlog/WAL
envelope ``(op ∈ I/U/D, lsn bigint)``.

Reference parity: the envelope generalizes the reference's positional
ColumnMeta row (``loading/model/ColumnMeta.java:5-18``) + file-order
implicit versioning into explicit LSN ordering.
"""

from __future__ import annotations

from pyspark.sql import types as T

from picsure_dictionary_etl_spark.lake.merge import LSN_COL, OP_COL

TRANSCRIPT_KEY = ["conv_id", "turn_idx"]

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]


def transcript_table_schema(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    """Stored table schema: payload + system columns ``_op`` (tombstones
    for merge-on-read deltas) and ``_lsn`` (backs cross-batch LWW,
    ``s.lsn > t.lsn`` merge conditions)."""
    return T.StructType(
        TRANSCRIPT_FIELDS
        + (extra_fields or [])
        + [T.StructField(OP_COL, T.StringType(), False), T.StructField(LSN_COL, T.LongType(), False)]
    )


def change_event_schema(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    return T.StructType(
        [
            T.StructField(LSN_COL, T.LongType(), False),
            T.StructField(OP_COL, T.StringType(), False),
        ]
        + TRANSCRIPT_FIELDS
        + (extra_fields or [])
    )

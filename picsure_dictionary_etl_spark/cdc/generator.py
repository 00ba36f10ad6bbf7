"""Deterministic synthetic change-event generator.

Fully distributed (``spark.range`` + codegen'd hash expressions — no
driver-side row materialization, so the same code generates 10^4 test
events or 10^10 bench events), fully deterministic (every attribute is a
pure function of ``lsn`` and ``seed``; no ``rand()``).

Knobs (FIXTURES.md §1.2): insert/update/delete mix, hot-key skew (a few
conversations receive a large fraction of events — the salting test),
malformed-row fraction (dead-letter path, reference analog
``loading/ColumnMetaSource.java:81-98``), additive new columns after an
LSN threshold (schema-evolution test), duplicate redelivery (run the
same LSN slice twice — exactly-once test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.lake.merge import LSN_COL, OP_COL

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "python", "browser"]
EPOCH = "2025-01-01 00:00:00"


def _h(seed: int, salt: int, *cols) -> F.Column:
    """Deterministic non-negative hash stream keyed by (seed, salt)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(salt), *cols))


def change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 100,
    turns_per_conv: int = 50,
    update_ratio: float = 0.30,
    delete_ratio: float = 0.05,
    hot_fraction: float = 0.0,
    hot_convs: int = 2,
    malformed_ratio: float = 0.0,
    start_lsn: int = 0,
    with_tool_args: bool = False,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """A change-event DataFrame with ``lsn ∈ [start_lsn, start_lsn + n)``.

    op mix: first-ever event for a key is semantically an insert; ops are
    drawn I/U/D by ratio (I and U are equivalent under upsert MERGE
    semantics, mirroring the reference's ON CONFLICT DO UPDATE).
    """
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    lsn = (F.col("id") + F.lit(start_lsn)).alias(LSN_COL)
    df = df.select(lsn)

    # --- key: hot-key skew via a two-tier draw -------------------------
    is_hot = (_h(seed, 1, F.col(LSN_COL)) % 10_000) < int(hot_fraction * 10_000)
    conv_n = F.when(is_hot, _h(seed, 2, F.col(LSN_COL)) % hot_convs).otherwise(
        _h(seed, 3, F.col(LSN_COL)) % n_convs
    )
    turn = (_h(seed, 4, F.col(LSN_COL)) % turns_per_conv).cast("int")

    # --- op mix --------------------------------------------------------
    draw = _h(seed, 5, F.col(LSN_COL)) % 10_000
    op = (
        F.when(draw < int(delete_ratio * 10_000), F.lit("D"))
        .when(draw < int((delete_ratio + update_ratio) * 10_000), F.lit("U"))
        .otherwise(F.lit("I"))
    )

    # --- payload (null for deletes, like a real WAL delete record) -----
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (turn % 4 + 1).cast("int"))
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            (_h(seed, 6, F.col(LSN_COL)) % len(TOOLS) + 1).cast("int"),
        ),
    )
    text = F.concat(
        F.lit("turn "),
        turn.cast("string"),
        F.lit(" of conv "),
        conv_n.cast("string"),
        F.lit(" rev "),
        F.col(LSN_COL).cast("string"),
        # dirty whitespace/control chars for the normalize stage to clean
        F.when(_h(seed, 7, F.col(LSN_COL)) % 5 == 0, F.lit("  \tx\x01y  ")).otherwise(F.lit("")),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(EPOCH).cast("timestamp")) + F.col(LSN_COL) % 86_400
    )

    is_del = op == "D"
    ev = df.select(
        F.col(LSN_COL),
        op.alias(OP_COL),
        F.concat(F.lit("conv-"), conv_n.cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(~is_del, role).alias("role"),
        F.when(~is_del, text).alias("text"),
        F.when(~is_del, tool).alias("tool"),
        F.when(~is_del, ts).alias("ts"),
    )

    # --- malformed rows (dead-letter fodder) ---------------------------
    if malformed_ratio > 0:
        bad = (_h(seed, 8, F.col(LSN_COL)) % 10_000) < int(malformed_ratio * 10_000)
        bad_kind = _h(seed, 9, F.col(LSN_COL)) % 3
        ev = ev.withColumn(
            "conv_id",
            F.when(bad & (bad_kind == 0), F.lit(None).cast("string"))
            .when(bad & (bad_kind == 1), F.lit("null"))
            .otherwise(F.col("conv_id")),
        ).withColumn(
            "turn_idx",
            F.when(bad & (bad_kind == 2), F.lit(-1)).otherwise(F.col("turn_idx")),
        )

    if with_tool_args:
        ev = ev.withColumn(
            "tool_args",
            F.when(
                F.col("tool").isNotNull(),
                F.concat(F.lit('{"q":"'), F.col(LSN_COL).cast("string"), F.lit('"}')),
            ),
        )
    return ev


def expected_final_state(events_pdf):
    """Pandas oracle: apply a change-event frame in strict LSN order;
    return the final live table keyed (conv_id, turn_idx).

    Used only at test scale — the engine itself never does this.
    """
    import pandas

    pdf = events_pdf.sort_values(LSN_COL)
    state: dict = {}
    for d in pdf.to_dict("records"):
        key = (d["conv_id"], d["turn_idx"])
        if d[OP_COL] == "D":
            state.pop(key, None)
        else:
            state[key] = d
    out = list(state.values())
    return pandas.DataFrame(out) if out else pandas.DataFrame(columns=list(pdf.columns))

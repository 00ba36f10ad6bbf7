"""Full-state export + replay re-ingest (SURVEY.md §3.3).

The reference's round-trip contract — export the full dictionary state
to CSVs, re-POST them, get identical state
(``export/DictionaryCSVServiceTest.java:105-179``) — generalized: the
lake table's resolved live state exports to partitioned CSV/parquet,
and an exported snapshot re-ingests as a fresh insert-only change
stream that reproduces the table bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.cdc.runner import CdcRunner
from picsure_dictionary_etl_spark.lake.merge import LSN_COL, OP_COL


def export_state(runner: CdcRunner, out_dir: str, fmt: str = "csv") -> None:
    """Deterministically ordered full-state export (reference: sorted
    refs + per-dataset CSVs, ``DictionaryCSVService.java:75-209``).
    CSV needs timestamp->string; parquet keeps types."""
    state = runner.state().orderBy("conv_id", "turn_idx")
    if fmt == "csv":
        # micros-preserving format: the round-trip contract is
        # bit-for-bit, so sub-second precision must survive the CSV hop
        out = state.select(
            *[
                F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(c)
                if dict(state.dtypes)[c].startswith("timestamp")
                else F.col(c)
                for c in state.columns
            ]
        )
        out.write.mode("overwrite").option("header", True).csv(out_dir)
    else:
        state.write.mode("overwrite").parquet(out_dir)


def import_as_change_stream(
    spark: SparkSession, export_dir: str, fmt: str = "csv",
    start_lsn: int = 0, lsn_range: int = 2**31,
) -> DataFrame:
    """Exported rows -> insert-only change events with fresh synthetic
    LSNs.

    An exported snapshot has exactly one row per key, so the LSNs need
    only (a) exceed ``start_lsn`` (clear the target's watermark) and
    (b) be constant per key — NOT globally unique or dense: the LWW
    reduce compares LSNs within a key, and distinct keys never meet.
    ``xxhash64(key) % lsn_range`` satisfies both with zero shuffle —
    the previous global ``row_number`` forced every exported row
    through ONE task (the classic single-partition sort scale-killer).
    The re-ingested table's watermark lands at ~``start_lsn +
    lsn_range``; callers continuing a live CDC stream afterwards must
    issue LSNs above that (or shrink ``lsn_range``)."""
    if fmt == "csv":
        df = spark.read.option("header", True).csv(export_dir)
        if "turn_idx" in df.columns:
            df = df.withColumn("turn_idx", F.col("turn_idx").cast("int"))
        if "ts" in df.columns:
            df = df.withColumn("ts", F.to_timestamp("ts"))
    else:
        df = spark.read.parquet(export_dir)
    lsn = (
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(int(lsn_range)))
        + F.lit(int(start_lsn) + 1)
    ).cast("long")
    return df.withColumn(LSN_COL, lsn).withColumn(OP_COL, F.lit("I"))

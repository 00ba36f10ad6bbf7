"""Pivot / unpivot / set ops (SURVEY.md §2.F).

Reference: EAV side tables are pivoted wide on export (one column per
distinct metadata key, ``export/DictionaryCSVService.java:466-485``) and
melted back to (key, value) rows on ingest (extra CSV header columns,
``Utility/CSVUtility.java:38-49``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eav_pivot(
    df: DataFrame, id_col: str, key_col: str, value_col: str, keys: list[str] | None = None
) -> DataFrame:
    """F1: long EAV -> wide. Passing ``keys`` explicitly (the reference
    sorts them, ``DictionaryCSVService.java:455``) skips Spark's extra
    distinct-keys job AND pins deterministic column order."""
    gb = df.groupBy(id_col)
    piv = gb.pivot(key_col, keys) if keys else gb.pivot(key_col)
    return piv.agg(F.first(value_col))


def melt(df: DataFrame, id_cols: list[str], value_cols: list[str], drop_blank: bool = True) -> DataFrame:
    """F2: wide -> long (key, value); blanks dropped like the reference's
    dynamic-metadata ingest (``CSVUtility.java:38-49``)."""
    stack_args = ", ".join(f"'{c}', cast(`{c}` as string)" for c in value_cols)
    out = df.select(
        *id_cols, F.expr(f"stack({len(value_cols)}, {stack_args}) as (key, value)")
    )
    if drop_blank:
        out = out.filter(F.col("value").isNotNull() & (F.col("value") != ""))
    return out


def index_aligned_pivot(
    df: DataFrame, group_col: str, value_col: str, keys: list[str] | None = None
) -> DataFrame:
    """F3 (``Facet_Concept_Lists.csv``): one column per group, values
    listed down and index-aligned (``DictionaryCSVService.java:274-319``).
    row_number per group + pivot; ragged columns pad with null. Passing
    ``keys`` (the reference enumerates and sorts them,
    ``DictionaryCSVService.java:455``) skips Spark's extra distinct-keys
    job and pins deterministic column order."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(value_col)
    gb = df.withColumn("_rn", F.row_number().over(w)).groupBy("_rn")
    piv = gb.pivot(group_col, keys) if keys else gb.pivot(group_col)
    return piv.agg(F.first(value_col)).orderBy("_rn")

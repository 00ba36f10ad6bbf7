"""Group-flatten aggregations (SURVEY.md §2.C).

The reference's ``ColumnMetaFlattener`` collapses all rows of one
concept path into a single record: categorical -> set-union of values,
continuous -> min-of-mins / max-of-maxes, representative fields from the
first row (``loading/ColumnMetaFlattener.java:17-93``). Its adjacency
grouping (``ColumnMetaGroupingPipeline.java:25-59``) assumed
path-sorted input; a shuffle groupBy strictly generalizes that.

All aggregations here use hash aggregates with map-side partial combine
— they scale to skewed keys without salting because duplicates collapse
before the shuffle.

Determinism note: the reference's value-set union is JVM-hash-order
nondeterministic (a documented trap); we pin ``array_sort`` order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_categorical(df: DataFrame, key: str, values_col: str) -> DataFrame:
    """C2: per key, the sorted distinct union of array values plus group
    size. (``ColumnMetaFlattener.java:73-93``; golden expectations
    ``DictionaryLoaderServiceIntegrationTest.java:179-193``.)"""
    return df.groupBy(key).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(values_col)))).alias("values"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def flatten_categorical_scalar(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """C2 over a scalar value column: sorted distinct values per key."""
    return df.groupBy(key).agg(
        F.array_sort(F.collect_set(value_col)).alias("values"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def flatten_continuous(df: DataFrame, key: str, min_col: str, max_col: str) -> DataFrame:
    """C3: min-of-mins / max-of-maxes per key
    (``ColumnMetaFlattener.java:31-71``; min/max widening golden
    ``DictionaryLoaderServiceIntegrationTest.java:364-430``)."""
    return df.groupBy(key).agg(
        F.min(min_col).alias("min_val"),
        F.max(max_col).alias("max_val"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def first_wins(df: DataFrame, key_cols: list[str], order_col: str, payload: list[str]) -> DataFrame:
    """C4/D2 first-writer-wins: representative payload from the row with
    the minimum order column (the reference's ``getFirst()`` /
    ``putIfAbsent``). One hash aggregate via min_by, no window sort."""
    agg = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*payload), F.col(order_col)).alias("_w"),
        F.min(order_col).alias(order_col),
    )
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload], order_col)


def last_writer_wins(
    df: DataFrame, key_cols: list[str], order_col: str, payload: list[str]
) -> DataFrame:
    """C4 inverted to the engine's standard: LWW by max order column —
    the CDC dedup primitive (north rule: max-LSN window reduction,
    implemented as max_by for map-side combine)."""
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(order_col)).alias("_w"),
        F.max(order_col).alias(order_col),
    )
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload], order_col)


def mixed_type_conflicts(df: DataFrame, key: str, flag_col: str) -> DataFrame:
    """C3's error path: groups mixing categorical and continuous rows are
    routed to the dead letter (``loading/ColumnMetaTreeBuilder.java:25-31``).
    Returns keys with >1 distinct flag value."""
    return (
        df.groupBy(key)
        .agg(F.countDistinct(flag_col).alias("n_kinds"))
        .filter(F.col("n_kinds") > 1)
        .select(key, "n_kinds")
    )

"""The reference's main ingest (`POST /load/initialize`) re-expressed as
one declarative Spark pipeline (SURVEY.md §3.1).

Reference lifecycle (``loading/DictionaryLoaderService.java:33-64``):
stream columnMeta CSV -> per-row map -> adjacency-group by path ->
flatten -> build concurrent concept tree -> BFS persist. Here the whole
thing is a single DataFrame plan:

    read_column_meta  (A1-A3, B2-B4: typed rows + dead letter)
      -> study filter (B1, root segment allow-list)
      -> groupBy(concept_path) flatten (C2/C3: value union | min-max
         widening with single-value-categorical coercion; mixed-type
         conflict -> error rows)
      -> prefix explode (K: the ColumnMetaTreeBuilder analog) -> distinct
         intermediate nodes, all categorical
         (``ColumnMetaTreeBuilder.java:59`` — "All intermediate nodes are
         Categorical")
      -> union leaves + intermediates with parent_path/dataset derived
         from the path (no surrogate ids, no BFS ordering needed)

Validated against the reference's OWN fixtures + integration goldens
(``DictionaryLoaderServiceIntegrationTest.java``): demographics filter
on the NHANES columnMeta.csv yields exactly 15 concepts; SEX flattens
to [female, male]; area flattens to its 8 values (we pin ascending
order — the reference's HashSet order is JVM-nondeterministic, a
documented trap SURVEY.md §2.C2).

Documented deviation: the reference's mixed-type flatten errors when the
*first* row of a group is categorical (file-order-dependent,
``ColumnMetaFlattener.java:31-35``); the distributed engine uses the
order-free generalization — a mixed group is an error iff any
categorical row has >1 values or a non-numeric single value; otherwise
single-value categoricals coerce into the min/max widening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.functions.columns import path_segments, parent_path
from picsure_dictionary_etl_spark.operators.paths import explode_path_prefixes
from picsure_dictionary_etl_spark.sources.csv import read_column_meta


def load_column_meta_dictionary(
    spark: SparkSession, csv_path: str, allowed_studies: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """columnMeta CSV -> (concept nodes, error rows).

    Node columns: concept_path, parent_path, name, concept_type
    ('categorical' | 'continuous'), values (sorted array), min, max,
    is_timestamp, dataset, is_leaf.
    """
    typed, errors = read_column_meta(spark, csv_path)

    # B1 study filter: root segment in the (lowercased) allow-list;
    # empty list = allow all (StudyFilter.java:11-35)
    if allowed_studies:
        allowed = [s.strip().lower() for s in allowed_studies]
        typed = typed.filter(
            F.lower(F.element_at(path_segments(F.col("concept_path")), 1)).isin(allowed)
        )

    cat = F.col("categorical")
    single_val = cat & (F.size("category_values") == 1)
    coerced = F.when(single_val, F.element_at("category_values", 1).try_cast("double"))
    row_min = F.when(cat, coerced).otherwise(F.col("min"))
    row_max = F.when(cat, coerced).otherwise(F.col("max"))
    bad_in_mixed = (cat & (F.size("category_values") > 1)) | (single_val & coerced.isNull())

    grouped = typed.groupBy("concept_path").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(cat.cast("int")).alias("_all_cat"),
        F.max(bad_in_mixed.cast("int")).alias("_bad_if_mixed"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("category_values")))
        ).alias("values"),
        F.min(row_min).alias("min"),
        F.max(row_max).alias("max"),
        F.max(F.col("is_timestamp").cast("int")).alias("_any_ts"),
        # size-1 groups pass through as-is (ColumnMetaFlattener.java:17-18)
        F.first(cat).alias("_first_cat"),
        F.first("min").alias("_first_min"),
        F.first("max").alias("_first_max"),
    )

    is_single = F.col("n_rows") == 1
    is_cat_group = F.when(is_single, F.col("_first_cat")).otherwise(F.col("_all_cat") == 1)
    conflict = ~is_single & (F.col("_all_cat") == 0) & (F.col("_bad_if_mixed") == 1)

    flat_errors = grouped.filter(conflict).select(
        F.concat(F.lit("mixed concept types for path: "), "concept_path").alias("error_row")
    )
    leaves = grouped.filter(~conflict).select(
        F.col("concept_path"),
        F.when(is_cat_group, F.lit("categorical")).otherwise(F.lit("continuous")).alias(
            "concept_type"
        ),
        F.when(is_cat_group, F.col("values")).otherwise(F.array().cast("array<string>")).alias(
            "values"
        ),
        F.when(~is_cat_group, F.when(is_single, F.col("_first_min")).otherwise(F.col("min"))).alias("min"),
        F.when(~is_cat_group, F.when(is_single, F.col("_first_max")).otherwise(F.col("max"))).alias("max"),
        (F.col("_any_ts") == 1).alias("is_timestamp"),
    )

    # K/tree: every ancestor prefix becomes an intermediate categorical
    # node; leaf rows keep their flattened payload
    prefixes = (
        explode_path_prefixes(leaves, "concept_path")
        .select("prefix")
        .distinct()
        .withColumnRenamed("prefix", "concept_path")
    )
    intermediates = prefixes.join(leaves.select("concept_path"), "concept_path", "left_anti").select(
        F.col("concept_path"),
        F.lit("categorical").alias("concept_type"),
        F.array().cast("array<string>").alias("values"),
        F.lit(None).cast("double").alias("min"),
        F.lit(None).cast("double").alias("max"),
        F.lit(False).alias("is_timestamp"),
        F.lit(False).alias("is_leaf"),
    )
    nodes = leaves.withColumn("is_leaf", F.lit(True)).unionByName(intermediates)

    segs = path_segments(F.col("concept_path"))
    nodes = nodes.select(
        "*",
        parent_path(F.col("concept_path")).alias("parent_path"),
        F.element_at(segs, -1).alias("name"),
        F.element_at(segs, 1).alias("dataset"),
    )
    return nodes, errors.unionByName(flat_errors)

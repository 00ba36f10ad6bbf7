"""Hierarchy operators over backslash-delimited concept paths
(SURVEY.md §2.B/§2.E/§2.K).

The reference materializes a driver-side pointer tree
(``loading/ColumnMetaTreeBuilder.java:36-78`` — each leaf path spawns
its ancestor chain via ``putIfAbsent``). Distributed re-expression: a
prefix *explode* (1 row -> N ancestor rows, the UDTF analog) followed by
a distinct/MERGE — no shared mutable state, no driver tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.functions.columns import PATH_SEP, path_segments


def explode_path_prefixes(df: DataFrame, path_col: str, out_col: str = "prefix") -> DataFrame:
    """Each path row -> one row per ancestor prefix (including itself):
    ``\\a\\b\\c\\`` -> ``\\a\\``, ``\\a\\b\\``, ``\\a\\b\\c\\``.

    Reference: ``ColumnMetaTreeBuilder.addToTree`` walking segments
    (``:52-77``). Spark: posexplode over the segment array + slice —
    pure codegen, one narrow stage.
    """
    segs = path_segments(F.col(path_col))
    return (
        df.select(F.col(path_col), F.posexplode(segs).alias("_pos", "_seg"))
        .select(
            F.col(path_col),
            F.concat(
                F.lit(PATH_SEP),
                F.array_join(
                    F.slice(path_segments(F.col(path_col)), 1, F.col("_pos") + 1), PATH_SEP
                ),
                F.lit(PATH_SEP),
            ).alias(out_col),
            (F.col("_pos") + 1).alias("depth"),
        )
    )


def distinct_concept_nodes(df: DataFrame, path_col: str) -> DataFrame:
    """The tree's node set: distinct prefixes with their depth — what the
    reference persists level-by-level (``ColumnMetaTreePersister.java:92-125``;
    the BFS ordering constraint disappears with natural keys)."""
    return (
        explode_path_prefixes(df, path_col)
        .select("prefix", "depth")
        .distinct()
    )


def subtree(df: DataFrame, root_path: str, path_col: str = "concept_path") -> DataFrame:
    """H3: every node in the subtree rooted at ``root_path`` (the root
    included). The reference BFS-walks descendants by ``parent_id`` with
    a queue (``facet/FacetLoaderService.java:121-132``); under natural
    path keys the whole walk collapses to one prefix predicate — a
    pushed-down ``startswith`` scan filter, no N+1 queries, no driver
    queue."""
    return df.filter(F.col(path_col).startswith(root_path))


def delete_subtree(df: DataFrame, root_path: str, path_col: str = "concept_path") -> DataFrame:
    """H3 complement: the table minus the subtree — the BFS delete's
    survivors (pair with a key-join to cascade mapping tables, the
    reference's facet__concept cleanup)."""
    return df.filter(~F.col(path_col).startswith(root_path))


def leaf_paths(df: DataFrame, path_col: str) -> DataFrame:
    """E3: paths that are no other path's ancestor — a self left-anti
    join on the exploded prefix set (reference: ``WHERE NOT EXISTS
    (child.parent_id = cn.id)``, ``concept/ConceptRepository.java:40-55``)."""
    nodes = df.select(path_col).distinct()
    strict_prefixes = (
        explode_path_prefixes(df, path_col)
        .filter(F.col("prefix") != F.col(path_col))
        .select(F.col("prefix").alias(path_col))
        .distinct()
    )
    return nodes.join(strict_prefixes, path_col, "left_anti")

"""Facet expression rules compiled to Catalyst boolean Columns
(SURVEY.md §2.B6-B9, §2.E7-E8).

The reference evaluates `{exactly, contains, regex, node}` predicates
per concept path, AND within a group, OR across groups, with child
facets inheriting the cross-product of parent groups
(``facet/FacetExpressionEvaluator.java:27-111``,
``facet/FacetLoaderService.java:310-323``). Tagging streams every leaf
concept past every rule (``singlePassMapLeaves``, ``:387-420``).

Engine design: rules are driver-side data (tiny), compiled once into a
boolean Column per facet; tagging is a single projection over the
concept DataFrame — no cross join, no per-row Python. For rule tables
too large to compile into one projection, ``tag_concepts_crossjoin``
broadcasts the rule table instead (BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.functions.columns import path_segments


@dataclass
class Expression:
    """One predicate on one path segment (or all segments when
    ``node_index`` is None). Negative index = from the end; out-of-bounds
    -> no match (``FacetExpressionEvaluator.java:50-111``)."""

    kind: str  # 'exactly' | 'contains' | 'regex'
    value: str
    node_index: int | None = None


@dataclass
class FacetRule:
    name: str
    # OR across groups, AND within a group (``FacetExpressionEvaluator.java:27-48``)
    groups: list[list[Expression]] = field(default_factory=list)
    parent: str | None = None


def _segment_pred(segs: Column, e: Expression) -> Column:
    def pred_on(seg: Column) -> Column:
        if e.kind == "exactly":
            return seg == e.value
        if e.kind == "contains":
            return seg.contains(e.value)
        if e.kind == "regex":
            # Java Matcher.find() is unanchored -> rlike, not regexp_like-anchored
            return seg.rlike(e.value)
        raise ValueError(f"unknown expression kind {e.kind}")

    if e.node_index is None:
        # scan all segments (``FacetExpressionEvaluator.java:96-111``)
        return F.exists(segs, pred_on)
    idx = e.node_index
    # reference uses 0-based from start, negative from end; try_element_at
    # is 1-based from start, -1-based from end; OOB -> null -> False
    # (plain element_at raises under ANSI mode — Spark 4 default)
    at = F.try_element_at(segs, F.lit(idx + 1 if idx >= 0 else idx))
    return F.coalesce(pred_on(at), F.lit(False))


def compile_rule(rule: FacetRule, path_col: str = "concept_path") -> Column:
    """OR-of-ANDs over compiled segment predicates; empty groups never
    match (``FacetExpressionEvaluator.java:27-48``)."""
    segs = path_segments(F.col(path_col))
    if not rule.groups:
        return F.lit(False)
    group_cols = []
    for group in rule.groups:
        if not group:
            continue
        acc = F.lit(True)
        for e in group:
            acc = acc & _segment_pred(segs, e)
        group_cols.append(acc)
    if not group_cols:
        return F.lit(False)
    out = F.lit(False)
    for g in group_cols:
        out = out | g
    return out


def inherit_groups(rules: dict[str, FacetRule]) -> dict[str, FacetRule]:
    """B8: a child's effective groups are the cross-product of its
    parent's effective groups with its own
    (``FacetLoaderService.java:310-323``). Pure driver-side rewrite."""
    effective: dict[str, FacetRule] = {}

    def resolve(name: str) -> FacetRule:
        if name in effective:
            return effective[name]
        r = rules[name]
        if r.parent is None or r.parent not in rules:
            effective[name] = r
            return r
        p = resolve(r.parent)
        if not p.groups:
            eff = r
        elif not r.groups:
            eff = FacetRule(r.name, [list(g) for g in p.groups], r.parent)
        else:
            eff = FacetRule(
                r.name, [pg + cg for pg in p.groups for cg in r.groups], r.parent
            )
        effective[name] = eff
        return eff

    for n in rules:
        resolve(n)
    return effective


def tag_concepts(
    concepts: DataFrame, rules: list[FacetRule], path_col: str = "concept_path"
) -> DataFrame:
    """E7 single-pass tagging: (concept_path, facet) mapping rows from
    one projection — each rule a compiled boolean in a single select;
    Catalyst fuses them into one codegen stage."""
    pairs = F.array(
        *[
            F.when(compile_rule(r, path_col), F.lit(r.name)).otherwise(F.lit(None))
            for r in rules
        ]
    )
    return (
        concepts.select(F.col(path_col), F.explode(F.filter(pairs, lambda x: x.isNotNull())).alias("facet"))
    )


def tag_concepts_crossjoin(
    concepts: DataFrame, rules_df: DataFrame, pred: Column, path_col: str = "concept_path"
) -> DataFrame:
    """E7 at large rule cardinality: broadcast the (small) rule table and
    let Spark run a BroadcastNestedLoopJoin with the compiled predicate."""
    return concepts.join(F.broadcast(rules_df), pred, "inner").select(path_col, "facet")


def rollup_parents(mappings: DataFrame, rules: dict[str, FacetRule]) -> DataFrame:
    """E8 bottom-up rollup: a parent facet gains the distinct union of
    its children's mappings, ADDITIVELY — existing parent rows are kept,
    matching the reference's ``INSERT ... ON CONFLICT DO NOTHING``
    (``FacetConceptRepository.java:97-107``, deepest-first ordering
    ``FacetLoaderService.java:422-434``; clearing stale parent rows is
    the *clear* step's job, not the rollup's). The facet tree is tiny —
    iterate depths driver-side, one union+distinct per level."""
    children_of: dict[str, list[str]] = {}
    depth: dict[str, int] = {}

    def d(n: str) -> int:
        if n in depth:
            return depth[n]
        p = rules[n].parent
        depth[n] = 0 if p is None or p not in rules else d(p) + 1
        return depth[n]

    for n, r in rules.items():
        d(n)
        if r.parent and r.parent in rules:
            children_of.setdefault(r.parent, []).append(n)

    out = mappings
    for parent in sorted(children_of, key=lambda n: -depth[n]):
        kids = children_of[parent]
        rolled = (
            out.filter(F.col("facet").isin(kids))
            .select(F.col("concept_path"), F.lit(parent).alias("facet"))
        )
        out = out.unionByName(rolled).distinct()
    return out

"""B9 facet-generator pipeline: derive month facets from regex families
over concept-path nodes and feed them through the facet loader —
``facet/RecoverMonthsFacetGeneratorService.java:42-171`` re-expressed.

Reference flow: stream the study's concept paths, discover the set of
month integers from three source structures, build one facet rule per
month (OR-groups) under a parent scope facet, POST to the facet loader.

Engine re-expression: discovery is ONE projection + tiny distinct
collect (the reference's TreeSet); rule construction is driver-side
data; tagging reuses :func:`pipeline.facet_load.load_facets`.

Month source structures (``:20-34``):

1. node-based — last two nodes ``(Inf|Infected|Noninf|Noninfected)\\<m>``
   (pre-index months spelled ``minus<m>``);
2. embedded in the last node — ``..._<(non)inf(ected)>_<m>``;
3. pre-kit-id — ``..._<m>_kit_id`` (expression group only; the
   reference does NOT discover months from kit ids, ``:129-171``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.functions.columns import path_segments
from picsure_dictionary_etl_spark.operators.facets import Expression, FacetRule
from picsure_dictionary_etl_spark.pipeline.facet_load import load_facets

RECOVER_ADULT_STUDY_ID = "phs003463"
CATEGORY_NAME = "Consortium_Curated_Facets"
PARENT_FACET_NAME = "RECOVER Adult Curated"
_INF_NODE = r"(?i)^(inf|infected|noninf|noninfected)$"


def discover_months(
    concepts: DataFrame,
    path_col: str = "concept_path",
    study_id: str = RECOVER_ADULT_STUDY_ID,
) -> list[int]:
    """The reference's ``discoverMonths`` (``:129-171``) as one
    projection: per-path month extraction, distinct, sorted driver-side
    (the result set is tiny — a handful of visit months).

    Early-return parity: when the last two nodes are ``(Inf|Noninf)\\X``
    but X is neither an integer nor ``minus<d>``, the embedded-suffix
    case still applies (the Java code only returns early on a MATCH)."""
    segs = path_segments(F.col(path_col))
    last = F.try_element_at(segs, F.lit(-1))
    prev = F.try_element_at(segs, F.lit(-2))

    node_scope = prev.rlike(_INF_NODE)
    is_int = last.rlike(r"^\d{1,3}$")
    minus = F.regexp_extract(last, r"(?i)^minus(\d{1,3})$", 1)
    embedded = F.regexp_extract(last, r"(?i)_(?:non)?(?:inf|infected)_(\d{1,3})$", 1)

    month = (
        F.when(node_scope & is_int, last.cast("int"))
        .when(node_scope & (minus != ""), -minus.cast("int"))
        .when(embedded != "", embedded.cast("int"))
    )
    rows = (
        # try_element_at: ANSI mode makes element_at raise on an empty
        # segment array (blank/all-backslash paths); null just fails the
        # study filter, matching the try_element_at usage above
        concepts.filter(F.try_element_at(segs, F.lit(1)) == study_id)
        # skip paths ending in RECOVER_Adult itself (the scope node)
        .filter(~F.col(path_col).rlike(r"(?i)RECOVER_Adult$"))
        .select(month.alias("m"))
        .filter(F.col("m").isNotNull())
        .distinct()
        .collect()
    )
    return sorted(r["m"] for r in rows)


def build_recover_months_rules(
    months: list[int],
    study_id: str = RECOVER_ADULT_STUDY_ID,
    parent_name: str = PARENT_FACET_NAME,
) -> dict[str, FacetRule]:
    """One facet per discovered month under the parent scope facet,
    with the reference's OR-groups (``buildWrapper``, ``:173-277``):
    node-based (+ ``minus`` for negative months), embedded-last-node,
    and pre-kit-id — each ANDed with the study scope expressions."""
    p0 = Expression("exactly", study_id, 0)
    p1 = Expression("regex", "(?i)RECOVER_Adult$", 1)
    n1 = Expression("regex", _INF_NODE, -2)

    rules = {parent_name: FacetRule(parent_name, [[p0, p1]])}
    for m in months:
        name = f"{m:02d}m-post index"
        if m < 0:
            groups = [[p0, p1, n1, Expression("regex", rf"(?i)^minus{abs(m)}$", -1)]]
        else:
            groups = [
                [p0, p1, n1, Expression("exactly", str(m), -1)],
                [p0, p1, Expression("regex", rf"(?i).+_(?:non)?(?:inf|infected)_{m}$", -1)],
                [p0, p1, Expression("regex", rf"(?i).+_{m}_kit_id$", -1)],
            ]
        rules[name] = FacetRule(name, groups, parent=parent_name)
    return rules


def generate_recover_months(
    concepts: DataFrame,
    path_col: str = "concept_path",
    study_id: str = RECOVER_ADULT_STUDY_ID,
    dry_run: bool = False,
    previous_hashes: dict[str, str] | None = None,
    previous_mappings: DataFrame | None = None,
) -> dict:
    """The generator endpoint (``generate``, ``:64-127``): discover →
    build rules → load facets. ``dry_run`` stops after discovery."""
    months = discover_months(concepts, path_col, study_id)
    out = {
        "category": CATEGORY_NAME,
        "parent": PARENT_FACET_NAME,
        "months": months,
        "mappings": None,
        "hashes": None,
        "report": None,
    }
    if dry_run or not months:
        out["message"] = (
            "No months discovered; nothing to generate."
            if not months
            else "Dry run: would generate parent facet and month facets under it."
        )
        return out
    rules = build_recover_months_rules(months, study_id)
    mappings, hashes, report = load_facets(
        concepts, rules, previous_hashes, previous_mappings, path_col
    )
    out.update(mappings=mappings, hashes=hashes, report=report, message="Generation complete.")
    return out

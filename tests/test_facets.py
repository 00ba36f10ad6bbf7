"""Facet expression compiler tests — semantics mirror
``facet/FacetExpressionEvaluatorTest.java:13-70`` (regex/contains/
exactly, +/- node index, OOB -> false, all-node scan, AND within group,
OR across groups, empty -> no match) and the inheritance rules of
``FacetLoaderService.java:310-323``."""

import pytest

from picsure_dictionary_etl_spark.operators.facets import (
    Expression,
    FacetRule,
    compile_rule,
    inherit_groups,
    rollup_parents,
    tag_concepts,
)

PATHS = [
    "\\study_a\\lab\\glucose\\",
    "\\study_a\\lab\\insulin_5\\",
    "\\study_b\\demographics\\age\\",
    "\\study_b\\lab\\glucose\\",
]


@pytest.fixture(scope="module")
def concepts(spark):
    return spark.createDataFrame([(p,) for p in PATHS], ["concept_path"])


def _matches(concepts, rule):
    return sorted(
        r["concept_path"] for r in concepts.filter(compile_rule(rule)).collect()
    )


def test_exactly_positive_index(concepts):
    r = FacetRule("f", [[Expression("exactly", "study_a", 0)]])
    assert _matches(concepts, r) == ["\\study_a\\lab\\glucose\\", "\\study_a\\lab\\insulin_5\\"]


def test_exactly_negative_index(concepts):
    r = FacetRule("f", [[Expression("exactly", "glucose", -1)]])
    assert _matches(concepts, r) == ["\\study_a\\lab\\glucose\\", "\\study_b\\lab\\glucose\\"]


def test_out_of_bounds_is_false(concepts):
    r = FacetRule("f", [[Expression("exactly", "x", 9)]])
    assert _matches(concepts, r) == []
    r = FacetRule("f", [[Expression("exactly", "x", -9)]])
    assert _matches(concepts, r) == []


def test_regex_unanchored_find(concepts):
    # Java Matcher.find() semantics -> substring match
    r = FacetRule("f", [[Expression("regex", "insulin_\\d", -1)]])
    assert _matches(concepts, r) == ["\\study_a\\lab\\insulin_5\\"]


def test_all_node_scan(concepts):
    r = FacetRule("f", [[Expression("contains", "demo", None)]])
    assert _matches(concepts, r) == ["\\study_b\\demographics\\age\\"]


def test_and_within_group_or_across(concepts):
    r = FacetRule(
        "f",
        [
            [Expression("exactly", "study_a", 0), Expression("exactly", "glucose", -1)],
            [Expression("exactly", "age", -1)],
        ],
    )
    assert _matches(concepts, r) == ["\\study_a\\lab\\glucose\\", "\\study_b\\demographics\\age\\"]


def test_empty_groups_never_match(concepts):
    assert _matches(concepts, FacetRule("f", [])) == []
    assert _matches(concepts, FacetRule("f", [[]])) == []


def test_inherit_cross_product():
    rules = {
        "parent": FacetRule("parent", [[Expression("exactly", "study_a", 0)]]),
        "child": FacetRule(
            "child", [[Expression("exactly", "glucose", -1)]], parent="parent"
        ),
    }
    eff = inherit_groups(rules)
    assert len(eff["child"].groups) == 1
    assert [e.value for e in eff["child"].groups[0]] == ["study_a", "glucose"]


def test_tag_and_rollup(spark, concepts):
    rules = {
        "lab": FacetRule("lab", [[Expression("exactly", "lab", 1)]]),
        "glucose": FacetRule(
            "glucose", [[Expression("exactly", "glucose", -1)]], parent="lab"
        ),
    }
    eff = inherit_groups(rules)
    mappings = tag_concepts(concepts, list(eff.values()))
    rolled = rollup_parents(mappings, rules)
    got = {(r["concept_path"], r["facet"]) for r in rolled.collect()}
    # parent facet's mappings = union of children's (E8) + its own
    assert ("\\study_a\\lab\\glucose\\", "glucose") in got
    assert ("\\study_a\\lab\\glucose\\", "lab") in got
    assert ("\\study_b\\lab\\glucose\\", "lab") in got
    assert ("\\study_b\\demographics\\age\\", "lab") not in got

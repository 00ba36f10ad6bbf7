"""End-to-end parity against the reference's OWN fixtures and
integration-test goldens (``DictionaryLoaderServiceIntegrationTest.java``).
The fixtures are read in place from the read-only reference checkout."""

import os

import pytest

from picsure_dictionary_etl_spark.pipeline.dictionary import load_column_meta_dictionary

REF_RES = "/root/reference/src/test/resources"
NHANES = os.path.join(REF_RES, "columnMeta.csv")

pytestmark = pytest.mark.skipif(
    not os.path.exists(NHANES), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def demographics(spark):
    nodes, errors = load_column_meta_dictionary(spark, NHANES, ["demographics"])
    return nodes, errors


def test_demographics_yields_exactly_15_concepts(demographics):
    """Golden: List.of('demographics') filter -> 15 concept nodes
    (DictionaryLoaderServiceIntegrationTest.java:131-139)."""
    nodes, _ = demographics
    assert nodes.count() == 15


def test_sex_flattens_to_female_male(demographics):
    """Golden: \\demographics\\SEX\\ = categorical [female, male]
    (single-value path trim + set union; ...:182-195)."""
    nodes, _ = demographics
    row = nodes.filter(nodes.concept_path == "\\demographics\\SEX\\").collect()
    assert len(row) == 1
    assert row[0]["concept_type"] == "categorical"
    assert row[0]["values"] == ["female", "male"]
    assert row[0]["is_leaf"] is True


def test_area_flattens_to_eight_values_sorted(spark, tmp_path):
    """Golden: the reference test hand-builds 8 area rows and expects
    their union (...:142-176, values 1_10..1_17). The reference's
    HashSet order is JVM-dependent; the engine pins ascending order
    (SURVEY.md §2.C2)."""
    rows = "".join(
        f"\\demographics\\area\\1_{i}\\,4,0,true,1_{i},null,null,0,1,82,82\n"
        for i in range(10, 18)
    )
    p = tmp_path / "area.csv"
    p.write_text(rows)
    nodes, _ = load_column_meta_dictionary(spark, str(p))
    row = nodes.filter(nodes.concept_path == "\\demographics\\area\\").collect()[0]
    assert row["concept_type"] == "categorical"
    assert row["values"] == [f"1_{i}" for i in range(10, 18)]


def test_area_full_fixture_unions_all_values(demographics):
    """On the full NHANES fixture the area concept unions every value
    across all its rows (superset of the hand-built golden)."""
    nodes, _ = demographics
    row = nodes.filter(nodes.concept_path == "\\demographics\\area\\").collect()[0]
    vals = set(row["values"])
    assert {f"1_{i}" for i in range(10, 18)} <= vals
    assert row["values"] == sorted(row["values"])


def test_intermediate_node_categorical(demographics):
    """Golden: intermediate tree nodes are categorical concepts
    (ColumnMetaTreeBuilder.java:59; integration test :524+)."""
    nodes, _ = demographics
    row = nodes.filter(nodes.concept_path == "\\demographics\\").collect()[0]
    assert row["concept_type"] == "categorical"
    assert row["is_leaf"] is False
    assert row["parent_path"] is None
    assert row["dataset"] == "demographics"


def test_min_max_widening_continuous(spark, tmp_path):
    """Golden shape (...:364-430): continuous rows widen min-of-mins /
    max-of-maxes; numeric single-value categorical rows coerce in."""
    p = tmp_path / "cm.csv"
    p.write_text(
        "\\lab\\AGE\\,8,0,false,,10.0,50.0,0,1\n"
        "\\lab\\AGE\\,8,0,false,,5.0,40.0,0,1\n"
        "\\lab\\AGE\\,8,0,true,99,null,null,0,1\n"
    )
    nodes, errors = load_column_meta_dictionary(spark, str(p))
    row = nodes.filter(nodes.concept_path == "\\lab\\AGE\\").collect()[0]
    assert row["concept_type"] == "continuous"
    assert row["min"] == 5.0 and row["max"] == 99.0
    assert errors.count() == 0


def test_mixed_type_conflict_routed_to_errors(spark, tmp_path):
    p = tmp_path / "cm.csv"
    # same path: one continuous row + one multi-value categorical row
    p.write_text(
        "\\lab\\X\\,8,0,false,,1.0,2.0,0,1\n"
        "\\lab\\X\\,8,0,true,redµblue,null,null,0,1\n"
    )
    nodes, errors = load_column_meta_dictionary(spark, str(p))
    # the multi-value categorical merged into a continuous group -> error
    assert errors.filter(errors.error_row.contains("mixed")).count() == 1
    assert nodes.filter(nodes.concept_path == "\\lab\\X\\").count() == 0


def test_full_nhanes_loads_clean(spark):
    """The whole 1001-row NHANES fixture loads with zero error rows and
    produces a consistent tree (every non-root parent exists)."""
    nodes, errors = load_column_meta_dictionary(spark, NHANES)
    assert errors.count() == 0
    n = nodes.count()
    assert n > 15
    paths = {r["concept_path"] for r in nodes.select("concept_path").collect()}
    parents = {
        r["parent_path"]
        for r in nodes.filter(nodes.parent_path.isNotNull()).select("parent_path").collect()
    }
    assert parents <= paths

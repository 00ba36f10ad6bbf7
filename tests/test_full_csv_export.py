"""§3.3 reference-layout 6-CSV export round trip: export the full
dictionary state, re-ingest the directory, get equal state — mirrors
``export/DictionaryCSVServiceTest.java:105-179`` (counts + exact
concept/facet/mapping sets, path escaping, metadata pivots)."""

import csv
import os

import pytest
from pyspark.sql import functions as F

from picsure_dictionary_etl_spark.pipeline.export_csv import (
    DictionaryState,
    generate_full_ingest_csvs,
    ingest_full_csvs,
)

EXPECTED_FILES = [
    "Datasets.csv",
    "Consents.csv",
    "Facet_Categories.csv",
    "Facets.csv",
    "Concepts.csv",
    "Facet_Concept_Lists.csv",
]


@pytest.fixture(scope="module")
def state(spark):
    datasets = spark.createDataFrame(
        [
            ("nhanes", "National Health Survey", "NH", "demo study"),
            ("synthea", "Synthetic EHR", "SY", "synthetic study"),
        ],
        ["ref", "full_name", "abbreviation", "description"],
    )
    dataset_meta = spark.createDataFrame(
        [("nhanes", "species", "human"), ("synthea", "version", "v2")],
        ["ref", "key", "value"],
    )
    consents = spark.createDataFrame(
        [
            ("nhanes", "c1", "general", 100, 50, 10, "/nhanes/c1"),
            ("synthea", "c2", "research", 200, 75, 20, "/synthea/c2"),
        ],
        [
            "dataset_ref", "consent_code", "description",
            "participant_count", "variable_count", "sample_count", "authz",
        ],
    )
    concepts = spark.createDataFrame(
        [
            ("nhanes", "SEX", "Sex", "categorical", "\\nhanes\\demographics\\SEX\\",
             "\\nhanes\\demographics\\", ["female", "male"]),
            ("nhanes", "AGE", "Age", "continuous", "\\nhanes\\demographics\\AGE\\",
             "\\nhanes\\demographics\\", []),
            ("synthea", "glucose", "Glucose", "continuous", "\\synthea\\lab\\glucose\\",
             "\\synthea\\lab\\", []),
        ],
        [
            "dataset_ref", "name", "display", "concept_type",
            "concept_path", "parent_concept_path", "values",
        ],
    )
    concept_meta = spark.createDataFrame(
        [
            ("\\nhanes\\demographics\\SEX\\", "description", "participant sex"),
            ("\\synthea\\lab\\glucose\\", "unit", "mg/dL"),
        ],
        ["concept_path", "key", "value"],
    )
    facet_categories = spark.createDataFrame(
        [("data_type", "Data Type", "by type")], ["name", "display", "description"]
    )
    facet_category_meta = spark.createDataFrame(
        [("data_type", "ordering", "1")], ["name", "key", "value"]
    )
    facets = spark.createDataFrame(
        [
            ("data_type", "labs", "Labs", "lab facet", ""),
            ("data_type", "glucose_f", "Glucose", "glucose facet", "labs"),
        ],
        ["facet_category", "facet_name", "display_name", "description", "parent_name"],
    )
    facet_meta = spark.createDataFrame(
        [("labs", "icon", "flask")], ["facet_name", "key", "value"]
    )
    facet_mappings = spark.createDataFrame(
        [
            ("glucose_f", "\\synthea\\lab\\glucose\\", "synthea"),
            ("labs", "\\synthea\\lab\\glucose\\", "synthea"),
            ("labs", "\\nhanes\\demographics\\AGE\\", "nhanes"),
        ],
        ["facet", "concept_path", "dataset_ref"],
    )
    return DictionaryState(
        datasets, dataset_meta, consents, concepts, concept_meta,
        facet_categories, facet_category_meta, facets, facet_meta, facet_mappings,
    )


@pytest.fixture(scope="module")
def export_dir(spark, state, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("csv_export"))
    paths = generate_full_ingest_csvs(state, out)
    assert sorted(paths) == sorted(EXPECTED_FILES)
    return out


def test_all_six_files_exist_with_headers(export_dir):
    for name in EXPECTED_FILES:
        p = os.path.join(export_dir, name)
        assert os.path.exists(p), name
        with open(p) as f:
            header = next(csv.reader(f))
        assert len(header) >= 2, name


def test_layout_details(export_dir):
    with open(os.path.join(export_dir, "Concepts.csv")) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    assert header[:7] == [
        "dataset_ref", "name", "display", "concept_type", "concept_path",
        "parent_concept_path", "values",
    ]
    # metadata keys pivoted wide, sorted
    assert header[7:] == ["description", "unit"]
    by_path = {r[4]: r for r in rows[1:]}
    # backslashes escaped on the wire
    sex = by_path["\\\\nhanes\\\\demographics\\\\SEX\\\\"]
    assert sex[5] == "\\\\nhanes\\\\demographics\\\\"
    # categorical values as a JSON array string; continuous blank
    assert sex[6] == '["female","male"]'
    assert by_path["\\\\nhanes\\\\demographics\\\\AGE\\\\"][6] == ""
    # rows ordered by (dataset_ref, concept_path)
    assert [r[0] for r in rows[1:]] == sorted(r[0] for r in rows[1:])

    with open(os.path.join(export_dir, "Facets.csv")) as f:
        fhead = next(csv.reader(f))
    assert fhead[:5] == [
        "facet_category", "facet_name(unique)", "display_name", "description",
        "parent_name",
    ]

    with open(os.path.join(export_dir, "Facet_Concept_Lists.csv")) as f:
        lrows = list(csv.reader(f))
    # one column per facet, in Facets.csv row order
    assert lrows[0] == ["glucose_f", "labs"]
    # index-aligned: labs has 2 paths, glucose_f has 1 -> ragged pad
    cols = list(zip(*lrows[1:]))
    labs_paths = [v for v in cols[1] if v]
    assert len(labs_paths) == 2


def test_round_trip_state_equality(spark, state, export_dir):
    back = ingest_full_csvs(spark, export_dir)

    def s(df, cols):
        return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}

    assert s(back.datasets, ["ref", "full_name", "abbreviation", "description"]) == s(
        state.datasets, ["ref", "full_name", "abbreviation", "description"]
    )
    assert s(back.dataset_meta, ["ref", "key", "value"]) == s(
        state.dataset_meta, ["ref", "key", "value"]
    )
    cc = ["dataset_ref", "consent_code", "participant_count", "variable_count",
          "sample_count", "authz"]
    assert s(back.consents, cc) == s(state.consents, cc)

    con_cols = ["dataset_ref", "name", "concept_type", "concept_path", "parent_concept_path"]
    assert s(back.concepts, con_cols) == s(state.concepts, con_cols)
    # values arrays survive the JSON hop
    got_vals = {
        r["concept_path"]: list(r["values"]) for r in back.concepts.collect()
    }
    assert got_vals["\\nhanes\\demographics\\SEX\\"] == ["female", "male"]
    assert got_vals["\\nhanes\\demographics\\AGE\\"] == []
    assert s(back.concept_meta, ["concept_path", "key", "value"]) == s(
        state.concept_meta, ["concept_path", "key", "value"]
    )

    assert s(back.facet_categories, ["name", "display", "description"]) == s(
        state.facet_categories, ["name", "display", "description"]
    )
    fx_cols = ["facet_category", "facet_name", "display_name", "description"]
    assert s(back.facets, fx_cols) == s(state.facets, fx_cols)
    assert s(back.facet_meta, ["facet_name", "key", "value"]) == s(
        state.facet_meta, ["facet_name", "key", "value"]
    )
    # mappings (incl. recovered dataset_ref from the path root)
    m_cols = ["facet", "concept_path", "dataset_ref"]
    assert s(back.facet_mappings, m_cols) == s(state.facet_mappings, m_cols)


def test_double_round_trip_is_fixed_point(spark, export_dir, tmp_path):
    """export(ingest(export(state))) == export(state), file-for-file."""
    back = ingest_full_csvs(spark, export_dir)
    out2 = str(tmp_path / "again")
    generate_full_ingest_csvs(back, out2)
    for name in EXPECTED_FILES:
        with open(os.path.join(export_dir, name)) as a, open(
            os.path.join(out2, name)
        ) as b:
            assert sorted(a.read().splitlines()) == sorted(b.read().splitlines()), name

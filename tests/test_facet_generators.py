"""B9 recover-months facet generator goldens — mirrors the reference's
``RecoverMonthsFacetGeneratorServiceTest.java:86-159`` fixtures (c1/c2/
c3 node-based months, non-matching study) and the nested test's
pediatrics-exclusion case, plus the embedded / kit-id / minus families
from ``RecoverMonthsFacetGeneratorService.java:20-34``."""

import pytest

from picsure_dictionary_etl_spark.pipeline.facet_generators import (
    build_recover_months_rules,
    discover_months,
    generate_recover_months,
)

C1 = "\\phs003463\\RECOVER_Adult\\biospecimens\\Inventory of Samples Collected\\ac_cptcoll\\Noninf\\9\\"
C2 = "\\phs003463\\RECOVER_Adult\\flder_tier2\\chest_ct\\Qualitative Read\\chestct_reticular\\Inf\\12\\"
C3 = "\\phs003463\\RECOVER_Adult\\flder_tier2\\echocardiogram_with_strain\\Echocardiogram\\rttestrain_aregurg\\Inf\\9\\"
C_EMBEDDED = "\\phs003463\\RECOVER_Adult\\labs\\abc_noninf_12\\"
C_KIT = "\\phs003463\\RECOVER_Adult\\biospecimens\\blood_9_kit_id\\"
C_MINUS = "\\phs003463\\RECOVER_Adult\\survey\\Inf\\minus3\\"
C_OTHER_STUDY = "\\phs000000\\SomeStudy\\something\\42\\"
C_PEDIATRICS = "\\phs003461\\RECOVER_Pediatrics\\x\\Inf\\12\\"


@pytest.fixture(scope="module")
def concepts(spark):
    rows = [
        (C1,), (C2,), (C3,), (C_EMBEDDED,), (C_KIT,), (C_MINUS,),
        (C_OTHER_STUDY,), (C_PEDIATRICS,),
    ]
    return spark.createDataFrame(rows, ["concept_path"])


def test_discover_months(spark, concepts):
    # 9 and 12 from node-based, 12 from embedded, -3 from minus;
    # kit_id paths do NOT contribute months (reference :129-171);
    # other studies and pediatrics are out of scope
    assert discover_months(concepts) == [-3, 9, 12]


def test_rule_shapes(spark):
    rules = build_recover_months_rules([-3, 9])
    assert set(rules) == {"RECOVER Adult Curated", "-3m-post index", "09m-post index"}
    # negative month: single node-based group; positive: three OR-groups
    assert len(rules["-3m-post index"].groups) == 1
    assert len(rules["09m-post index"].groups) == 3
    assert rules["09m-post index"].parent == "RECOVER Adult Curated"


def test_generate_dry_run(spark, concepts):
    out = generate_recover_months(concepts, dry_run=True)
    assert out["months"] == [-3, 9, 12]
    assert out["mappings"] is None
    assert "Dry run" in out["message"]


def test_generate_mappings_golden(spark, concepts):
    out = generate_recover_months(concepts)
    assert out["message"] == "Generation complete."
    got = {(r["concept_path"], r["facet"]) for r in out["mappings"].collect()}

    # 09m maps c1 and c3 (node-based) + the kit-id path; not c2
    assert (C1, "09m-post index") in got
    assert (C3, "09m-post index") in got
    assert (C_KIT, "09m-post index") in got
    assert (C2, "09m-post index") not in got

    # 12m maps c2 (node-based) + the embedded path; not c1
    assert (C2, "12m-post index") in got
    assert (C_EMBEDDED, "12m-post index") in got
    assert (C1, "12m-post index") not in got

    # -3m maps only the minus path
    assert (C_MINUS, "-3m-post index") in got
    assert sum(1 for p, f in got if f == "-3m-post index") == 1

    # pediatrics / other studies never map, to any facet
    assert all(p not in (C_PEDIATRICS, C_OTHER_STUDY) for p, _ in got)

    # parent facet rolls up the union of all month facets
    parent = {p for p, f in got if f == "RECOVER Adult Curated"}
    assert parent >= {C1, C2, C3, C_EMBEDDED, C_KIT, C_MINUS}

    rep = out["report"]
    assert rep["mapping_counts"]["09m-post index"] == 3
    assert rep["mapping_counts"]["12m-post index"] == 2


def test_generate_is_idempotent(spark, concepts):
    out1 = generate_recover_months(concepts)
    out2 = generate_recover_months(
        concepts,
        previous_hashes=out1["hashes"],
        previous_mappings=out1["mappings"],
    )
    assert out2["report"]["facets_remapped"] == []
    a = {(r["concept_path"], r["facet"]) for r in out1["mappings"].collect()}
    b = {(r["concept_path"], r["facet"]) for r in out2["mappings"].collect()}
    assert a == b
